"""Profile the HEADLINE bench shape (bench.py: LTHM-base, 6L d512 seq 256,
1M-row KShift, batch 64) and emit a per-segment + MFU table.

VERDICT r3 #2: the headline has been flat for three rounds with no roofline
statement. This tool (a) runs the exact bench step under jax.profiler and
saves the trace, (b) chains in-graph segment timings, (c) prints a
FLOPs/bytes roofline per segment so QUALITY.md can state achieved vs
attainable.

Usage: python tools_profile_headline.py [--trace-dir /tmp/headline_trace]
"""
from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import recommendations_tpu  # noqa: F401
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec

from recommendations_tpu.core.mesh import MeshConfig, build_mesh
from recommendations_tpu.models.lthm.config import (
    LTHMModelConfig, LogQConfig, ProductTowerConfig, SelfAttentionConfig,
    TransformerConfig,
)
from recommendations_tpu.models.lthm.wrapper import LTHMModelWrapper
from recommendations_tpu.config.trainer_config import ModelTrainConfig
from recommendations_tpu.train.optimizers import build_optimizer
from recommendations_tpu.train.train_state import TrainState

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/headline_trace")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--fused-ce", action="store_true")
    ap.add_argument("--no-trace", action="store_true")
    ap.add_argument("--vocab", type=int, default=1_000_000)
    ap.add_argument("--table-optimizer", default=None,
                    help="override table_optimizer (e.g. lazy_rowwise_adam "
                         "to profile the 10M rung's update path)")
    ap.add_argument("--trainable", action="store_true",
                    help="detach_item_tower=False: the latent table actually "
                         "trains (without it the reference-parity detach "
                         "makes table grads symbolic zeros that XLA folds, "
                         "understating table-update costs)")
    ap.add_argument("--shape", default="headline",
                    choices=["headline", "prod", "seq1024"],
                    help="preset: headline = bench.py (6L seq 256 b64); "
                         "prod = the 16L seq-512 rel-pos-bias rung; "
                         "seq1024 = the 6L seq-1024 fused-bias rung "
                         "(VERDICT r4 #4: per-op rooflines for the two "
                         "hardest rungs)")
    args = ap.parse_args()

    batch, seq, layers, d, vocab = 64, 256, 6, 512, args.vocab
    pos_bias = None
    remat = False
    mini_bs = 32
    if args.shape == "prod":
        # configs/lthm_train.yaml scale point: 16L, seq 512 (+CLS), MQA-32,
        # learned rel-pos bias (XLA path below the seq-768 crossover), 10M
        # rows, remat dots_no_batch
        batch, seq, layers, vocab = 64, 512, 16, 10_000_000
        pos_bias, remat = 513, True
    elif args.shape == "seq1024":
        # BENCH_SUITE lthm_seq1024: 6L seq 1024, fused in-kernel bias
        batch, seq, layers, vocab = 16, 1024, 6, 1_000_000
        pos_bias, remat = 1025, True
        mini_bs = 16
    cfg = LTHMModelConfig(
        features={"defaults": {}},
        transformer_config=TransformerConfig(
            rotator_config={"ff_mult": 4}, is_causal=True, num_layers=layers,
            enable_gradient_checkpointing=remat, use_flash_attention=True,
            attn_config=SelfAttentionConfig(
                n_head=max(4, d // 16), n_embd=d, attn_type="multi_query",
                dropout=0.0, attn_dropout=0.0, bias=False,
                **({"pos_bias": {"context_window": pos_bias}}
                   if pos_bias else {}),
            ),
        ),
        product_tower=ProductTowerConfig(
            detach_item_tower=not args.trainable,
            inp_emb_dim=32, out_emb_dim=d, product_emb_dim=128, norm_bins=20,
            cosine_lsh_config=[
                {"num_bins": nb, "num_proj": 32} for nb in (2, 4, 8, 12, 16, 20)
            ],
            latent_model_config={
                "vocab_size_latent": vocab, "num_shifts_latent": 8,
                "normalize_embedding": True,
            },
        ),
        log_q_config=LogQConfig(num_buckets=2**22, hash_offsets=[0, 34144, 7465477]),
        lookahead=[0, 5, 6, 12, 24, 30],
        context_width=seq, softmax_temperature=0.05,
        train_mini_batch_size=mini_bs,
        fused_ce=args.fused_ce,
        **({"table_optimizer": args.table_optimizer}
           if args.table_optimizer else {}),
    )
    wrapper = LTHMModelWrapper(cfg)
    rs = np.random.RandomState(0)
    ids = rs.randint(-(2**62), 2**62, size=(batch, seq + 8)).astype(np.int64)
    ids[:, -4:] = 0
    host_batch = {
        "product_ids": ids,
        "labels": rs.randint(0, 4, size=ids.shape).astype(np.float32),
        "timestamps": rs.randint(1_600_000_000, 1_700_000_000,
                                 size=ids.shape).astype(np.float32),
    }
    mesh = build_mesh(MeshConfig(data=-1))
    example = {k: jnp.asarray(v) for k, v in host_batch.items()}
    variables = wrapper.init_variables(jax.random.PRNGKey(0), example)
    params = variables.get("params", {})
    constants = variables.get("constants", {})
    optimizer = build_optimizer(wrapper, ModelTrainConfig(), params)
    table_state = (
        wrapper.init_table_state(params)
        if hasattr(wrapper, "init_table_state") else None
    )
    state = TrainState.create(
        params, constants, optimizer.init(params), wrapper.init_aux_state(),
        jax.random.PRNGKey(1), table_state=table_state,
    )
    repl = NamedSharding(mesh, PartitionSpec())
    # donate the placement copy — a plain device_put duplicates the fused
    # (V, 128) record (5 GB at V=10M) and can over-subscribe HBM
    state = jax.jit(lambda s: s, out_shardings=repl, donate_argnums=0)(state)
    dbatch = {
        k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, PartitionSpec("data")))
        for k, v in host_batch.items()
    }

    use_taps = getattr(wrapper, "uses_sparse_taps", lambda: False)()

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, b):
        rng, sub = jax.random.split(state.rng)

        if use_taps:
            taps0 = wrapper.make_taps(b)

            def loss_fn_t(p, taps):
                return wrapper.loss_and_metrics(
                    p, state.constants, state.aux, b, sub, True, taps=taps
                )

            (loss, (metrics, new_aux)), (grads, tap_grads) = (
                jax.value_and_grad(loss_fn_t, argnums=(0, 1), has_aux=True)(
                    state.params, taps0
                )
            )
        else:
            def loss_fn(p):
                return wrapper.loss_and_metrics(
                    p, state.constants, state.aux, b, sub, True
                )

            (loss, (metrics, new_aux)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_table_state = state.table_state
        if state.table_state is not None:
            if use_taps:
                new_params, new_table_state, _rows_nan = wrapper.apply_sparse_table_update(
                    new_params, tap_grads, state.table_state, b
                )
            else:
                new_params, new_table_state = wrapper.apply_lazy_table_update(
                    new_params, grads, state.table_state, b
                )
        # the real strategy step also pays these full-tree passes
        grad_norm = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.square(x)), grads, jnp.asarray(0.0)
        ) ** 0.5
        loss = loss + 0.0 * grad_norm
        return (
            TrainState(params=new_params, constants=state.constants,
                       opt_state=new_opt, aux=new_aux, step=state.step + 1,
                       rng=rng, table_state=new_table_state),
            loss,
        )

    checksum = jax.jit(
        lambda s: jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x)), s.params,
            jnp.asarray(0.0, jnp.float32),
        )
    )
    state, loss = train_step(state, dbatch)
    float(checksum(state))

    # --- timed window with honest barrier --------------------------------
    t0 = time.time()
    for _ in range(args.steps):
        state, loss = train_step(state, dbatch)
    float(checksum(state))
    step_ms = (time.time() - t0) / args.steps * 1e3
    ex_s = batch / (step_ms / 1e3)
    print(f"step {step_ms:.2f} ms  ({ex_s:.1f} ex/s/chip)")

    # --- profiler trace ---------------------------------------------------
    if not args.no_trace:
        jax.profiler.start_trace(args.trace_dir)
        for _ in range(5):
            state, loss = train_step(state, dbatch)
        float(checksum(state))
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace_dir}")

    # --- analytic roofline -------------------------------------------------
    tokens = batch * (seq + 8)
    t_tok = batch * (seq + 1)
    p_layer = d * d + d * 32 + d * d + 2 * d * 4 * d
    stack_flops = 3 * 2 * layers * p_layer * t_tok
    attn_flops = 3 * 4 * 32 * t_tok * (seq + 1) * 16 / 2
    n_chunk = max(1, batch // cfg.train_mini_batch_size)
    n_rows = cfg.train_mini_batch_size * (seq + 8)
    loss_flops = len(cfg.lookahead) * n_chunk * 3 * 2 * n_rows * n_rows * 128
    kshift_bytes = tokens * 8 * 32 * 4 * 2  # gather + scatter rows, f32
    table_bytes = 0  # lazy/dense handled by optimizer row traffic
    opt_bytes = 2 * (sum(x.size for x in jax.tree_util.tree_leaves(params)) * 4) * 3
    segs = {
        "transformer_stack": {"flops": stack_flops},
        "attention(flash)": {"flops": attn_flops},
        "contrastive_loss": {"flops": loss_flops},
        "kshift_gather+scatter": {"bytes": kshift_bytes},
        "optimizer": {"bytes": opt_bytes},
    }
    total_flops = stack_flops + attn_flops + loss_flops
    print(json.dumps({
        "step_ms": round(step_ms, 2),
        "examples_per_sec_per_chip": round(ex_s, 1),
        "total_matmul_tflops_per_step": round(total_flops / 1e12, 3),
        "achieved_tflops": round(total_flops / (step_ms / 1e3) / 1e12, 1),
        "mfu_vs_v5e_bf16_peak": round(
            total_flops / (step_ms / 1e3) / 1e12 / V5E_BF16_TFLOPS, 3),
        "compute_bound_floor_ms": round(total_flops / (V5E_BF16_TFLOPS * 1e12) * 1e3, 2),
        "segments_analytic": {
            k: {kk: round(vv / 1e9, 2) for kk, vv in v.items()}
            for k, v in segs.items()
        },
    }, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
