"""Benchmark: LTHM training examples/sec/chip on real hardware.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
measured against this framework's own first recorded value when available
(``bench_baseline.json`` committed at the repo root); otherwise 1.0.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np


def main() -> int:
    import recommendations_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec

    from recommendations_tpu.core.mesh import MeshConfig, build_mesh
    from recommendations_tpu.models.lthm.config import (
        LTHMModelConfig,
        LogQConfig,
        ProductTowerConfig,
        SelfAttentionConfig,
        TransformerConfig,
    )
    from recommendations_tpu.models.lthm.wrapper import LTHMModelWrapper
    from recommendations_tpu.config.trainer_config import ModelTrainConfig
    from recommendations_tpu.train.optimizers import build_optimizer
    from recommendations_tpu.train.train_state import TrainState

    on_tpu = jax.devices()[0].platform != "cpu"
    # LTHM-base-ish single-chip shape (BASELINE config 3 scaled to one v5e):
    # 6 layers, d=512, MQA-32, seq 256, 1M-row kshift table.
    if on_tpu:
        batch, seq, layers, d, vocab = 64, 256, 6, 512, 1_000_000
    else:  # CPU smoke fallback so the bench always emits a line
        batch, seq, layers, d, vocab = 8, 32, 2, 64, 10_000

    cfg = LTHMModelConfig(
        features={"defaults": {}},
        transformer_config=TransformerConfig(
            rotator_config={"ff_mult": 4},
            is_causal=True,
            num_layers=layers,
            enable_gradient_checkpointing=False,
            use_flash_attention=on_tpu,  # pallas fused-head kernel
            attn_config=SelfAttentionConfig(
                n_head=max(4, d // 16), n_embd=d, attn_type="multi_query",
                dropout=0.0, attn_dropout=0.0, bias=False,
            ),
        ),
        product_tower=ProductTowerConfig(
            inp_emb_dim=32, out_emb_dim=d, product_emb_dim=128,
            norm_bins=20,
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
        context_width=seq,
        softmax_temperature=0.05,
        train_mini_batch_size=32,
        # the Pallas fused CE wins at this chunk shape (N=8448: 55.8 vs
        # 58.0 ms/step, trace-verified r4); parity-tested vs the XLA oracle
        fused_ce=on_tpu,
        # 'frozen' is reference parity (round-4 correction): the reference's
        # product tower DETACHES its embedding input (product_tower.py:47),
        # so the latent table's grad is structurally zero and torch never
        # visits the param in AdamW (grad=None params are skipped). Rounds
        # 1-3 ran 'rowwise_adam' here — a full dense moment rewrite every
        # step updating nothing the loss could see. The trainable-table
        # workload (detach off + sparse_fused_adam) is recorded separately
        # as bench_suite's lthm_10m rung.
        table_optimizer="frozen",
    )
    wrapper = LTHMModelWrapper(cfg)

    rs = np.random.RandomState(0)
    ids = rs.randint(-(2**62), 2**62, size=(batch, seq + 8)).astype(np.int64)
    ids[:, -4:] = 0
    host_batch = {
        "product_ids": ids,
        "labels": rs.randint(0, 4, size=ids.shape).astype(np.float32),
        "timestamps": rs.randint(1_600_000_000, 1_700_000_000, size=ids.shape).astype(
            np.float32
        ),
    }

    mesh = build_mesh(MeshConfig(data=-1))
    example = {k: jnp.asarray(v) for k, v in host_batch.items()}
    variables = wrapper.init_variables(jax.random.PRNGKey(0), example)
    params = variables.get("params", {})
    constants = variables.get("constants", {})
    optimizer = build_optimizer(wrapper, ModelTrainConfig(), params)
    table_state = (
        wrapper.init_table_state(params)
        if hasattr(wrapper, "init_table_state")
        else None
    )
    state = TrainState.create(
        params, constants, optimizer.init(params), wrapper.init_aux_state(),
        jax.random.PRNGKey(1), table_state=table_state,
    )
    repl = NamedSharding(mesh, PartitionSpec())
    state = jax.device_put(state, repl)
    dbatch = {
        k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, PartitionSpec("data")))
        for k, v in host_batch.items()
    }

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, b):
        rng, sub = jax.random.split(state.rng)

        def loss_fn(p):
            return wrapper.loss_and_metrics(p, state.constants, state.aux, b, sub, True)

        (loss, (metrics, new_aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_table_state = state.table_state
        if state.table_state is not None:
            # lazy row-sparse table step (mirrors train/strategy.py): the
            # table's generic optax update is a foldable zero
            new_params, new_table_state = wrapper.apply_lazy_table_update(
                new_params, grads, state.table_state, b
            )
        return (
            TrainState(
                params=new_params, constants=state.constants, opt_state=new_opt,
                aux=new_aux, step=state.step + 1, rng=rng,
                table_state=new_table_state,
            ),
            loss,
        )

    # param-checksum fetch: a host device_get is the only reliable execution
    # barrier on tunneled runtimes (block_until_ready can report early there)
    checksum = jax.jit(
        lambda s: jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x)), s.params,
            jnp.asarray(0.0, jnp.float32),
        )
    )

    # warmup / compile
    state, loss = train_step(state, dbatch)
    float(checksum(state))

    steps = 20 if on_tpu else 3
    t0 = time.time()
    for _ in range(steps):
        state, loss = train_step(state, dbatch)
    float(checksum(state))
    elapsed = time.time() - t0

    n_chips = len(jax.devices())
    examples_per_sec_per_chip = steps * batch / elapsed / n_chips

    vs_baseline = 1.0
    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    if os.path.exists(baseline_path):
        try:
            with open(baseline_path) as f:
                base = json.load(f)
            if base.get("value"):
                vs_baseline = examples_per_sec_per_chip / float(base["value"])
        except Exception:
            pass

    print(
        json.dumps(
            {
                "metric": "lthm_train_examples_per_sec_per_chip",
                "value": round(examples_per_sec_per_chip, 2),
                "unit": "examples/s/chip",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
