"""Long-context attention bench: Pallas flash vs XLA dense at seq 1024.

BASELINE config 5 component ('long-history seq len 1024').  Compares one
full LTHM train step with ``use_flash_attention`` on/off on the real chip.
Prints one JSON line per variant.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import json
import sys
import time

import numpy as np


def run(use_flash: bool, seq: int = 1024, batch: int = 16, layers: int = 6, d: int = 512):
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

    cfg = LTHMModelConfig(
        features={"defaults": {}},
        transformer_config=TransformerConfig(
            rotator_config={"ff_mult": 4},
            is_causal=True,
            num_layers=layers,
            enable_gradient_checkpointing=True,
            use_flash_attention=use_flash,
            attn_config=SelfAttentionConfig(
                n_head=d // 16, n_embd=d, attn_type="multi_query",
                dropout=0.0, attn_dropout=0.0, bias=False, pos_bias=None,
            ),
        ),
        product_tower=ProductTowerConfig(
            inp_emb_dim=32, out_emb_dim=d, product_emb_dim=128, norm_bins=20,
            cosine_lsh_config=[{"num_bins": nb, "num_proj": 32} for nb in (4, 8, 16)],
            latent_model_config={
                "vocab_size_latent": 1_000_000, "num_shifts_latent": 8,
                "normalize_embedding": True,
            },
        ),
        log_q_config=LogQConfig(num_buckets=2**22, hash_offsets=[0, 34144]),
        lookahead=[0, 5, 12, 30],
        context_width=seq,
        softmax_temperature=0.05,
        train_mini_batch_size=8,
    )
    wrapper = LTHMModelWrapper(cfg)
    rs = np.random.RandomState(0)
    ids = rs.randint(-(2**62), 2**62, size=(batch, seq)).astype(np.int64)
    host_batch = {
        "product_ids": ids,
        "labels": rs.randint(0, 4, size=ids.shape).astype(np.float32),
        "timestamps": rs.randint(1_600_000_000, 1_700_000_000, size=ids.shape).astype(np.float32),
    }
    mesh = build_mesh(MeshConfig(data=-1))
    example = {k: jnp.asarray(v) for k, v in host_batch.items()}
    variables = wrapper.init_variables(jax.random.PRNGKey(0), example)
    params = variables.get("params", {})
    optimizer = build_optimizer(wrapper, ModelTrainConfig(), params)
    state = TrainState.create(
        params, variables.get("constants", {}), optimizer.init(params),
        wrapper.init_aux_state(), jax.random.PRNGKey(1),
    )
    state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))
    dbatch = {
        k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, PartitionSpec("data")))
        for k, v in host_batch.items()
    }

    @jax.jit
    def train_step(state, b):
        rng, sub = jax.random.split(state.rng)

        def loss_fn(p):
            return wrapper.loss_and_metrics(p, state.constants, state.aux, b, sub, True)

        (loss, (_, new_aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, state.constants, new_opt, new_aux, state.step + 1, rng), loss

    checksum = jax.jit(
        lambda s: jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x)), s.params,
            jnp.asarray(0.0, jnp.float32),
        )
    )
    state, loss = train_step(state, dbatch)
    float(checksum(state))
    steps = 10
    t0 = time.time()
    for _ in range(steps):
        state, loss = train_step(state, dbatch)
    float(checksum(state))
    dt = time.time() - t0
    eps = steps * batch / dt / len(jax.devices())
    print(json.dumps({
        "metric": f"lthm_seq{seq}_train_examples_per_sec_per_chip",
        "value": round(eps, 2),
        "unit": "examples/s/chip",
        "variant": "flash" if use_flash else "xla",
        "step_ms": round(dt / steps * 1000, 2),
    }))
    return eps


if __name__ == "__main__":
    import recommendations_tpu  # noqa: F401

    seq = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    run(use_flash=False, seq=seq)
    try:
        run(use_flash=True, seq=seq)
    except Exception as e:  # some TPU runtimes cannot compile gridded pallas
        print(json.dumps({
            "metric": f"lthm_seq{seq}_train_examples_per_sec_per_chip",
            "variant": "flash", "error": str(e)[:160],
        }))
