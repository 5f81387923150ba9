"""Weak-scaling measurement: examples/s/device at fixed per-device batch.

BASELINE.json's north star requires ">=85% weak-scaling efficiency
host -> pod". This tool measures it for the data-parallel axis: it runs the
same donated jitted train step over meshes of increasing device count with a
FIXED per-device batch, and reports throughput plus efficiency vs the
1-device run.

On a real multi-chip slice this measures ICI all-reduce overhead directly.
Without one (this repo's dev environment has a single tunneled chip), run it
on the virtual CPU mesh to validate the harness:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m recommendations_tpu.tools.weak_scaling --devices 1 2 4 8

CPU numbers share host compute, so efficiency there reflects host
contention, not ICI — the tool prints which regime it measured.

Replaces: nothing in the reference (it logs samples/sec per run,
``accelerate_training_strategy.py:418,431``, but has no scaling harness).
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np


def _tiny_setup(n_devices: int, per_device_batch: int, seq: int):
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec

    from recommendations_tpu.core.mesh import MeshConfig, build_mesh
    from recommendations_tpu.config.trainer_config import ModelTrainConfig
    from recommendations_tpu.models.lthm.config import (
        LTHMModelConfig,
        LogQConfig,
        ProductTowerConfig,
        SelfAttentionConfig,
        TransformerConfig,
    )
    from recommendations_tpu.models.lthm.wrapper import LTHMModelWrapper
    from recommendations_tpu.train.optimizers import build_optimizer
    from recommendations_tpu.train.train_state import TrainState

    devices = jax.devices()[:n_devices]
    mesh = jax.sharding.Mesh(np.asarray(devices).reshape(n_devices), ("data",))

    cfg = LTHMModelConfig(
        features={"defaults": {}},
        transformer_config=TransformerConfig(
            rotator_config={"ff_mult": 2},
            is_causal=True,
            num_layers=2,
            attn_config=SelfAttentionConfig(
                n_head=4, n_embd=64, attn_type="multi_query",
                dropout=0.0, attn_dropout=0.0, bias=False,
            ),
        ),
        product_tower=ProductTowerConfig(
            inp_emb_dim=16, out_emb_dim=64, product_emb_dim=32, norm_bins=4,
            cosine_lsh_config=[{"num_bins": 4, "num_proj": 8}],
            latent_model_config={
                "vocab_size_latent": 65536, "num_shifts_latent": 4,
                "normalize_embedding": True,
            },
        ),
        log_q_config=LogQConfig(num_buckets=65536, hash_offsets=[0, 7]),
        lookahead=[0, 2, 4],
        context_width=seq,
        train_mini_batch_size=-1,
    )
    wrapper = LTHMModelWrapper(cfg)

    batch_size = n_devices * per_device_batch
    rs = np.random.RandomState(0)
    ids = rs.randint(-(2**62), 2**62, size=(batch_size, seq)).astype(np.int64)
    ids[:, -4:] = 0
    host_batch = {
        "product_ids": ids,
        "labels": rs.randint(0, 4, size=ids.shape).astype(np.float32),
        "timestamps": rs.randint(1_600_000_000, 1_700_000_000, size=ids.shape).astype(
            np.float32
        ),
    }
    example = {k: jnp.asarray(v) for k, v in host_batch.items()}
    variables = wrapper.init_variables(jax.random.PRNGKey(0), example)
    params = variables.get("params", {})
    constants = variables.get("constants", {})
    optimizer = build_optimizer(wrapper, ModelTrainConfig(), params)
    state = TrainState.create(
        params, constants, optimizer.init(params), wrapper.init_aux_state(),
        jax.random.PRNGKey(1),
    )
    state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))
    dbatch = {
        k: jax.device_put(v, NamedSharding(mesh, PartitionSpec("data")))
        for k, v in example.items()
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
        return (
            TrainState(
                params=new_params, constants=state.constants, opt_state=new_opt,
                aux=new_aux, step=state.step + 1, rng=rng,
            ),
            loss,
        )

    return train_step, state, dbatch, batch_size


def measure(n_devices: int, per_device_batch: int, seq: int, steps: int) -> dict:
    import jax
    import jax.numpy as jnp

    train_step, state, dbatch, batch_size = _tiny_setup(
        n_devices, per_device_batch, seq
    )
    checksum = jax.jit(
        lambda s: jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x)), s.params,
            jnp.asarray(0.0, jnp.float32),
        )
    )
    state, _ = train_step(state, dbatch)  # compile
    float(checksum(state))
    t0 = time.time()
    for _ in range(steps):
        state, _ = train_step(state, dbatch)
    float(checksum(state))
    dt = time.time() - t0
    from recommendations_tpu.core.mesh import _device_granules

    n_granules = len(_device_granules(jax.devices()[:n_devices]))
    return {
        "devices": n_devices,
        "global_batch": batch_size,
        "examples_per_sec": steps * batch_size / dt,
        "examples_per_sec_per_device": steps * batch_size / dt / n_devices,
        "step_ms": dt / steps * 1e3,
        # comms regime: 1 granule = all-ICI; >1 = hybrid ICI+DCN (grad
        # reduction crosses slices/hosts over DCN)
        "regime": "ici" if n_granules == 1 else f"hybrid_dcn_x{n_granules}",
    }


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    parser.add_argument("--per-device-batch", type=int, default=8)
    parser.add_argument("--seq", type=int, default=32)
    parser.add_argument("--steps", type=int, default=20)
    args = parser.parse_args(argv)

    import jax

    avail = len(jax.devices())
    sizes = [n for n in args.devices if n <= avail]
    platform = jax.devices()[0].platform
    results = []
    for n in sizes:
        r = measure(n, args.per_device_batch, args.seq, args.steps)
        results.append(r)
        print(json.dumps(r))
    if results:
        base = results[0]["examples_per_sec_per_device"]
        for r in results:
            r["weak_scaling_efficiency"] = r["examples_per_sec_per_device"] / base
        print(
            json.dumps(
                {
                    "metric": "weak_scaling_efficiency",
                    "platform": platform,
                    "note": (
                        "CPU mesh shares host compute - efficiency reflects host "
                        "contention, not ICI" if platform == "cpu" else
                        "real multi-device measurement"
                    ),
                    "series": {
                        str(r["devices"]): round(r["weak_scaling_efficiency"], 4)
                        for r in results
                    },
                }
            )
        )
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
