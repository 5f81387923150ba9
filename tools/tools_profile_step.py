"""Ad-hoc: break LTHM bench step into parts and time each on the TPU."""
from __future__ import annotations

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

batch, seq, layers, d, vocab = 64, 256, 6, 512, 1_000_000

cfg = LTHMModelConfig(
    features={"defaults": {}},
    transformer_config=TransformerConfig(
        rotator_config={"ff_mult": 4}, is_causal=True, num_layers=layers,
        enable_gradient_checkpointing=False,
        use_flash_attention=True,
        attn_config=SelfAttentionConfig(
            n_head=max(4, d // 16), n_embd=d, attn_type="multi_query",
            dropout=0.0, attn_dropout=0.0, bias=False,
        ),
    ),
    product_tower=ProductTowerConfig(
        inp_emb_dim=32, out_emb_dim=d, product_emb_dim=128, norm_bins=20,
        cosine_lsh_config=[{"num_bins": nb, "num_proj": 32} for nb in (2, 4, 8, 12, 16, 20)],
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
)
wrapper = LTHMModelWrapper(cfg)

rs = np.random.RandomState(0)
ids = rs.randint(-(2**62), 2**62, size=(batch, seq + 8)).astype(np.int64)
ids[:, -4:] = 0
host_batch = {
    "product_ids": ids,
    "labels": rs.randint(0, 4, size=ids.shape).astype(np.float32),
    "timestamps": rs.randint(1_600_000_000, 1_700_000_000, size=ids.shape).astype(np.float32),
}

mesh = build_mesh(MeshConfig(data=-1))
example = {k: jnp.asarray(v) for k, v in host_batch.items()}
variables = wrapper.init_variables(jax.random.PRNGKey(0), example)
params = variables.get("params", {})
constants = variables.get("constants", {})
optimizer = build_optimizer(wrapper, ModelTrainConfig(), params)
state = TrainState.create(params, constants, optimizer.init(params),
                          wrapper.init_aux_state(), jax.random.PRNGKey(1))
repl = NamedSharding(mesh, PartitionSpec())
state = jax.device_put(state, repl)
dbatch = {k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, PartitionSpec("data")))
          for k, v in host_batch.items()}


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    fetch = jax.jit(lambda o: jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)), o, jnp.float32(0)))
    float(fetch(out))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(fetch(out))
    dt = (time.time() - t0) / n
    print(f"{name:28s} {dt*1e3:8.2f} ms")
    return dt


# 1. pure dispatch overhead: trivial jit
trivial = jax.jit(lambda x: x + 1.0)
x0 = jax.device_put(jnp.zeros((8, 8), jnp.float32), repl)
timeit("trivial dispatch", trivial, x0, n=20)

# 2. forward only
fwd = jax.jit(lambda p, b: wrapper.forward({"params": p, "constants": constants}, b, deterministic=True))
timeit("forward", fwd, state.params, dbatch)

# 3. forward + loss (no grad)
loss_only = jax.jit(lambda p, b: wrapper.loss_and_metrics(
    p, constants, state.aux, b, jax.random.PRNGKey(2), True)[0])
timeit("forward+loss", loss_only, state.params, dbatch)

# 4. grad of loss
grad_fn = jax.jit(lambda p, b: jax.grad(
    lambda pp: wrapper.loss_and_metrics(pp, constants, state.aux, b, jax.random.PRNGKey(2), True)[0])(p))
timeit("fwd+loss+bwd", grad_fn, state.params, dbatch)

# 5. optimizer update alone
g = grad_fn(state.params, dbatch)
g = jax.device_put(g, repl)
opt_fn = jax.jit(lambda gg, os_, p: optimizer.update(gg, os_, p))
timeit("optimizer.update", opt_fn, g, state.opt_state, state.params)

# 6. full step (as in bench, but non-donated for reuse)
def full(state, b):
    rng, sub = jax.random.split(state.rng)
    def loss_fn(p):
        return wrapper.loss_and_metrics(p, state.constants, state.aux, b, sub, True)
    (loss, (metrics, new_aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(params=new_params, constants=state.constants, opt_state=new_opt,
                      aux=new_aux, step=state.step + 1, rng=rng), loss

full_j = jax.jit(full)
timeit("full step", full_j, state, dbatch)

# flops estimate from XLA
try:
    lowered = jax.jit(full).lower(state, dbatch)
    comp = lowered.compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print("cost_analysis flops:", ca.get("flops"))
    print("cost_analysis bytes accessed:", ca.get("bytes accessed"))
except Exception as e:
    print("cost_analysis failed:", e)
