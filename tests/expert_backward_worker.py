"""Worker for the 2-process expert-parallel BACKWARD test.

The in-process XLA:CPU backend deadlocks on the backward of expert-sharded
params (concurrent subgroup all-reduces trip a rendezvous race —
``__graft_entry__.py`` pins expert=1 for the dryrun). VERDICT r2 #6 asks
for evidence the gradient path executes at all: across PROCESS boundaries
the collectives ride the distributed runtime's rendezvous instead, so a
2-process localhost group can run the full train step with mesh expert=2.

Each process contributes 2 virtual CPU devices -> global mesh
(data=2, expert=2). One optimizer step on the MoE LTHM wrapper with
expert-sharded stacks; asserts finite, nonzero grads on every
P('expert', ...) leaf.
"""

import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(f"localhost:{port}", num_procs, proc_id)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from recommendations_tpu.core.mesh import MeshConfig, build_mesh, local_batch_slice
from recommendations_tpu.core.partitioning import shard_params
from recommendations_tpu.data.loader import device_put_batch
from recommendations_tpu.models.lthm.config import (
    LTHMModelConfig,
    LogQConfig,
    ProductTowerConfig,
    SelfAttentionConfig,
    TransformerConfig,
)
from recommendations_tpu.models.lthm.wrapper import LTHMModelWrapper

assert jax.process_count() == num_procs

cfg = LTHMModelConfig(
    features={"defaults": {}},
    transformer_config=TransformerConfig(
        rotator_config={"num_experts": 4, "proj_features": 16, "ff_mult_factor": 2},
        is_causal=True,
        num_layers=1,
        attn_config=SelfAttentionConfig(
            n_head=2, n_embd=32, attn_type="multi_query",
            dropout=0.0, attn_dropout=0.0, bias=False,
        ),
    ),
    product_tower=ProductTowerConfig(
        inp_emb_dim=16, out_emb_dim=32, product_emb_dim=16, norm_bins=4,
        cosine_lsh_config=[{"num_bins": 4, "num_proj": 8}],
        latent_model_config={
            "vocab_size_latent": 1024, "num_shifts_latent": 4,
            "normalize_embedding": True,
        },
    ),
    log_q_config=LogQConfig(num_buckets=1024, hash_offsets=[0]),
    lookahead=[0, 2],
    context_width=8,
    train_mini_batch_size=-1,
    compute_dtype="float32",  # XLA:CPU sharded DotThunk lacks bf16
)
wrapper = LTHMModelWrapper(cfg)

mesh = build_mesh(MeshConfig(data=2, expert=2))
assert dict(mesh.shape)["expert"] == 2, mesh.shape

rs = np.random.RandomState(0)
B, S = 8, 12
ids = rs.randint(-(2**62), 2**62, size=(B, S)).astype(np.int64)
ids[:, -2:] = 0
global_batch = {
    "product_ids": ids,
    "labels": rs.randint(0, 4, size=(B, S)).astype(np.float32),
    "timestamps": rs.randint(1_600_000_000, 1_700_000_000, size=(B, S)).astype(
        np.float32
    ),
}
start, size = local_batch_slice(mesh, B)
batch = device_put_batch({k: v[start : start + size] for k, v in global_batch.items()}, mesh)

variables = wrapper.init_variables(jax.random.PRNGKey(0), global_batch)
params = shard_params(mesh, variables.get("params", {}), wrapper.partition_rules())
constants = jax.tree_util.tree_map(
    lambda x: jax.device_put(x, NamedSharding(mesh, P())), variables.get("constants", {})
)
aux = wrapper.init_aux_state()
rng = jax.random.PRNGKey(2)


@jax.jit
def grad_step(p, b):
    def loss_fn(pp):
        loss, _ = wrapper.loss_and_metrics(pp, constants, aux, b, rng, True)
        return loss

    return jax.value_and_grad(loss_fn)(p)


loss, grads = grad_step(params, batch)
loss = float(loss)
assert np.isfinite(loss), loss

expert_leaves = 0
for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
    key = "/".join(str(getattr(p, "key", p)) for p in path)
    if "moe_fc" in key or "moe_proj" in key:
        expert_leaves += 1
        g = np.asarray(jax.device_get(leaf))
        assert np.isfinite(g).all(), f"non-finite grad at {key}"
        assert np.abs(g).sum() > 0, f"zero grad at {key}"
assert expert_leaves >= 4, f"only {expert_leaves} expert grad leaves"

print(f"proc {proc_id}: ok loss={loss:.4f} expert_grad_leaves={expert_leaves}")
