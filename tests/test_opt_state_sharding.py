"""Optimizer state co-sharded with row-sharded params (VERDICT r1 item 1).

The table's Adam/rowwise moments must live with their rows: per-device
opt-state bytes for the table group ~= table_bytes / n_shards, not 1x
(replicated) — otherwise sharding the table saves nothing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from recommendations_tpu.config.trainer_config import ModelTrainConfig
from recommendations_tpu.core.mesh import MeshConfig, build_mesh
from recommendations_tpu.core.partitioning import (
    PartitionRules,
    opt_state_specs,
    shard_opt_state,
    shard_params,
)
from recommendations_tpu.train.optimizers import build_optimizer, rowwise_adam


def _tiny_wrapper(shard_rows=True):
    import __graft_entry__ as ge

    return ge._tiny_wrapper(shard_rows=shard_rows)


def _tiny_batch():
    import __graft_entry__ as ge

    return ge._tiny_batch()


def _leaf_shard_bytes(arr) -> int:
    """Bytes of this array resident on device 0."""
    shard = [s for s in arr.addressable_shards if s.device == jax.devices()[0]]
    return int(np.prod(shard[0].data.shape)) * arr.dtype.itemsize if shard else 0


def test_opt_state_specs_follow_param_suffix():
    params = {"emb": {"table": jnp.zeros((64, 8))}, "dense": jnp.zeros((8, 8))}
    rules = PartitionRules([(r"emb/table", P("model", None)), (r".*", P())])
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    specs = opt_state_specs(opt_state, params, rules)
    flat = {
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(
            specs, is_leaf=lambda x: isinstance(x, P)
        )[0]
    }
    mu_table = [v for k, v in flat.items() if k.endswith("mu/emb/table")]
    assert mu_table == [P("model", None)]
    counts = [v for k, v in flat.items() if k.endswith("count")]
    assert all(c == P() for c in counts)


def test_rowwise_state_trimmed_spec():
    """A (N, 1) rowwise second moment still shards its rows."""
    params = {"table": jnp.zeros((64, 8))}
    rules = PartitionRules([(r"table", P("model", None)), (r".*", P())])
    tx = rowwise_adam(1e-2)
    opt_state = tx.init(params)
    specs = opt_state_specs(opt_state, params, rules)
    assert specs["nu"]["table"] == P("model", None)
    assert specs["mu"]["table"] == P("model", None)
    assert specs["count"] == P()


def test_lthm_table_opt_state_sharded_bytes():
    mesh = build_mesh(MeshConfig(data=-1, model=4))
    n_shards = 4
    wrapper = _tiny_wrapper(shard_rows=True)
    wrapper.bind_mesh(mesh)
    batch = _tiny_batch()
    variables = wrapper.init_variables(jax.random.PRNGKey(0), batch)
    params = variables["params"]
    optimizer = build_optimizer(wrapper, ModelTrainConfig(), params)
    opt_state = optimizer.init(params)
    rules = wrapper.partition_rules()

    sharded_params = shard_params(mesh, params, rules)
    sharded_opt = shard_opt_state(mesh, opt_state, params, rules)

    table = sharded_params["product_emb_module"]["embedding"]
    table_bytes = table.size * table.dtype.itemsize
    assert _leaf_shard_bytes(table) == table_bytes // n_shards

    # every opt-state leaf whose path ends with the table path is sharded
    flat = jax.tree_util.tree_flatten_with_path(sharded_opt)[0]
    table_leaves = [
        (path, leaf)
        for path, leaf in flat
        if "product_emb_module" in str(path) and "embedding" in str(path)
    ]
    assert table_leaves, "no optimizer state found for the embedding table"
    for path, leaf in table_leaves:
        total = leaf.size * leaf.dtype.itemsize
        assert _leaf_shard_bytes(leaf) == total // n_shards, str(path)

    # rowwise adam: the table group's second moment is (N, 1), not (N, d)
    mu_like = [l for p, l in table_leaves if l.ndim == 2 and l.shape[-1] == 1]
    assert mu_like, "expected a rowwise (N, 1) second moment for the table"


def test_sharded_opt_state_trains_one_step():
    """The co-sharded state composes with multi_transform in a jitted step."""
    mesh = build_mesh(MeshConfig(data=-1, model=2))
    wrapper = _tiny_wrapper(shard_rows=True)
    # let gradients reach the table (the default detach_item_tower=True
    # stop-gradients it, reference product_tower.py:43-62)
    wrapper.config.product_tower.detach_item_tower = False
    wrapper.bind_mesh(mesh)
    batch = _tiny_batch()
    variables = wrapper.init_variables(jax.random.PRNGKey(0), batch)
    params = variables["params"]
    optimizer = build_optimizer(wrapper, ModelTrainConfig(), params)
    rules = wrapper.partition_rules()
    constants = jax.device_put(
        variables.get("constants", {}), NamedSharding(mesh, P())
    )
    params_s = shard_params(mesh, params, rules)
    opt_s = shard_opt_state(mesh, optimizer.init(params), params, rules)
    aux = jax.device_put(wrapper.init_aux_state(), NamedSharding(mesh, P()))
    dbatch = {
        k: jax.device_put(v, NamedSharding(mesh, P("data")))
        for k, v in batch.items()
    }

    @jax.jit
    def step(p, o, aux, b):
        def loss_fn(p):
            return wrapper.loss_and_metrics(
                p, constants, aux, b, jax.random.PRNGKey(1), True
            )

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    new_params, new_opt, loss = step(params_s, opt_s, aux, dbatch)
    assert np.isfinite(float(loss))
    # table actually moved (rowwise group applied updates)
    before = np.asarray(params_s["product_emb_module"]["embedding"])
    after = np.asarray(new_params["product_emb_module"]["embedding"])
    assert not np.allclose(before, after)
