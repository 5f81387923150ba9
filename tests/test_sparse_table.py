"""Lazy row-sparse table optimizer (train/sparse_table): touched rows get
exact rowwise-Adam steps, untouched rows (params AND moments) stay
bit-identical — the reference's sparse-optimizer semantics
(``nn.Embedding(sparse=True)``, ``base_model_wrapper.py:51-72``)."""

import jax
import jax.numpy as jnp
import numpy as np

from recommendations_tpu.train.sparse_table import (
    LazyRowState,
    init_lazy_row_state,
    lazy_rowwise_adam_update,
)


def _dense_rowwise_adam_oracle(table, grad, m, v, count, lr, b1, b2, eps):
    """NumPy oracle: rowwise Adam applied ONLY to rows with nonzero grad."""
    table, grad, m, v = map(np.array, (table, grad, m, v))
    active = (grad != 0).any(axis=1)
    c = count + 1
    nm, nv, nt = m.copy(), v.copy(), table.copy()
    for i in np.where(active)[0]:
        nm[i] = b1 * m[i] + (1 - b1) * grad[i]
        nv[i] = b2 * v[i] + (1 - b2) * np.mean(grad[i] ** 2)
        mhat = nm[i] / (1 - b1 ** c)
        vhat = nv[i] / (1 - b2 ** c)
        nt[i] = table[i] - lr * mhat / (np.sqrt(vhat) + eps)
    return nt, nm, nv


def test_lazy_update_matches_dense_oracle():
    rs = np.random.RandomState(0)
    n, d = 64, 8
    table = jnp.asarray(rs.randn(n, d), jnp.float32)
    grad = np.zeros((n, d), np.float32)
    touched = rs.choice(n, size=10, replace=False)
    grad[touched] = rs.randn(10, d)
    grad = jnp.asarray(grad)
    state = init_lazy_row_state(table)
    # second step from a nonzero-moment state
    state = LazyRowState(
        m=jnp.asarray(rs.randn(n, d) * 0.01, jnp.float32),
        v=jnp.abs(jnp.asarray(rs.randn(n, 1) * 0.01, jnp.float32)),
        count=jnp.asarray(3, jnp.int32),
    )
    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-8
    new_table, new_state = jax.jit(
        lambda t, g, s: lazy_rowwise_adam_update(
            t, g, s, learning_rate=lr, capacity=16, b1=b1, b2=b2, eps=eps
        )
    )(table, grad, state)

    want_t, want_m, want_v = _dense_rowwise_adam_oracle(
        table, grad, state.m, state.v, 3, lr, b1, b2, eps
    )
    np.testing.assert_allclose(np.asarray(new_table), want_t, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state.m), want_m, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state.v), want_v, rtol=1e-5, atol=1e-6)
    assert int(new_state.count) == 4

    # untouched rows bit-identical (the lazy guarantee)
    untouched = np.setdiff1d(np.arange(n), touched)
    np.testing.assert_array_equal(
        np.asarray(new_table)[untouched], np.asarray(table)[untouched]
    )
    np.testing.assert_array_equal(
        np.asarray(new_state.m)[untouched], np.asarray(state.m)[untouched]
    )


def test_lazy_update_capacity_overflow_drops_excess():
    """More touched rows than capacity: the overflow rows keep their params
    and moments for this step (documented behavior — size capacity from
    batch geometry so it cannot happen in training)."""
    n, d = 32, 4
    table = jnp.ones((n, d), jnp.float32)
    grad = jnp.ones((n, d), jnp.float32)  # every row touched
    state = init_lazy_row_state(table)
    new_table, new_state = lazy_rowwise_adam_update(
        table, grad, state, learning_rate=0.1, capacity=8
    )
    changed = np.asarray((new_table != table).any(axis=1))
    assert changed.sum() == 8
    assert int(new_state.count) == 1


def test_lthm_trains_with_lazy_table():
    """End-to-end: tiny LTHM with table_optimizer=lazy_rowwise_adam runs the
    pjit strategy step; table rows move, untouched rows don't, loss finite."""
    import pandas as pd

    from recommendations_tpu.config.pipeline_config import TrainerPipelineConfig
    from recommendations_tpu.data.data_store import FakeDataStore
    from recommendations_tpu.data.generator import get_data_loader_strategy
    from recommendations_tpu.pipeline.trainer_pipeline import TrainerPipeline
    from recommendations_tpu.tools.synth_data import make_click_log, _pad_lists

    HIST = 12
    FakeDataStore.reset()
    for p in range(2):
        df = _pad_lists(
            make_click_log(num_users=24, history_len=HIST, num_products=200, seed=p),
            HIST,
        )
        FakeDataStore.put_table(f"clicks/date=20240101/part-{p}.parquet", df)

    model = {
        "kind": "lthm", "name": "lthm",
        "log_q_config": {"num_buckets": 1024, "hash_offsets": [0, 7]},
        "context_width": 8, "lookahead": [0, 2], "metrics_k_all": [1, 5],
        "train_mini_batch_size": -1, "lr": 1e-2,
        "table_optimizer": "lazy_rowwise_adam",
        "product_tower": {
            "inp_emb_dim": 8, "out_emb_dim": 16, "product_emb_dim": 8,
            "norm_bins": 4, "cosine_lsh_config": [{"num_bins": 4, "num_proj": 4}],
            "latent_model_config": {
                "vocab_size_latent": 2048, "num_shifts_latent": 2,
                "normalize_embedding": True,
            },
        },
        "transformer_config": {
            "rotator_config": {"ff_mult": 2}, "is_causal": True, "num_layers": 1,
            "attn_config": {"n_head": 2, "n_embd": 16, "attn_type": "multi_query",
                             "dropout": 0.0, "attn_dropout": 0.0, "bias": False},
        },
        "compute_dtype": "float32",
        "features": {
            "defaults": {
                "categorical_features": {"default_dtype": "string",
                                          "value_to_number_mapper": {"kind": "xxhash"}},
                "categorical_history_features": {"default_dtype": "string_list"},
            },
            "categorical_features": [{"name": "product_id", "kind": "categorical"}],
            "categorical_history_features": [{
                "name": "product_ids", "kind": "categorical_history",
                "history_length": HIST, "history_id_feature_name": "product_id",
                "value_to_number_mapper": {"kind": "xxhash"}}],
            "tensor_list_features": [
                {"name": n, "kind": "tensor_list", "shape": [HIST]}
                for n in ("labels", "timestamps")],
        },
    }
    cfg = TrainerPipelineConfig(
        model=model, model_version="lazy_test", checkpoint_dir=None,
        dataset={"filesystem_config": {"kind": "fake", "path_template": "clicks/date={date}"},
                  "train_data_end_date": "20240101", "train_period_in_days": 1,
                  "val_data_start_date": "20240101", "val_period_in_days": 1},
        train={"batch_size": 8, "train_steps": 4, "epochs": 2,
                "train_metrics_every_n_steps": 2, "val_metrics_every_n_steps": 0,
                "validation_steps": 0, "checkpoint_every_k_steps": 0},
        data_loader={"kind": "simple", "block_size": 1, "shuffle_files": False},
        eval={"skip_eval": True}, inference={"skip_inference": True}, export=None,
        training_strategy={"name": "pjit", "mesh_data": -1},
        trackers={"trackers": []},
    )
    builder = cfg.model.get_builder()
    dls = get_data_loader_strategy(
        cfg.data_loader, columns=cfg.model.features.get_input_columns(),
        data_mapper=cfg.model.preprocess_fn,
    )
    from recommendations_tpu.train.strategy import get_training_strategy

    ts = get_training_strategy(cfg.training_strategy)
    pipe = TrainerPipeline(cfg, builder, ts, dls)
    metrics = pipe.execute()
    assert metrics["train_steps_total"] == 4
    assert np.isfinite(metrics["train_loss"])
    wrapper, state = pipe._trained
    assert state.table_state is not None
    assert int(state.table_state.count) == 4
    # most of the 2048-row table was never touched by 32 examples
    m = np.asarray(state.table_state.m)
    assert (np.abs(m).sum(axis=1) == 0).mean() > 0.5


# ---------------------------------------------------------------------------
# table_optimizer: auto — the measured dispatch rule as config (VERDICT r4 #3)
# ---------------------------------------------------------------------------


def _cfg(vocab, detach=False, shard=False, table_optimizer="auto",
         pretrained=None):
    from recommendations_tpu.models.lthm.config import LTHMModelConfig

    return LTHMModelConfig(
        features={"defaults": {}},
        transformer_config={
            "rotator_config": {"ff_mult": 2},
            "is_causal": True,
            "num_layers": 1,
            "attn_config": {"n_head": 2, "n_embd": 16},
        },
        product_tower={
            "inp_emb_dim": 8,
            "out_emb_dim": 16,
            "product_emb_dim": 8,
            "detach_item_tower": detach,
            "latent_model_config": {
                "vocab_size_latent": vocab, "num_shifts_latent": 2,
            },
            **({"model_init_metadata": pretrained} if pretrained else {}),
        },
        shard_embedding_rows=shard,
        table_optimizer=table_optimizer,
    )


def test_auto_dispatch_table():
    """Pins the measured dispatch (QUALITY.md r4): frozen under detach,
    rowwise below 2M rows, sparse_fused at/above, dense co-sharded when
    row-sharded."""
    # detach (reference parity): structurally-zero table grads -> frozen
    assert _cfg(10_000_000, detach=True).resolved_table_optimizer() == "frozen"
    assert _cfg(1_000, detach=True).resolved_table_optimizer() == "frozen"
    # pretrained module: table lives in frozen constants
    assert (
        _cfg(1_000, pretrained={"embedding_module_path": "/tmp/x"})
        .resolved_table_optimizer()
        == "frozen"
    )
    # trainable, small: dense rowwise wins (1075 vs 986 ex/s at 1M)
    assert _cfg(1_000_000).resolved_table_optimizer() == "rowwise_adam"
    # trainable, large: fused-record sparse wins (881 vs 722 at 10M)
    assert _cfg(2_000_000).resolved_table_optimizer() == "sparse_fused_adam"
    assert _cfg(10_000_000).resolved_table_optimizer() == "sparse_fused_adam"
    # row-sharded tables keep the dense co-sharded path at any size
    assert _cfg(10_000_000, shard=True).resolved_table_optimizer() == "rowwise_adam"
    # explicit choices resolve to themselves
    assert _cfg(1_000, table_optimizer="adamw").resolved_table_optimizer() == "adamw"
    assert (
        _cfg(50_000, table_optimizer="lazy_rowwise_adam")
        .resolved_table_optimizer()
        == "lazy_rowwise_adam"
    )


def test_lazy_hard_gated_at_scale():
    """lazy_rowwise_adam at V>=5M hard-errors (969 ms/step nonzero-over-V
    scan at 10M, measured) instead of silently training 10x slower."""
    import pytest

    with pytest.raises(Exception, match="lazy_rowwise_adam"):
        _cfg(10_000_000, table_optimizer="lazy_rowwise_adam")
    # small tables stay allowed
    _cfg(50_000, table_optimizer="lazy_rowwise_adam")


def test_auto_resolution_is_call_time():
    """Flipping detach after construction re-resolves (tests/tools rely on
    mutating the pydantic config post-hoc)."""
    cfg = _cfg(10_000_000, detach=True)
    assert cfg.resolved_table_optimizer() == "frozen"
    cfg.product_tower.detach_item_tower = False
    assert cfg.resolved_table_optimizer() == "sparse_fused_adam"


def test_fused_update_rows_nan_bit():
    """A NaN tap-gradient trips the compact rows_nan flag the step it is
    written, and a poisoned row re-trips when touched again (ADVICE r4 #1)."""
    from recommendations_tpu.train.sparse_table import (
        FusedTableState,
        fused_record_init,
        sparse_fused_adam_update,
    )

    d = 8
    rec = fused_record_init(jax.random.PRNGKey(0), 64, d)
    idx = jnp.asarray([3, 5], jnp.int32)
    g = jnp.ones((2, d), jnp.float32)
    state = FusedTableState(count=jnp.zeros((), jnp.int32))
    step = jax.jit(
        lambda r, i, gg, s: sparse_fused_adam_update(
            r, i, gg, s, learning_rate=0.1
        )
    )
    rec1, state1, nan1 = step(rec, idx, g, state)
    assert not bool(nan1)
    g_bad = g.at[1, 0].set(jnp.nan)
    rec2, state2, nan2 = step(rec1, idx, g_bad, state1)
    assert bool(nan2)
    # row 5 is now poisoned; a later CLEAN step touching it re-trips
    rec3, _, nan3 = step(rec2, idx, g, state2)
    assert bool(nan3)
    # ...but a clean step touching only healthy rows does not
    _, _, nan4 = step(rec2, jnp.asarray([3, 7], jnp.int32), g, state2)
    assert not bool(nan4)
