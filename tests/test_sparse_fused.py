"""Fused-record sparse table path (train/sparse_table.py round 4).

The table+moments live in one (V, 128) f32 record; the gradient reaches the
optimizer as the COMPACT tap cotangent (tokens, k, d) — no dense (V, d)
gradient, no full-table cast, no nonzero-over-V scan. These tests pin:

1. ``sparse_fused_adam_update`` against a NumPy rowwise-Adam oracle, with
   duplicate-heavy indices (per-row gradient = segment sum over duplicates,
   exactly what a dense scatter-grad would produce);
2. untouched record rows bit-identical;
3. end-to-end: tiny LTHM with ``table_optimizer=sparse_fused_adam`` through
   the real pjit strategy step, and its table slice matching the SAME run
   under ``lazy_rowwise_adam`` (dense-grad reference semantics);
4. the tap-free eval path (forward + catalog encoding) on a fused config.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from recommendations_tpu.train.sparse_table import (
    RECORD_LANES,
    FusedTableState,
    fused_record_init,
    fused_record_table,
    sparse_fused_adam_update,
)

LR, B1, B2, EPS = 0.01, 0.9, 0.999, 1e-8


def _oracle(record, idx, g, count, d):
    """NumPy: dense scatter-sum of duplicate rows, rowwise Adam on touched."""
    rec = np.array(record, np.float64)
    dense = np.zeros((rec.shape[0], d), np.float64)
    np.add.at(dense, np.asarray(idx), np.asarray(g, np.float64))
    c = count + 1
    out = rec.copy()
    for i in np.unique(np.asarray(idx)):
        gi = dense[i]
        m = B1 * rec[i, d : 2 * d] + (1 - B1) * gi
        v = B2 * rec[i, 2 * d] + (1 - B2) * np.mean(gi**2)
        mhat = m / (1 - B1**c)
        vhat = v / (1 - B2**c)
        out[i, :d] = rec[i, :d] - LR * mhat / (np.sqrt(vhat) + EPS)
        out[i, d : 2 * d] = m
        out[i, 2 * d] = v
    return out


def test_fused_update_matches_oracle_with_duplicates():
    rs = np.random.RandomState(0)
    v_rows, d, m = 256, 8, 64
    record = fused_record_init(jax.random.PRNGKey(0), v_rows, d)
    # nonzero moments so decay terms are exercised
    record = record.at[:, d : 2 * d].set(
        jnp.asarray(rs.randn(v_rows, d) * 0.01, jnp.float32)
    )
    record = record.at[:, 2 * d].set(
        jnp.abs(jnp.asarray(rs.randn(v_rows) * 0.01, jnp.float32))
    )
    # heavy duplication: 64 draws from 20 distinct rows
    idx = jnp.asarray(rs.choice(20, size=m), jnp.int32)
    g = jnp.asarray(rs.randn(m, d), jnp.float32)
    state = FusedTableState(count=jnp.asarray(3, jnp.int32))

    new_rec, new_state, rows_nan = jax.jit(
        lambda r, i, gg, s: sparse_fused_adam_update(
            r, i, gg, s, learning_rate=LR, b1=B1, b2=B2, eps=EPS
        )
    )(record, idx, g, state)
    assert not bool(rows_nan)

    want = _oracle(record, idx, g, 3, d)
    np.testing.assert_allclose(
        np.asarray(new_rec), want.astype(np.float32), rtol=2e-5, atol=1e-5
    )
    assert int(new_state.count) == 4

    untouched = np.setdiff1d(np.arange(v_rows), np.asarray(idx))
    np.testing.assert_array_equal(
        np.asarray(new_rec)[untouched], np.asarray(record)[untouched]
    )
    # pad lanes never change
    np.testing.assert_array_equal(
        np.asarray(new_rec)[:, 2 * d + 1 :],
        np.asarray(record)[:, 2 * d + 1 :],
    )


def test_fused_record_init_layout():
    rec = fused_record_init(jax.random.PRNGKey(1), 64, 8)
    assert rec.shape == (64, RECORD_LANES)
    table = fused_record_table(rec, 8)
    assert table.shape == (64, 8)
    assert float(jnp.abs(table).sum()) > 0
    assert float(jnp.abs(rec[:, 8:]).sum()) == 0.0


def _tiny_pipeline_cfg(table_optimizer):
    from recommendations_tpu.config.pipeline_config import TrainerPipelineConfig

    HIST = 12
    model = {
        "kind": "lthm", "name": "lthm",
        "log_q_config": {"num_buckets": 1024, "hash_offsets": [0, 7]},
        "context_width": 8, "lookahead": [0, 2], "metrics_k_all": [1, 5],
        "train_mini_batch_size": -1, "lr": 1e-2,
        "table_optimizer": table_optimizer,
        "product_tower": {
            # TRAINABLE latent table: the reference's product tower detaches
            # its input (product_tower.py:47 — the table is meant to come
            # frozen from the offline compressor), which makes table grads
            # structurally ZERO in parity configs. These tests exercise the
            # trainable-table mode, where the sparse optimizer matters.
            "detach_item_tower": False,
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
    return TrainerPipelineConfig(
        model=model, model_version=f"fused_{table_optimizer}", checkpoint_dir=None,
        dataset={"filesystem_config": {"kind": "fake",
                                       "path_template": "clicks/date={date}"},
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


def _seed_fake_store():
    from recommendations_tpu.data.data_store import FakeDataStore
    from recommendations_tpu.tools.synth_data import make_click_log, _pad_lists

    HIST = 12
    FakeDataStore.reset()
    for p in range(2):
        df = _pad_lists(
            make_click_log(num_users=24, history_len=HIST, num_products=200,
                           seed=p),
            HIST,
        )
        FakeDataStore.put_table(f"clicks/date=20240101/part-{p}.parquet", df)


def _run_pipeline(cfg):
    from recommendations_tpu.data.generator import get_data_loader_strategy
    from recommendations_tpu.pipeline.trainer_pipeline import TrainerPipeline
    from recommendations_tpu.train.strategy import get_training_strategy

    builder = cfg.model.get_builder()
    dls = get_data_loader_strategy(
        cfg.data_loader, columns=cfg.model.features.get_input_columns(),
        data_mapper=cfg.model.preprocess_fn,
    )
    ts = get_training_strategy(cfg.training_strategy)
    pipe = TrainerPipeline(cfg, builder, ts, dls)
    metrics = pipe.execute()
    return pipe, metrics


def _table_leaf(params, lanes=None):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        if any(getattr(k, "key", None) == "product_emb_module" for k in path):
            return np.asarray(leaf)
    raise AssertionError("no table leaf found")


def test_lthm_fused_matches_lazy_end_to_end():
    """Same data, same seeds: the fused-record run's table slice matches the
    dense-grad lazy run's table after 4 real strategy steps — proving the
    tap cotangent + segment-sum path computes the same sparse updates as a
    dense table gradient."""
    _seed_fake_store()
    pipe_lazy, m_lazy = _run_pipeline(_tiny_pipeline_cfg("lazy_rowwise_adam"))
    _, state_lazy = pipe_lazy._trained

    _seed_fake_store()
    pipe_fused, m_fused = _run_pipeline(_tiny_pipeline_cfg("sparse_fused_adam"))
    _, state_fused = pipe_fused._trained

    assert m_fused["train_steps_total"] == 4
    assert np.isfinite(m_fused["train_loss"])
    np.testing.assert_allclose(
        m_fused["train_loss"], m_lazy["train_loss"], rtol=1e-4
    )

    table_lazy = _table_leaf(state_lazy.params)
    record = _table_leaf(state_fused.params)
    assert record.shape[1] == RECORD_LANES
    d = table_lazy.shape[1]
    # guard against a trivially-frozen pass (tables that never moved would
    # also "match"): both runs must have accumulated real first moments
    m_lazy = np.asarray(state_lazy.table_state.m)
    assert np.abs(m_lazy).sum() > 0
    assert np.abs(record[:, d : 2 * d]).sum() > 0
    # both paths share the grad!=0 row filter (no spurious decay on
    # masked/padding rows), so the whole table and moments must agree
    np.testing.assert_allclose(
        record[:, :d], table_lazy, rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        record[:, d : 2 * d], m_lazy, rtol=2e-4, atol=2e-5
    )
    assert int(state_fused.table_state.count) == 4


def test_fused_eval_path_no_taps():
    """Eval/inference never build taps: forward and catalog encoding work
    on a fused-record config and produce finite outputs."""
    _seed_fake_store()
    pipe, _ = _run_pipeline(_tiny_pipeline_cfg("sparse_fused_adam"))
    wrapper, state = pipe._trained
    variables = {"params": jax.device_get(state.params)}
    if state.constants:
        variables["constants"] = jax.device_get(state.constants)

    from recommendations_tpu.pipeline.knn_eval import encode_catalog

    ids = np.asarray([3, 5, 7, 11, 13, 17, 19, 23], np.int64)
    embs = encode_catalog(wrapper, variables, ids)
    assert np.isfinite(np.asarray(embs)).all()
    assert np.abs(np.asarray(embs)).sum() > 0
