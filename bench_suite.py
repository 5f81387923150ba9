"""Bench breadth across the BASELINE.md config ladder (VERDICT r1 item 7).

``bench.py`` stays the driver's single-line headline (LTHM-base step bench);
this sibling records the other ladder rungs, one JSON line each, and writes
them all to ``BENCH_SUITE.json``:

- ``ranker``      — BASELINE config 2: FDLRM at the prod shape
  (configs/model/ranker.yaml: QR 1M embeddings, 2 tasks), synthetic batch.
- ``lthm_10m``    — BASELINE config 3 at its REAL table size: 10M-row
  KShift table (bench.py uses 1M).
- ``lthm_seq1024``— BASELINE config 5's sequence length on one chip:
  6-layer d=512 MQA-32 at seq 1024 with the fused flash kernel.
- ``loader_e2e``  — end-to-end examples/s INCLUDING the host data pipeline
  (parquet → pandas → feature transforms → device), via the real
  TrainerPipeline on a bench-scaled lthm_train.yaml.

Usage: python bench_suite.py [ranker|lthm_10m|lthm_seq1024|lthm_prod|loader_e2e|all]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


# ---------------------------------------------------------------- helpers


def _train_step_fn(wrapper, optimizer):
    import jax
    import optax

    from recommendations_tpu.train.train_state import TrainState

    # Honest-step requirement (round-4 fix): with lazy/sparse table
    # optimizers the table leaf's optax update is set_to_zero and the REAL
    # update happens via the wrapper hooks — a step that skips them trains
    # with a FROZEN embedding table and reports fiction (rounds 2-3's
    # lthm_10m/seq1024/prod rungs did exactly that; re-measured in r4).
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
        return (
            TrainState(
                params=new_params, constants=state.constants, opt_state=new_opt,
                aux=new_aux, step=state.step + 1, rng=rng,
                table_state=new_table_state,
            ),
            loss,
        )

    return train_step


_LAST_COMPILE_WALL_S: list = [0.0]


def _timed_steps(train_step, state, dbatch, steps):
    """Steps/sec with a device_get execution barrier (see bench.py: the only
    reliable barrier on tunneled runtimes).

    The warmup (compile) wall time is recorded in ``_LAST_COMPILE_WALL_S``
    and lands in every rung's JSON as ``compile_wall_s`` (VERDICT r4 #2:
    cold-compile cost is part of the honest record — sparse_fused_adam's
    10M-shape compile dwarfs short runs)."""
    import jax
    import jax.numpy as jnp

    checksum = jax.jit(
        lambda s: jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x)).astype(jnp.float32),
            s.params, jnp.asarray(0.0, jnp.float32),
        )
    )
    t_c = time.time()
    state, _ = train_step(state, dbatch)  # warmup/compile
    float(checksum(state))
    _LAST_COMPILE_WALL_S[0] = round(time.time() - t_c, 1)
    t0 = time.time()
    for _ in range(steps):
        state, _ = train_step(state, dbatch)
    float(checksum(state))
    return time.time() - t0


def _make_state(wrapper, example, train_cfg=None):
    import jax

    from recommendations_tpu.config.trainer_config import ModelTrainConfig
    from recommendations_tpu.train.optimizers import build_optimizer
    from recommendations_tpu.train.train_state import TrainState

    variables = wrapper.init_variables(jax.random.PRNGKey(0), example)
    params = variables.get("params", {})
    constants = variables.get("constants", {})
    optimizer = build_optimizer(wrapper, train_cfg or ModelTrainConfig(), params)
    table_state = (
        wrapper.init_table_state(params)
        if hasattr(wrapper, "init_table_state") else None
    )
    state = TrainState.create(
        params, constants, optimizer.init(params), wrapper.init_aux_state(),
        jax.random.PRNGKey(1), table_state=table_state,
    )
    return state, optimizer


def _lthm_wrapper(batch, seq, layers, d, vocab, flash, pos_bias=False,
                  table_optimizer="frozen", trainable_table=False):
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
            rotator_config={"ff_mult": 4},
            is_causal=True,
            num_layers=layers,
            enable_gradient_checkpointing=False,
            use_flash_attention=flash,
            attn_config=SelfAttentionConfig(
                n_head=max(4, d // 16), n_embd=d, attn_type="multi_query",
                dropout=0.0, attn_dropout=0.0, bias=False,
                pos_bias={"context_window": seq + 1} if pos_bias else None,
            ),
        ),
        product_tower=ProductTowerConfig(
            # trainable_table=False keeps reference parity: the reference's
            # product tower detaches its embedding input
            # (product_tower.py:47), making table grads structurally zero —
            # so the honest parity table_optimizer is 'frozen' (rounds 2-3
            # paid dense/lazy optimizer passes that updated nothing).
            # trainable_table=True is the framework's trainable-table mode
            # (detach off + sparse_fused_adam fused-record updates).
            detach_item_tower=not trainable_table,
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
        table_optimizer=table_optimizer,
    )
    return LTHMModelWrapper(cfg)


def _lthm_host_batch(batch, seq, seed=0):
    rs = np.random.RandomState(seed)
    ids = rs.randint(-(2**62), 2**62, size=(batch, seq + 8)).astype(np.int64)
    ids[:, -4:] = 0
    return {
        "product_ids": ids,
        "labels": rs.randint(0, 4, size=ids.shape).astype(np.float32),
        "timestamps": rs.randint(
            1_600_000_000, 1_700_000_000, size=ids.shape
        ).astype(np.float32),
    }


def _device_batch(host_batch, mesh):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    return {
        k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, PartitionSpec("data")))
        for k, v in host_batch.items()
    }


def _lthm_step_bench(batch, seq, layers, d, vocab, flash, steps, pos_bias=False,
                     table_optimizer="frozen", trainable_table=False):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from recommendations_tpu.core.mesh import MeshConfig, build_mesh

    wrapper = _lthm_wrapper(batch, seq, layers, d, vocab, flash, pos_bias,
                            table_optimizer=table_optimizer,
                            trainable_table=trainable_table)
    host_batch = _lthm_host_batch(batch, seq)
    mesh = build_mesh(MeshConfig(data=-1))
    example = {k: np.asarray(v) for k, v in host_batch.items()}
    state, optimizer = _make_state(wrapper, example)
    # donate the placement copy: a plain device_put holds two live copies
    # of the (V, 128) fused record (5 GB at V=10M) — over the tunneled
    # v5e's single-op working-set budget
    state = jax.jit(
        lambda st: st,
        out_shardings=NamedSharding(mesh, PartitionSpec()),
        donate_argnums=0,
    )(state)
    dbatch = _device_batch(host_batch, mesh)
    train_step = _train_step_fn(wrapper, optimizer)
    elapsed = _timed_steps(train_step, state, dbatch, steps)
    return steps * batch / elapsed / len(jax.devices())


# ---------------------------------------------------------------- benches


def bench_lthm_10m(on_tpu):
    # Round 4: this is now the TRAINABLE-table rung — detach off +
    # sparse_fused_adam, i.e. the 10M-row table actually receives and
    # applies gradients every step (fully sparse fused-record updates).
    # Rounds 2-3 recorded this rung with the table silently frozen
    # (bench-step bug) AND with reference-parity detach making table grads
    # structurally zero — both fictions; numbers are not comparable.
    b, s, layers, d, vocab = (64, 256, 6, 512, 10_000_000) if on_tpu else (
        8, 32, 2, 64, 100_000
    )
    v = _lthm_step_bench(b, s, layers, d, vocab, flash=on_tpu,
                         steps=20 if on_tpu else 3,
                         table_optimizer="sparse_fused_adam",
                         trainable_table=True)
    return {
        "metric": "lthm_10m_train_examples_per_sec_per_chip",
        "value": round(v, 2), "unit": "examples/s/chip",
    }


def bench_lthm_seq1024(on_tpu):
    # WITH the learned rel-pos bias, like every reference config: above the
    # seq-768 crossover the fused kernel applies it in-kernel — the config
    # XLA pos-bias attention prices out of (QUALITY.md round 3)
    b, s, layers, d, vocab = (16, 1024, 6, 512, 1_000_000) if on_tpu else (
        8, 128, 2, 64, 50_000
    )
    v = _lthm_step_bench(b, s, layers, d, vocab, flash=on_tpu,
                         steps=20 if on_tpu else 3, pos_bias=on_tpu)
    return {
        "metric": "lthm_seq1024_train_examples_per_sec_per_chip",
        "value": round(v, 2), "unit": "examples/s/chip",
    }


def bench_lthm_prod(on_tpu):
    """The UNMODIFIED prod scale point (configs/lthm_train.yaml + model/lthm.yaml):
    16 layers, d=512, MQA-32, history 768 -> context 512 (+CLS), learned
    rel-pos bias (window 513) on the fused flash kernel, 10M-row KShift,
    logQ 2^24, remat dots_no_batch, batch 64 — device-resident examples/s
    (VERDICT r2 #1's 'record an lthm_prod rung')."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from recommendations_tpu.config.yaml_loader import load_config
    from recommendations_tpu.core.mesh import MeshConfig, build_mesh

    overrides = {"checkpoint_dir": None, "trackers": {"trackers": []}}
    if not on_tpu:
        overrides["model"] = {
            "context_width": 16,
            "transformer_config": {"num_layers": 2,
                                   "attn_config": {"pos_bias": {"context_window": 17}}},
            "product_tower": {"latent_model_config": {"vocab_size_latent": 100_000}},
            "log_q_config": {"num_buckets": 1024, "hash_offsets": [0, 7]},
            "train_mini_batch_size": 8,
        }
        overrides["train"] = {"batch_size": 8}
    cfg = load_config(
        os.path.join(REPO, "configs", "lthm_train.yaml"), overrides=overrides
    )
    wrapper = cfg.model.get_builder(None).build()
    batch = cfg.train.batch_size
    hist = 768 if on_tpu else 24
    host_batch = _lthm_host_batch(batch, hist - 8)
    mesh = build_mesh(MeshConfig(data=-1))
    example = {k: np.asarray(v) for k, v in host_batch.items()}
    state, optimizer = _make_state(wrapper, example, cfg.train)
    state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))
    dbatch = _device_batch(host_batch, mesh)
    train_step = _train_step_fn(wrapper, optimizer)
    steps = 20 if on_tpu else 2
    elapsed = _timed_steps(train_step, state, dbatch, steps)
    v = steps * batch / elapsed / len(jax.devices())
    return {
        "metric": "lthm_prod_train_examples_per_sec_per_chip",
        "value": round(v, 2), "unit": "examples/s/chip",
    }


def bench_ranker(on_tpu):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from recommendations_tpu.core.mesh import MeshConfig, build_mesh
    from recommendations_tpu.config.yaml_loader import compose_config
    from recommendations_tpu.models.ranker.config import RankerModelConfig
    from recommendations_tpu.models.ranker.wrapper import RankerModelWrapper
    from recommendations_tpu.features.hashing import (
        hash_feature_name_to_int,
        hash_string_to_long,
    )

    raw = compose_config(
        os.path.join(REPO, "configs", "model", "ranker.yaml"),
        search_paths=[os.path.join(REPO, "configs")],
    )
    raw.pop("kind", None), raw.pop("type", None)
    if not on_tpu:
        raw["num_embeddings_default"] = 10_007
    cfg = RankerModelConfig(**{k: v for k, v in raw.items() if k in RankerModelConfig.model_fields})
    wrapper = RankerModelWrapper(cfg)

    batch = 8192 if on_tpu else 256
    rs = np.random.RandomState(0)
    host_batch = {}
    for c in ("product_id", "customer_id", "search_query"):
        seed = hash_feature_name_to_int(c)
        vals = [f"{c}_{i}" for i in rs.randint(0, 100_000, size=batch)]
        host_batch[c] = np.array(
            [hash_string_to_long(v, seed, False) for v in vals], dtype=np.int64
        )
    for c in ("price", "position", "is_returning_user", "click", "conversion"):
        host_batch[c] = rs.rand(batch).astype(np.float32)
    host_batch["click"] = (host_batch["price"] > 0.5).astype(np.float32)
    host_batch["conversion"] = (host_batch["position"] > 0.7).astype(np.float32)
    host_batch["event_ts"] = rs.randint(
        1_600_000_000, 1_700_000_000, size=batch
    ).astype(np.int64)

    mesh = build_mesh(MeshConfig(data=-1))
    state, optimizer = _make_state(wrapper, host_batch)
    state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))
    dbatch = _device_batch(host_batch, mesh)
    train_step = _train_step_fn(wrapper, optimizer)

    # The ranker step is ~1.4 ms — smaller than the tunnel's per-dispatch
    # jitter, so a python-loop window measures the TUNNEL, not the chip
    # (recorded spread across identical code: 2.3M r3/r4 vs 5.7M r5).
    # Scan K steps inside ONE program: a single dispatch + one fetch, pure
    # device rate. The python-loop number is kept alongside as
    # value_dispatch_loop for continuity with r2-r4.
    steps = 500 if on_tpu else 3
    elapsed_loop = _timed_steps(train_step, state, dbatch, steps)
    v_loop = steps * batch / elapsed_loop / len(jax.devices())

    import jax.numpy as jnp

    K = 500 if on_tpu else 3

    def _scan_rate():
        import optax
        from recommendations_tpu.train.train_state import TrainState

        use_taps = getattr(wrapper, "uses_sparse_taps", lambda: False)()

        def one(s, b):
            rng, sub = jax.random.split(s.rng)
            if use_taps:
                taps0 = wrapper.make_taps(b)

                def lf(p, taps):
                    return wrapper.loss_and_metrics(
                        p, s.constants, s.aux, b, sub, True, taps=taps)

                (loss, (m, na)), (gr, tg) = jax.value_and_grad(
                    lf, argnums=(0, 1), has_aux=True)(s.params, taps0)
            else:
                def lf(p):
                    return wrapper.loss_and_metrics(
                        p, s.constants, s.aux, b, sub, True)

                (loss, (m, na)), gr = jax.value_and_grad(
                    lf, has_aux=True)(s.params)
                tg = None
            up, no = optimizer.update(gr, s.opt_state, s.params)
            np_ = optax.apply_updates(s.params, up)
            nts = s.table_state
            if s.table_state is not None:
                if use_taps:
                    np_, nts, _ = wrapper.apply_sparse_table_update(
                        np_, tg, s.table_state, b)
                else:
                    np_, nts = wrapper.apply_lazy_table_update(
                        np_, gr, s.table_state, b)
            return TrainState(params=np_, constants=s.constants,
                              opt_state=no, aux=na, step=s.step + 1,
                              rng=rng, table_state=nts), loss

        @partial(jax.jit, donate_argnums=(0,))
        def scan_k(s, b):
            s, losses = jax.lax.scan(lambda ss, _: one(ss, b), s,
                                     jnp.arange(K))
            return s, losses[-1]

        # fresh state: the dispatch-loop bench above donated the first one
        s0, _ = _make_state(wrapper, host_batch)
        s0 = jax.device_put(s0, NamedSharding(mesh, PartitionSpec()))
        s2, _ = scan_k(s0, dbatch)  # compile + warm
        float(jnp.sum(jnp.abs(s2.step).astype(jnp.float32)))
        t0 = time.time()
        s2, loss = scan_k(s2, dbatch)
        float(loss)
        return K * batch / (time.time() - t0) / len(jax.devices())

    v_scan = _scan_rate()
    return {
        "metric": "ranker_train_examples_per_sec_per_chip",
        "value": round(v_scan, 2), "unit": "examples/s/chip",
        "value_dispatch_loop": round(v_loop, 2),
    }


def bench_loader_e2e(on_tpu):
    """True end-to-end rate: parquet → pandas transforms → grouped batches →
    device → jit step, through the real TrainerPipeline (SURVEY §7 hard part
    6: 'pandas-per-file transforms won't feed a pod' — measure it)."""
    from recommendations_tpu.tools.synth_data import write_synthetic_dataset
    from recommendations_tpu.config.yaml_loader import load_config
    from main_training import execute_pipeline

    data_root = "/tmp/bench_loader/data"
    out_root = "/tmp/bench_loader/out"
    for d in (data_root, out_root):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)

    import jax

    # the strategy's samples/s clock starts at the FIRST train step, which
    # includes the jit compile (~90s on the tunnel — it swamped a 40-step
    # window at 3x).  Persist compiles and run the pipeline twice: the warm
    # run's number is the real loader-included rate.
    jax.config.update("jax_compilation_cache_dir", "/tmp/bench_loader/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    steps = 384 if on_tpu else 4
    hist = 264 if on_tpu else 40
    write_synthetic_dataset(
        data_root,
        dates=["20240101"],
        files_per_date=8 if on_tpu else 2,
        users_per_file=1280 if on_tpu else 64,
        history_len=hist,
        num_products=20_000,
    )
    overrides = {
        "dataset": {
            "path_glob_train": f"{data_root}/date=20240101/*.parquet",
            "path_glob_test": f"{data_root}/date=20240101/part-00000.parquet",
        },
        "checkpoint_dir": None,
        "train": {
            "train_steps": steps,
            "checkpoint_every_k_steps": 0,
            "train_metrics_every_n_steps": steps,
            "val_metrics_every_n_steps": 0,
            "validation_steps": 0,
            # multi-step dispatch: the r5 feed-path timers showed the device
            # idle ~45% of e2e wall on host-side per-dispatch residue; 8
            # steps per jit call amortizes it (tests/test_multi_dispatch.py
            # pins exact k=1 parity)
            "steps_per_dispatch": 64 if on_tpu else 1,
        },
        # process_reader: the host pipeline forks its own process — on this
        # 2-vCPU box the pandas transforms GIL-inflate 5.8 -> 21.8 ms/batch
        # against the dispatch thread (r5 feed_path_stages measurement)
        "data_loader": {"bypass_dataloader": False, "max_readers": 8,
                        "max_prefetch": 24, "process_reader": on_tpu},
        "export": {"filesystem_config": {"local_dir_prefix": f"{out_root}/export"}},
        "trackers": {"trackers": []},
        "model": {
            # bench scale: 6-layer LTHM-base (BASELINE config 3) shape so the
            # number is comparable to bench.py's device-resident step bench
            "context_width": 256 if on_tpu else 16,
            "transformer_config": {"num_layers": 6 if on_tpu else 1},
            "product_tower": {
                "latent_model_config": {"vocab_size_latent": 1_000_000 if on_tpu else 10_000},
            },
            "log_q_config": {"num_buckets": 2**22 if on_tpu else 1024,
                             "hash_offsets": [0, 34144, 7465477]},
            # history features sized to the synthetic log (feature transforms
            # compile at validation — lists must be replaced, not mutated)
            "features": {
                "categorical_history_features": [
                    {
                        "name": "product_ids", "kind": "categorical_history",
                        "tower_name": "other", "history_length": hist,
                        "history_id_feature_name": "product_id",
                        "value_to_number_mapper": {"kind": "xxhash"},
                    }
                ],
                "tensor_list_features": [
                    {"name": n, "kind": "tensor_list", "tower_name": "other",
                     "shape": [hist],
                     "source": {"kind": "input", "dtype": "tensor_list"}}
                    for n in ("labels", "timestamps")
                ],
            },
        },
    }
    cfg = load_config(
        os.path.join(REPO, "configs", "lthm_train.yaml"),
        overrides=overrides,
        search_paths=[os.path.join(REPO, "configs")],
    )
    execute_pipeline(cfg)  # cold run: populates the compilation cache
    metrics = execute_pipeline(cfg)  # warm run: compile-free rate
    v = float(metrics["train_samples_per_sec"])

    return {
        "metric": "lthm_loader_e2e_examples_per_sec_per_chip",
        "value": round(v / len(jax.devices()), 2), "unit": "examples/s/chip",
    }


BENCHES = {
    "ranker": bench_ranker,
    "lthm_10m": bench_lthm_10m,
    "lthm_seq1024": bench_lthm_seq1024,
    "lthm_prod": bench_lthm_prod,
    "loader_e2e": bench_loader_e2e,
}


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(BENCHES) if which == "all" else [which]

    import recommendations_tpu  # noqa: F401
    import jax

    on_tpu = jax.devices()[0].platform != "cpu"
    results = []
    for name in names:
        _LAST_COMPILE_WALL_S[0] = 0.0
        t0 = time.time()
        row = BENCHES[name](on_tpu)
        row["bench_wall_s"] = round(time.time() - t0, 1)
        if _LAST_COMPILE_WALL_S[0]:
            # warmup-step wall time = executable load + XLA compile (or
            # persistent-cache hit); the honest cold-start cost per rung
            row["compile_wall_s"] = _LAST_COMPILE_WALL_S[0]
        results.append(row)
        print(json.dumps(row), flush=True)

    out_path = os.path.join(REPO, "BENCH_SUITE.json")
    existing = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                existing = {r["metric"]: r for r in json.load(f)}
        except Exception:
            existing = {}
    for r in results:
        existing[r["metric"]] = r
    with open(out_path, "w") as f:
        json.dump(list(existing.values()), f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
