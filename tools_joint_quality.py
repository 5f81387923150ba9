"""BASELINE rung 4 — joint retrieval→ranking quality run, recorded for real.

Trains LTHM on the synthetic clustered click log, measures KNN recall@k,
encodes user embeddings, builds an impression log whose click probability
depends on the user's latent taste cluster (recoverable ONLY from history),
then trains the ranker twice — with the LTHM user embedding and with it
ablated to zeros — and reports the AUC uplift plus joint throughput.

The ablation isolates exactly what the joint pipeline adds: the ranker has
no user-identity feature, so any AUC above the product-only baseline must
come through the user embedding.

Usage: python tools_joint_quality.py [--steps 400]
Writes /tmp/joint_quality/result.json and appends a summary to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

import numpy as np
import pandas as pd


def _user_clusters(num_users: int, num_products: int, num_clusters: int,
                   structure_seed: int = 777):
    """Reconstruct each synthetic user's taste cluster from the click-log
    generator's fixed structure (tools/synth_data.py)."""
    struct = np.random.RandomState(structure_seed)
    cluster_of_product = struct.randint(0, num_clusters, size=num_products)
    return cluster_of_product


def make_cluster_ranking_log(click_df: pd.DataFrame, num_products: int,
                             num_clusters: int, num_rows: int, seed: int = 0):
    """Impressions whose click depends on user-cluster ↔ product-cluster
    match. The user's cluster is the majority cluster of their history —
    information only the history (hence the LTHM embedding) carries."""
    cluster_of_product = _user_clusters(0, num_products, num_clusters)
    struct = np.random.RandomState(778)
    quality = struct.randn(num_products) * 0.8

    user_cluster = {}
    for _, row in click_df.iterrows():
        pids = [int(p.split("_")[1]) for p in row["product_ids"]]
        cl = np.bincount(cluster_of_product[pids], minlength=num_clusters)
        user_cluster[row["customer_id"]] = int(cl.argmax())

    users = list(user_cluster)
    rng = np.random.RandomState(seed)
    u_idx = rng.randint(0, len(users), num_rows)
    p_idx = rng.randint(0, num_products, num_rows)
    match = np.array(
        [user_cluster[users[u]] == cluster_of_product[p]
         for u, p in zip(u_idx, p_idx)]
    )
    price = np.abs(rng.randn(num_rows) * 40 + 30).astype(np.float32)
    logits = quality[p_idx] + 2.5 * match - 0.004 * price - 1.2
    click = (rng.rand(num_rows) < 1 / (1 + np.exp(-logits))).astype(np.float32)
    return pd.DataFrame({
        "product_id": [f"sku_{p}" for p in p_idx],
        "customer_id": [users[u] for u in u_idx],
        "price": price,
        "click": click,
    })


def _auc(scores: np.ndarray, labels: np.ndarray) -> float:
    order = np.argsort(scores)
    ranks = np.empty(len(scores)); ranks[order] = np.arange(1, len(scores) + 1)
    pos = labels > 0.5
    n_pos, n_neg = pos.sum(), (~pos).sum()
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--hist", type=int, default=64)
    ap.add_argument("--products", type=int, default=2000)
    ap.add_argument("--clusters", type=int, default=16)
    args = ap.parse_args()

    import recommendations_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from recommendations_tpu.config.yaml_loader import load_config
    from recommendations_tpu.tools.synth_data import write_synthetic_dataset, make_click_log, _pad_lists
    from main_training import execute_pipeline

    root = "/tmp/joint_quality"
    data_root = f"{root}/data"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(data_root, exist_ok=True)

    write_synthetic_dataset(
        data_root, dates=["20240101", "20240102"], files_per_date=4,
        users_per_file=512, history_len=args.hist, num_products=args.products,
    )

    # --- 1. train LTHM on the real pipeline, with KNN eval on -------------
    cfg = load_config(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs", "lthm_tiny.yaml"),
        overrides={
            "dataset": {
                "filesystem_config": {"kind": "local", "local_dir_prefix": data_root,
                                       "path_template": "date={date}"},
            },
            "checkpoint_dir": None,
            "train": {"train_steps": args.steps, "epochs": 50,
                       "train_metrics_every_n_steps": 100,
                       "checkpoint_every_k_steps": 0,
                       "validation_steps": 2},
            "eval": {"skip_eval": False, "skip_knn_eval": False,
                      "fail_on_eval_error": True, "max_eval_steps": 8,
                      "knn_top_k_list": [1, 5, 10, 20, 100]},
            "export": None,
            "trackers": {"trackers": []},
            "model": {"context_width": args.hist - 8,
                       "features": {"categorical_history_features": [{
                           "name": "product_ids", "kind": "categorical_history",
                           "tower_name": "other", "history_length": args.hist,
                           "history_id_feature_name": "product_id",
                           "value_to_number_mapper": {"kind": "xxhash"}}],
                           "tensor_list_features": [
                               {"name": n, "kind": "tensor_list", "tower_name": "other",
                                "shape": [args.hist]}
                               for n in ("labels", "timestamps")]}},
        },
    )
    t0 = time.time()
    pipe, metrics = execute_pipeline(cfg, return_pipeline=True)
    t_train = time.time() - t0
    wrapper, state = pipe._trained
    variables = {"params": jax.device_get(state.params)}
    if state.constants:
        variables["constants"] = jax.device_get(state.constants)
    eval_result = pipe.eval_model()
    knn = eval_result.knn_eval_result if eval_result is not None else None
    print("knn recall:\n", knn)

    # --- 2. user embeddings + cluster-signal impressions ------------------
    from recommendations_tpu.tools.joint_pipeline import run_joint
    from tests.test_joint_pipeline import _joint_ranker_config  # reuse schema

    click_df = make_click_log(num_users=768, history_len=args.hist,
                              num_products=args.products,
                              num_clusters=args.clusters, seed=99)
    imp = make_cluster_ranking_log(click_df, args.products, args.clusters,
                                   num_rows=65536, seed=3)

    padded = _pad_lists(click_df, args.hist)
    fc = cfg.model.features
    raw_ids = padded["customer_id"].to_numpy()  # BEFORE the mapper hashes it
    mapped = fc.default_data_mapper(padded)
    from recommendations_tpu.data.grouping import make_features_compliant
    user_batches = []
    bs = 64
    for s in range(0, len(mapped), bs):
        sl = mapped.iloc[s : s + bs]
        if len(sl) < bs:
            break
        b = make_features_compliant(dict(sl), fc)
        # the tiny config hashes customer_id (categorical feature); the join
        # needs the RAW id, and the model never consumes this column
        b["customer_id"] = np.asarray(raw_ids[s : s + bs], dtype=object)
        user_batches.append(b)

    emb_dim = wrapper.config.product_tower.product_emb_dim
    rcfg = _joint_ranker_config(emb_dim)

    # diagnostic: the encode->join must actually land nonzero embeddings
    from recommendations_tpu.tools.joint_pipeline import (
        attach_user_embeddings, encode_users,
    )
    _table = encode_users(wrapper, variables, user_batches)
    _enr = attach_user_embeddings(imp, _table, emb_dim)
    _nz = float(np.mean([np.abs(v).sum() > 0 for v in _enr["user_emb"]]))
    print(f"encoded users={len(_table)} nonzero-emb fraction={_nz:.3f}")
    assert _nz > 0.9, "user-embedding join failed; aborting quality run"

    # diagnostic: is the taste cluster linearly recoverable from user_emb?
    # (nearest-centroid accuracy; chance = 1/num_clusters)
    cop = _user_clusters(0, args.products, args.clusters)
    ucl = {}
    for _, row in click_df.iterrows():
        pids = [int(p.split("_")[1]) for p in row["product_ids"]]
        ucl[row["customer_id"]] = int(
            np.bincount(cop[pids], minlength=args.clusters).argmax()
        )
    users = [u for u in _table if u in ucl]
    E = np.stack([_table[u] for u in users])
    y = np.array([ucl[u] for u in users])
    cents = np.stack([
        E[y == c].mean(axis=0) if (y == c).any() else np.zeros(E.shape[1])
        for c in range(args.clusters)
    ])
    pred = (E @ cents.T).argmax(axis=1)
    cluster_acc = float((pred == y).mean())
    print(f"user_emb nearest-centroid cluster accuracy: {cluster_acc:.3f} "
          f"(chance {1/args.clusters:.3f})")

    # held-out impressions: uplift must be measured OUT of sample (train-
    # batch AUC rewards memorization and inverted the comparison)
    imp_eval = make_cluster_ranking_log(click_df, args.products, args.clusters,
                                        num_rows=16384, seed=77)

    def heldout_auc(rw, rparams, table):
        from recommendations_tpu.tools.joint_pipeline import attach_user_embeddings
        from recommendations_tpu.data.grouping import make_features_compliant

        enr = attach_user_embeddings(imp_eval, table, emb_dim)
        mapped_e = rcfg.features.default_data_mapper(enr)
        host = make_features_compliant(dict(mapped_e), rcfg.features)
        dev = {k: jnp.asarray(v) for k, v in host.items()
               if getattr(v, "dtype", None) is not None and v.dtype.kind in "ifub"}
        out = rw.forward({"params": rparams}, dev)
        scores = np.asarray(out["click"], np.float32).reshape(-1)
        return _auc(scores, np.asarray(imp_eval["click"], np.float32))

    t0 = time.time()
    rw_with, rparams, m_with = run_joint(
        wrapper, variables, user_batches, imp, rcfg,
        train_steps=1200, batch_size=256, seed=0,
    )
    t_joint = time.time() - t0
    joint_ex_s = 1200 * 256 / t_joint
    auc_with = heldout_auc(rw_with, rparams, _table)

    # ablation: identical run with the user embedding zeroed at the join
    import recommendations_tpu.tools.joint_pipeline as jp
    orig_attach = jp.attach_user_embeddings

    def zero_attach(impressions, table, dim):
        out = orig_attach(impressions, table, dim)
        out["user_emb"] = [np.zeros(dim, np.float32)] * len(out)
        return out

    jp.attach_user_embeddings = zero_attach
    try:
        rw_wo, rparams_wo, m_without = run_joint(
            wrapper, variables, user_batches, imp, rcfg,
            train_steps=1200, batch_size=256, seed=0,
        )
        auc_without = heldout_auc(rw_wo, rparams_wo, {})  # zero embeddings
    finally:
        jp.attach_user_embeddings = orig_attach

    result = {
        "lthm_train_steps": args.steps,
        "lthm_train_wall_s": round(t_train, 1),
        "knn_recall": (
            {f"recall@{int(r.k)}": float(r.recall) for r in knn.itertuples()}
            if knn is not None else None
        ),
        "ranker_heldout_auc_with_user_emb": round(auc_with, 4),
        "ranker_heldout_auc_without_user_emb": round(auc_without, 4),
        "auc_uplift": round(auc_with - auc_without, 4),
        "ranker_trainbatch_auc_with": m_with.get("train_auc_click"),
        "ranker_trainbatch_auc_without": m_without.get("train_auc_click"),
        "joint_examples_per_sec": round(joint_ex_s, 1),
        "user_emb_cluster_centroid_acc": round(cluster_acc, 4),
    }
    with open(f"{root}/result.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
