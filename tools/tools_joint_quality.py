"""BASELINE rung 4 — joint retrieval→ranking quality run, recorded for real.

Trains LTHM on the synthetic clustered click log, measures KNN recall@k,
encodes user embeddings, builds an impression log whose click probability
depends on the user's latent taste cluster (recoverable ONLY from history),
then trains the ranker twice — with the LTHM user embedding and with it
ablated to zeros — and reports the held-out AUC uplift plus joint
throughput.

The ablation isolates exactly what the joint pipeline adds: the ranker has
no user-identity feature, so any AUC above the product-only baseline must
come through the user embedding. Two held-out splits are scored:

- ``heldout users``  (primary): impressions over users NEVER seen by the
  ranker during training — uplift here proves the ranker learned a general
  user_emb x product interaction, not per-vector memorization;
- ``train users``    (secondary): fresh impressions over training users.

Round-3 postmortem (VERDICT r3 missing #1): the earlier harness could not
resolve the question — BOTH arms sat at ~0.53 AUC because (a) raw numeric
features (price 0..200) blew up the tower activations at init (BCE 13.8)
so the ranker never learned even the per-product quality term, (b) QR
embeddings halved effective capacity (flat: 0.64 vs QR: 0.59 on the same
log), and (c) 65K impressions give only ~33 obs/product — the quality
estimate itself was noise-bound. All three are fixed here (signed-log
numeric scaling lives in the model, ``models/ranker/model.py``).

Reference intent being demonstrated: ``models/ranker/config.py:24-57``
(feature->tower routing) consuming the LTHM encoder's user vector.

Usage: python tools_joint_quality.py [--lthm-steps 800] [--ranker-steps 3000]
Writes /tmp/joint_quality/result.json and prints a summary.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import argparse
import json
import os
import shutil
import time

import numpy as np
import pandas as pd


def _product_clusters(num_products: int, num_clusters: int,
                      structure_seed: int = 777):
    """The synthetic catalog's fixed product->cluster map
    (tools/synth_data.py uses the same structure_seed)."""
    struct = np.random.RandomState(structure_seed)
    return struct.randint(0, num_clusters, size=num_products)


def _user_cluster_map(click_df: pd.DataFrame, num_products: int,
                      num_clusters: int):
    """user -> majority cluster of their history (the latent taste label;
    histories are ~97% in-cluster so this recovers the generator's draw)."""
    cop = _product_clusters(num_products, num_clusters)
    out = {}
    for _, row in click_df.iterrows():
        pids = [int(p.split("_")[1]) for p in row["product_ids"]]
        out[row["customer_id"]] = int(
            np.bincount(cop[pids], minlength=num_clusters).argmax()
        )
    return out


def make_cluster_ranking_log(user_cluster: dict, users: list,
                             num_products: int, num_clusters: int,
                             num_rows: int, seed: int = 0,
                             match_coef: float = 4.0):
    """Impressions whose click depends on user-cluster == product-cluster.
    The user's cluster is carried ONLY by their history (hence the LTHM
    embedding); product quality and price are learnable without it."""
    cop = _product_clusters(num_products, num_clusters)
    struct = np.random.RandomState(778)
    quality = struct.randn(num_products) * 0.8

    rng = np.random.RandomState(seed)
    u_idx = rng.randint(0, len(users), num_rows)
    p_idx = rng.randint(0, num_products, num_rows)
    u_cl = np.array([user_cluster[users[u]] for u in u_idx])
    match = (u_cl == cop[p_idx]).astype(np.float32)
    price = np.abs(rng.randn(num_rows) * 40 + 30).astype(np.float32)
    logits = quality[p_idx] + match_coef * match - 0.004 * price - 1.8
    click = (rng.rand(num_rows) < 1 / (1 + np.exp(-logits))).astype(np.float32)
    df = pd.DataFrame({
        "product_id": [f"sku_{p}" for p in p_idx],
        "customer_id": [users[u] for u in u_idx],
        "price": price,
        "click": click,
    })
    # Bayes references for calibration (what a perfect model could score);
    # returned separately — arrays in DataFrame.attrs break pandas concat
    # (attrs equality comparison on ndarrays)
    refs = {
        "true_logit": logits,
        "product_only_logit": quality[p_idx] - 0.004 * price,
    }
    return df, refs


def _auc(scores: np.ndarray, labels: np.ndarray) -> float:
    order = np.argsort(scores)
    ranks = np.empty(len(scores)); ranks[order] = np.arange(1, len(scores) + 1)
    pos = labels > 0.5
    n_pos, n_neg = pos.sum(), (~pos).sum()
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def _ranker_config(emb_dim: int):
    """Harness ranker: flat embeddings (QR measured -0.05 AUC at this
    vocab), click routed 'other' (label only, never a tower input)."""
    from recommendations_tpu.models.ranker.config import RankerModelConfig

    return RankerModelConfig(
        emb_dim=16,
        tower_hidden=(64,),
        tower_dim=16,
        top_hidden=(64,),
        num_embeddings_default=10007,
        use_qr_embeddings=False,
        lr=3e-3,
        tasks=[{"name": "click", "kind": "numerical", "num_labels": 1,
                "weight": 1.0}],
        features={
            "defaults": {
                "categorical_features": {
                    "default_dtype": "string",
                    "transform_value_to_lowercase": False,
                    "value_to_number_mapper": {"kind": "xxhash"},
                }
            },
            "categorical_features": [
                {"name": "product_id", "kind": "categorical",
                 "tower_name": "product"},
            ],
            "numerical_features": [
                {"name": "price", "kind": "numerical", "tower_name": "product"},
                {"name": "click", "kind": "numerical", "tower_name": "other"},
            ],
            "tensor_features": [
                {"name": "user_emb", "kind": "tensor", "emb_dim": emb_dim,
                 "tower_name": "user"},
                # the candidate product's embedding from the SAME retrieval
                # space (LTHM product tower): the pairwise interaction
                # dot(user_emb, item_emb) is then directly the retrieval
                # affinity — the joint design's actual inductive bias. A
                # from-scratch ranker product embedding would have to learn
                # the bilinear map into LTHM space before any uplift can
                # appear (measured: it never does within the step budget).
                {"name": "item_emb", "kind": "tensor", "emb_dim": emb_dim,
                 "tower_name": "product"},
            ],
        },
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lthm-steps", type=int, default=800)
    ap.add_argument("--ranker-steps", type=int, default=3000)
    ap.add_argument("--hist", type=int, default=64)
    ap.add_argument("--products", type=int, default=2000)
    ap.add_argument("--clusters", type=int, default=8)
    ap.add_argument("--train-rows", type=int, default=262144)
    ap.add_argument("--eval-rows", type=int, default=24576)
    args = ap.parse_args()

    import recommendations_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from recommendations_tpu.config.yaml_loader import load_config
    from recommendations_tpu.tools.synth_data import (
        write_synthetic_dataset, make_click_log, _pad_lists,
    )
    from main_training import execute_pipeline

    root = "/tmp/joint_quality"
    data_root = f"{root}/data"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(data_root, exist_ok=True)

    # in-cluster jump mixture: real click logs interleave a user's cluster
    # (co-occurrence clusters the retrieval embedding space); a pure ring
    # makes embeddings successor-specific — measured raw retrieval-dot AUC
    # 0.49 (chance) on ring data vs well above on the mixture
    jump = 0.35
    write_synthetic_dataset(
        data_root, dates=["20240101", "20240102"], files_per_date=4,
        users_per_file=512, history_len=args.hist, num_products=args.products,
        num_clusters=args.clusters, p_in_cluster_jump=jump,
        # the LTHM pretraining log shares the catalog structure (same
        # structure_seed) but different users than the impression users
    )

    # --- 1. train LTHM on the real pipeline, with KNN eval on -------------
    cfg = load_config(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs", "lthm_tiny.yaml"),
        overrides={
            "dataset": {
                "filesystem_config": {
                    "kind": "local", "local_dir_prefix": data_root,
                    "path_template": "date={date}"},
            },
            "checkpoint_dir": None,
            "train": {"train_steps": args.lthm_steps, "epochs": 100,
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
                              {"name": n, "kind": "tensor_list",
                               "tower_name": "other", "shape": [args.hist]}
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

    # --- 2. impression users: fresh click log, split train/heldout --------
    from recommendations_tpu.tools.joint_pipeline import (
        attach_user_embeddings, encode_users,
    )
    from recommendations_tpu.data.grouping import make_features_compliant

    click_df = make_click_log(num_users=1024, history_len=args.hist,
                              num_products=args.products,
                              num_clusters=args.clusters, seed=99,
                              p_in_cluster_jump=jump)
    user_cluster = _user_cluster_map(click_df, args.products, args.clusters)
    all_users = list(user_cluster)
    split_rs = np.random.RandomState(5)
    perm = split_rs.permutation(len(all_users))
    n_hold = len(all_users) // 5
    heldout_users = [all_users[i] for i in perm[:n_hold]]
    train_users = [all_users[i] for i in perm[n_hold:]]

    imp, _ = make_cluster_ranking_log(
        user_cluster, train_users, args.products, args.clusters,
        num_rows=args.train_rows, seed=3)
    imp_eval_hold, refs_hold = make_cluster_ranking_log(
        user_cluster, heldout_users, args.products, args.clusters,
        num_rows=args.eval_rows, seed=77)
    imp_eval_train, _ = make_cluster_ranking_log(
        user_cluster, train_users, args.products, args.clusters,
        num_rows=args.eval_rows, seed=78)

    y_hold = imp_eval_hold["click"].to_numpy().astype(np.float32)
    y_tr = imp_eval_train["click"].to_numpy().astype(np.float32)
    bayes_full = _auc(refs_hold["true_logit"], y_hold)
    bayes_prod = _auc(refs_hold["product_only_logit"], y_hold)
    print(f"calibration (heldout users): bayes-optimal AUC {bayes_full:.4f}, "
          f"product-only-optimal {bayes_prod:.4f}")

    # --- 3. encode ALL impression users through the trained LTHM ----------
    padded = _pad_lists(click_df, args.hist)
    fc = cfg.model.features
    raw_ids = padded["customer_id"].to_numpy()
    mapped_u = fc.default_data_mapper(padded)
    user_batches = []
    bs = 64
    for s in range(0, len(mapped_u), bs):
        sl = mapped_u.iloc[s : s + bs]
        if len(sl) < bs:
            break
        b = make_features_compliant(dict(sl), fc)
        b["customer_id"] = np.asarray(raw_ids[s : s + bs], dtype=object)
        user_batches.append(b)

    emb_dim = wrapper.config.product_tower.product_emb_dim
    table = encode_users(wrapper, variables, user_batches)
    enr = attach_user_embeddings(imp, table, emb_dim)
    coverage = float(np.mean([np.abs(v).sum() > 0 for v in enr["user_emb"]]))
    print(f"encoded users={len(table)} join coverage={coverage:.3f}")
    assert coverage > 0.9, "user-embedding join failed; aborting quality run"

    # candidate-side retrieval embeddings: every impression sku through the
    # LTHM product tower (same path the KNN eval uses), hashed with the
    # exact history-feature semantics
    from recommendations_tpu.features.hashing import (
        hash_feature_name_to_int, hash_strings_to_long,
    )
    from recommendations_tpu.pipeline.knn_eval import encode_catalog

    hfeat = cfg.model.features.categorical_history_features[0]
    seed_h = hash_feature_name_to_int(hfeat.history_id_feature_name)
    skus = sorted(
        set(imp["product_id"]) | set(imp_eval_hold["product_id"])
        | set(imp_eval_train["product_id"])
    )
    hashed = hash_strings_to_long([str(s) for s in skus], seed_h,
                                  value_to_lower=False)
    item_embs = encode_catalog(wrapper, variables,
                               np.asarray(hashed, np.int64))
    item_table = {s: np.asarray(item_embs[i], np.float32)
                  for i, s in enumerate(skus)}

    # no-training diagnostic: raw retrieval dot(user, item) on heldout users
    ue = np.stack([table.get(str(u), np.zeros(emb_dim, np.float32))
                   for u in imp_eval_hold["customer_id"]])
    ie = np.stack([item_table[s] for s in imp_eval_hold["product_id"]])
    dots = np.sum(ue * ie, axis=1)
    retrieval_dot_auc = _auc(dots, y_hold)
    print(f"raw retrieval-dot AUC (heldout users): {retrieval_dot_auc:.4f}")
    # does the raw dot see the MATCH variable itself (undiluted by
    # quality/price noise)? and does the PRODUCT embedding space cluster?
    cop_d = _product_clusters(args.products, args.clusters)
    u_cl_e = np.array([user_cluster[u] for u in imp_eval_hold["customer_id"]])
    p_cl_e = np.array([cop_d[int(s.split("_")[1])]
                       for s in imp_eval_hold["product_id"]])
    match_e = (u_cl_e == p_cl_e).astype(np.float32)
    dot_match_auc = _auc(dots, match_e)
    pe = np.stack([item_table[f"sku_{p}"] for p in range(args.products)
                   if f"sku_{p}" in item_table])
    pcl = np.array([cop_d[p] for p in range(args.products)
                    if f"sku_{p}" in item_table])
    pc = np.stack([pe[pcl == c].mean(0) if (pcl == c).any()
                   else np.zeros(pe.shape[1]) for c in range(args.clusters)])
    prod_centroid_acc = float(((pe @ pc.T).argmax(1) == pcl).mean())
    print(f"dot-vs-match AUC: {dot_match_auc:.4f}; product-emb centroid "
          f"acc: {prod_centroid_acc:.3f} (chance {1 / args.clusters:.3f})")

    # diagnostic: taste cluster recoverable from user_emb? (nearest centroid)
    users_e = [u for u in table if u in user_cluster]
    E = np.stack([table[u] for u in users_e])
    ycl = np.array([user_cluster[u] for u in users_e])
    cents = np.stack([
        E[ycl == c].mean(axis=0) if (ycl == c).any() else np.zeros(E.shape[1])
        for c in range(args.clusters)
    ])
    cluster_acc = float(((E @ cents.T).argmax(axis=1) == ycl).mean())
    print(f"user_emb nearest-centroid cluster accuracy: {cluster_acc:.3f} "
          f"(chance {1 / args.clusters:.3f})")

    # --- 4. ranker A/B: identical training, user_emb real vs zeroed -------
    import optax
    from recommendations_tpu.models.ranker.wrapper import RankerModelWrapper

    rcfg = _ranker_config(emb_dim)
    feats = rcfg.features
    zero_col = [np.zeros(emb_dim, np.float32)]

    def prep(df, zero_emb: bool):
        """Attach the retrieval-space features; the ablated arm zeroes BOTH
        (= 'no retrieval encoder feeding the ranker', the rung-4 ablation).
        product_id/price stay, so the ablated arm still learns quality."""
        d = attach_user_embeddings(df, {} if zero_emb else table, emb_dim)
        d = attach_user_embeddings(
            d, {} if zero_emb else item_table, emb_dim,
            id_column="product_id", out_column="item_emb",
        )
        if zero_emb:
            d["user_emb"] = zero_col * len(d)
            d["item_emb"] = zero_col * len(d)
        return feats.default_data_mapper(d)

    def to_dev(sl):
        host = make_features_compliant(dict(sl), feats)
        return {k: jnp.asarray(v) for k, v in host.items()
                if getattr(v, "dtype", None) is not None
                and v.dtype.kind in "ifub"}

    def train_arm(zero_emb: bool):
        mapped = prep(imp, zero_emb)
        ev_hold = to_dev(prep(imp_eval_hold, zero_emb))
        ev_tr = to_dev(prep(imp_eval_train, zero_emb))
        rw = RankerModelWrapper(rcfg)
        rs = np.random.RandomState(0)
        batch0 = to_dev(mapped.iloc[rs.randint(0, len(mapped), 256)])
        vs = rw.init_variables(jax.random.PRNGKey(0), batch0)
        params = vs["params"]
        tx = optax.adam(rcfg.lr)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, b, rng):
            def lf(p):
                loss, (m, _) = rw.loss_and_metrics(p, {}, None, b, rng, True)
                return loss, m
            (loss, m), g = jax.value_and_grad(lf, has_aux=True)(params)
            u, o2 = tx.update(g, opt, params)
            return optax.apply_updates(params, u), o2, loss, m

        @jax.jit
        def score(params, b):
            return rw.forward({"params": params}, b)["click"].reshape(-1)

        arm = "ablated" if zero_emb else "with-emb"
        rng = jax.random.PRNGKey(1)
        trace = []
        t0 = time.time()
        for i in range(1, args.ranker_steps + 1):
            rng, sub = jax.random.split(rng)
            b = to_dev(mapped.iloc[rs.randint(0, len(mapped), 256)])
            params, opt, loss, m = step(params, opt, b, sub)
        wall = time.time() - t0
        for name, ev, yv in (("heldout_users", ev_hold, y_hold),
                             ("train_users", ev_tr, y_tr)):
            sc = np.asarray(score(params, ev), np.float32)
            trace.append((name, _auc(sc, yv)))
        print(f"[{arm}] steps={args.ranker_steps} wall={wall:.1f}s "
              + " ".join(f"{n}={a:.4f}" for n, a in trace))
        return dict(trace), wall, float(m.get("train_auc_click", np.nan))

    # persist the joint artifacts so ranker-side experiments can iterate
    # without retraining the LTHM encoder (tools_joint_ranker_only.py)
    import pickle

    with open(f"{root}/artifacts.pkl", "wb") as f:
        pickle.dump({
            "user_table": table, "item_table": item_table,
            "imp": imp, "imp_eval_hold": imp_eval_hold,
            "imp_eval_train": imp_eval_train,
            "y_hold": y_hold, "y_tr": y_tr, "emb_dim": emb_dim,
            "bayes_full": bayes_full, "bayes_prod": bayes_prod,
        }, f, protocol=4)

    auc_with, wall_with, tauc_with = train_arm(zero_emb=False)
    auc_wo, wall_wo, tauc_wo = train_arm(zero_emb=True)
    joint_ex_s = args.ranker_steps * 256 / wall_with

    result = {
        "lthm_train_steps": args.lthm_steps,
        "lthm_train_wall_s": round(t_train, 1),
        "knn_recall": (
            {f"recall@{int(r.k)}": float(r.recall) for r in knn.itertuples()}
            if knn is not None else None
        ),
        "bayes_optimal_auc_heldout_users": round(bayes_full, 4),
        "product_only_optimal_auc_heldout_users": round(bayes_prod, 4),
        "auc_heldout_users_with_user_emb": round(auc_with["heldout_users"], 4),
        "auc_heldout_users_without_user_emb": round(auc_wo["heldout_users"], 4),
        "auc_uplift_heldout_users": round(
            auc_with["heldout_users"] - auc_wo["heldout_users"], 4),
        "auc_train_users_with_user_emb": round(auc_with["train_users"], 4),
        "auc_train_users_without_user_emb": round(auc_wo["train_users"], 4),
        "auc_uplift_train_users": round(
            auc_with["train_users"] - auc_wo["train_users"], 4),
        "ranker_trainbatch_auc_with": tauc_with,
        "ranker_trainbatch_auc_without": tauc_wo,
        "join_coverage": round(coverage, 4),
        "joint_examples_per_sec": round(joint_ex_s, 1),
        "user_emb_cluster_centroid_acc": round(cluster_acc, 4),
        "raw_retrieval_dot_auc_heldout_users": round(retrieval_dot_auc, 4),
        "raw_dot_vs_match_auc": round(dot_match_auc, 4),
        "product_emb_cluster_centroid_acc": round(prod_centroid_acc, 4),
        "config": {"clusters": args.clusters, "train_rows": args.train_rows,
                   "ranker_steps": args.ranker_steps, "match_coef": 4.0},
    }
    with open(f"{root}/result.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))

    # record the joint throughput as a bench-suite rung (BASELINE rung 4)
    # and persist the quality evidence next to the other round artifacts
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    suite_path = os.path.join(repo, "BENCH_SUITE.json")
    existing = {}
    if os.path.exists(suite_path):
        try:
            with open(suite_path) as f:
                existing = {r["metric"]: r for r in json.load(f)}
        except Exception:
            existing = {}
    existing["joint_ranker_examples_per_sec_per_chip"] = {
        "metric": "joint_ranker_examples_per_sec_per_chip",
        "value": round(joint_ex_s, 1),
        "unit": "examples/s/chip",
        "auc_uplift_heldout_users": result["auc_uplift_heldout_users"],
    }
    with open(suite_path, "w") as f:
        json.dump(list(existing.values()), f, indent=2)
    shutil.copy(f"{root}/result.json",
                os.path.join(repo, "JOINT_QUALITY.json"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
