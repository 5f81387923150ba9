"""Synthetic click-log generator for the Tiny-LTHM correctness config.

Produces parquet files shaped like the reference's expected input
(``hydra-configs/model/lthm.yaml:85-100``): per user a most-recent-first
product-id history (strings, hashed by the feature pipeline), per-event
action labels and epoch timestamps.

The generator plants learnable structure so hit-rate@k must improve during
training: users belong to latent taste clusters and browse mostly within a
cluster-specific product subset in a Markov-chain order, so the next item is
predictable from the history.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import pandas as pd


def make_click_log(
    num_users: int = 1024,
    history_len: int = 32,
    num_products: int = 2000,
    num_clusters: int = 16,
    seed: int = 0,
    structure_seed: int = 777,
    p_in_cluster_jump: float = 0.0,
) -> pd.DataFrame:
    # the product->cluster structure is GLOBAL (fixed structure_seed): every
    # file/date shares the same catalog dynamics, so models can generalize
    # from train dates to val dates; `seed` varies only users and noise
    #
    # ``p_in_cluster_jump``: per step, probability of jumping to a RANDOM
    # in-cluster product instead of the ring successor. 0 (default, the
    # historical behavior) gives a deterministic per-cluster ring — maximal
    # sequential signal, but retrieval embeddings become successor-specific
    # (measured: dot(user_vec, in-cluster product) is chance outside the
    # successor). A mixture (e.g. 0.35) adds in-cluster co-occurrence, which
    # is what clusters real-world retrieval embedding spaces — used by the
    # joint-quality harness (tools_joint_quality.py).
    struct = np.random.RandomState(structure_seed)
    cluster_of_product = struct.randint(0, num_clusters, size=num_products)
    products_by_cluster = [
        np.where(cluster_of_product == c)[0] for c in range(num_clusters)
    ]
    rng = np.random.RandomState(seed)
    # per-cluster ring order: strong sequential signal inside a cluster
    rows = []
    base_ts = 1_700_000_000
    for u in range(num_users):
        c = rng.randint(num_clusters)
        pool = products_by_cluster[c]
        if len(pool) < 2:
            pool = np.arange(num_products)
        start = rng.randint(len(pool))
        n = rng.randint(history_len // 2, history_len + 1)
        if p_in_cluster_jump <= 0.0:
            seq = [pool[(start + i) % len(pool)] for i in range(n)]
        else:
            seq = []
            pos = start
            for _ in range(n):
                seq.append(pool[pos % len(pool)])
                if rng.rand() < p_in_cluster_jump:
                    pos = rng.randint(len(pool))
                else:
                    pos += 1
        if rng.rand() < 0.2:  # noise: occasional out-of-cluster click
            seq[rng.randint(n)] = rng.randint(num_products)
        ts0 = base_ts + rng.randint(0, 86400 * 7)
        timestamps = ts0 + np.arange(n) * rng.randint(30, 600)
        labels = rng.randint(0, 4, size=n)
        # most-recent-first, matching the serving-format history order
        rows.append(
            {
                "customer_id": f"user_{u}",
                "product_id": f"sku_{seq[-1]}",
                "product_ids": [f"sku_{p}" for p in seq[::-1]],
                "labels": labels[::-1].astype(np.float32),
                "timestamps": timestamps[::-1].astype(np.float32),
            }
        )
    return pd.DataFrame(rows)


def _pad_lists(df: pd.DataFrame, history_len: int) -> pd.DataFrame:
    """Pad labels/timestamps float lists to the fixed history length (the
    tensor_list contract requires exact declared shapes)."""

    def pad(v):
        v = np.asarray(v, dtype=np.float32)[:history_len]
        return np.pad(v, (0, history_len - len(v)))

    df = df.copy()
    df["labels"] = df["labels"].apply(pad)
    df["timestamps"] = df["timestamps"].apply(pad)
    return df


def write_synthetic_dataset(
    root: str,
    dates: Optional[List[str]] = None,
    files_per_date: int = 2,
    users_per_file: int = 512,
    history_len: int = 32,
    num_products: int = 2000,
    seed: int = 0,
    num_clusters: int = 16,
    p_in_cluster_jump: float = 0.0,
) -> List[str]:
    """Write date-partitioned parquet under ``root/date=YYYYMMDD/part-N.parquet``."""
    dates = dates or ["20240101"]
    paths = []
    i = 0
    for date in dates:
        day_dir = os.path.join(root, f"date={date}")
        os.makedirs(day_dir, exist_ok=True)
        for p in range(files_per_date):
            df = make_click_log(
                num_users=users_per_file,
                history_len=history_len,
                num_products=num_products,
                num_clusters=num_clusters,
                seed=seed + i,
                p_in_cluster_jump=p_in_cluster_jump,
            )
            df = _pad_lists(df, history_len)
            path = os.path.join(day_dir, f"part-{p:05d}.parquet")
            df.to_parquet(path)
            paths.append(path)
            i += 1
    return paths


def make_ranking_log(
    num_rows: int = 4096,
    num_products: int = 500,
    num_users: int = 200,
    seed: int = 0,
    structure_seed: int = 777,
) -> pd.DataFrame:
    """Synthetic tabular impression log for the ranker config (BASELINE
    config 2): click/conversion labels depend on latent product quality and
    user-product affinity, so AUC must rise above 0.5 during training.
    Latent quality/bias/affinity come from the fixed structure_seed so they
    are consistent across files/dates (val stays predictable)."""
    struct = np.random.RandomState(structure_seed)
    quality = struct.randn(num_products) * 1.2
    user_bias = struct.randn(num_users) * 0.6
    affinity = struct.randn(num_users, 8) @ struct.randn(8, num_products) * 0.15
    rng = np.random.RandomState(seed)
    p_idx = rng.randint(0, num_products, num_rows)
    u_idx = rng.randint(0, num_users, num_rows)
    price = np.abs(rng.randn(num_rows) * 40 + 30).astype(np.float32)
    position = rng.randint(0, 20, num_rows)
    logits = (
        quality[p_idx] + user_bias[u_idx] + affinity[u_idx, p_idx]
        - 0.08 * position - 0.004 * price - 1.0
    )
    click = (rng.rand(num_rows) < 1 / (1 + np.exp(-logits))).astype(np.float32)
    conv = click * (rng.rand(num_rows) < 1 / (1 + np.exp(-(logits - 1.0)))).astype(np.float32)
    ts = 1_700_000_000 + rng.randint(0, 86400 * 7, num_rows)
    return pd.DataFrame(
        {
            "product_id": [f"sku_{p}" for p in p_idx],
            "customer_id": [f"user_{u}" for u in u_idx],
            "search_query": [f"query_{rng.randint(50)}" for _ in range(num_rows)],
            "price": price,
            "position": position.astype(np.float32),
            "is_returning_user": (u_idx % 3 == 0).astype(np.float32),
            "event_ts": ts.astype(np.int64),
            "click": click,
            "conversion": conv,
        }
    )


def write_ranking_dataset(
    root: str,
    dates: Optional[List[str]] = None,
    files_per_date: int = 2,
    rows_per_file: int = 4096,
    seed: int = 0,
) -> List[str]:
    dates = dates or ["20240101"]
    paths = []
    i = 0
    for date in dates:
        day_dir = os.path.join(root, f"date={date}")
        os.makedirs(day_dir, exist_ok=True)
        for p in range(files_per_date):
            df = make_ranking_log(num_rows=rows_per_file, seed=seed + i)
            path = os.path.join(day_dir, f"part-{p:05d}.parquet")
            df.to_parquet(path)
            paths.append(path)
            i += 1
    return paths


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--dates", nargs="*", default=["20240101"])
    ap.add_argument("--files-per-date", type=int, default=2)
    ap.add_argument("--users-per-file", type=int, default=512)
    ap.add_argument("--history-len", type=int, default=32)
    ap.add_argument("--num-products", type=int, default=2000)
    args = ap.parse_args()
    out = write_synthetic_dataset(
        args.root, args.dates, args.files_per_date, args.users_per_file,
        args.history_len, args.num_products,
    )
    print(f"wrote {len(out)} files under {args.root}")


# ---------------------------------------------------------------------------
# Joint retrieval→ranking synthetic data (BASELINE config 4)
#
# Impressions whose click depends on the MATCH between the user's latent
# taste cluster and the product's cluster. The user's cluster is carried
# ONLY by their interaction history, so a ranker can realize the match term
# only through the retrieval encoder's embeddings — the signal the joint
# pipeline's uplift measures (tools/tools_joint_quality.py proved +0.095
# held-out-user AUC on this construction; QUALITY.md r4).
# ---------------------------------------------------------------------------


def product_clusters(num_products: int, num_clusters: int,
                     structure_seed: int = 777) -> np.ndarray:
    """The synthetic catalog's fixed product->cluster map (same
    structure_seed as make_click_log, so both logs share the catalog)."""
    struct = np.random.RandomState(structure_seed)
    return struct.randint(0, num_clusters, size=num_products)


def user_cluster_map(click_df: pd.DataFrame, num_products: int,
                     num_clusters: int) -> dict:
    """user -> majority cluster of their history (recovers the generator's
    latent draw; histories are ~97% in-cluster)."""
    cop = product_clusters(num_products, num_clusters)
    out = {}
    for _, row in click_df.iterrows():
        pids = [int(p.split("_")[1]) for p in row["product_ids"] if p]
        if not pids:
            continue
        out[row["customer_id"]] = int(
            np.bincount(cop[pids], minlength=num_clusters).argmax()
        )
    return out


def make_cluster_ranking_log(user_cluster: dict, users: list,
                             num_products: int, num_clusters: int,
                             num_rows: int, seed: int = 0,
                             match_coef: float = 4.0):
    """Impressions whose click depends on user-cluster == product-cluster.
    Product quality and price are learnable without the user signal; the
    match term is not. Returns (DataFrame, refs) where refs carries the
    Bayes / product-only reference logits for ceiling calibration."""
    cop = product_clusters(num_products, num_clusters)
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
    refs = {
        "true_logit": logits,
        "product_only_logit": quality[p_idx] - 0.004 * price,
    }
    return df, refs
