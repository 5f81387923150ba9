"""Iterate ranker-side configs on the saved joint artifacts (CPU-friendly).

Consumes /tmp/joint_quality/artifacts.pkl (written by tools_joint_quality)
so ranker architecture/step experiments don't re-train the LTHM encoder.
Runs the with/ablated A/B for a given config and prints the uplift.

Usage: python tools_joint_ranker_only.py [--steps 6000] [--emb 32]
       [--tower 128] [--top 128] [--lr 3e-3] [--cpu]
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--emb", type=int, default=16)
    ap.add_argument("--tower", type=int, default=64)
    ap.add_argument("--top", type=int, default=64)
    ap.add_argument("--tower-dim", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--artifacts", default="/tmp/joint_quality/artifacts.pkl")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import recommendations_tpu  # noqa: F401
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools_joint_quality import _auc, _ranker_config
    from recommendations_tpu.data.grouping import make_features_compliant
    from recommendations_tpu.models.ranker.wrapper import RankerModelWrapper
    from recommendations_tpu.tools.joint_pipeline import attach_user_embeddings

    with open(args.artifacts, "rb") as f:
        art = pickle.load(f)
    table, item_table = art["user_table"], art["item_table"]
    imp, y_hold, y_tr = art["imp"], art["y_hold"], art["y_tr"]
    imp_eval_hold, imp_eval_train = art["imp_eval_hold"], art["imp_eval_train"]
    emb_dim = art["emb_dim"]

    rcfg = _ranker_config(emb_dim)
    rcfg.emb_dim = args.emb
    rcfg.tower_hidden = (args.tower,)
    rcfg.tower_dim = args.tower_dim
    rcfg.top_hidden = (args.top,)
    rcfg.lr = args.lr
    feats = rcfg.features
    zero_col = [np.zeros(emb_dim, np.float32)]

    def prep(df, zero_emb):
        d = attach_user_embeddings(df, {} if zero_emb else table, emb_dim)
        d = attach_user_embeddings(d, {} if zero_emb else item_table, emb_dim,
                                   id_column="product_id", out_column="item_emb")
        if zero_emb:
            d["user_emb"] = zero_col * len(d)
            d["item_emb"] = zero_col * len(d)
        return feats.default_data_mapper(d)

    def to_dev(sl):
        host = make_features_compliant(dict(sl), feats)
        return {k: jnp.asarray(v) for k, v in host.items()
                if getattr(v, "dtype", None) is not None
                and v.dtype.kind in "ifub"}

    def train_arm(zero_emb):
        mapped = prep(imp, zero_emb)
        ev_hold = to_dev(prep(imp_eval_hold, zero_emb))
        ev_tr = to_dev(prep(imp_eval_train, zero_emb))
        rw = RankerModelWrapper(rcfg)
        rs = np.random.RandomState(0)
        batch0 = to_dev(mapped.iloc[rs.randint(0, len(mapped), args.batch)])
        vs = rw.init_variables(jax.random.PRNGKey(0), batch0)
        params = vs["params"]
        sched = optax.cosine_decay_schedule(rcfg.lr, args.steps, alpha=0.1)
        tx = optax.adam(sched)
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

        rng = jax.random.PRNGKey(1)
        t0 = time.time()
        arm = "ablated" if zero_emb else "with"
        for i in range(1, args.steps + 1):
            rng, sub = jax.random.split(rng)
            b = to_dev(mapped.iloc[rs.randint(0, len(mapped), args.batch)])
            params, opt, loss, m = step(params, opt, b, sub)
            if i % 1500 == 0:
                ah = _auc(np.asarray(score(params, ev_hold)), y_hold)
                at = _auc(np.asarray(score(params, ev_tr)), y_tr)
                print(f"[{arm}] step {i} trainAUC "
                      f"{float(m['train_auc_click']):.4f} hold {ah:.4f} "
                      f"trainusers {at:.4f}", flush=True)
        wall = time.time() - t0
        ah = _auc(np.asarray(score(params, ev_hold)), y_hold)
        at = _auc(np.asarray(score(params, ev_tr)), y_tr)
        return ah, at, wall

    ah_w, at_w, wall_w = train_arm(False)
    ah_a, at_a, _ = train_arm(True)
    out = {
        "config": {"emb": args.emb, "tower": args.tower, "top": args.top,
                   "tower_dim": args.tower_dim, "lr": args.lr,
                   "steps": args.steps},
        "auc_heldout_with": round(ah_w, 4), "auc_heldout_ablated": round(ah_a, 4),
        "uplift_heldout": round(ah_w - ah_a, 4),
        "auc_trainusers_with": round(at_w, 4),
        "auc_trainusers_ablated": round(at_a, 4),
        "uplift_trainusers": round(at_w - at_a, 4),
        "bayes_full": art["bayes_full"], "bayes_prod": art["bayes_prod"],
        "wall_s_with": round(wall_w, 1),
    }
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
