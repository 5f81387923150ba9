"""Microbench the KShift table path primitives at 1M and 10M rows.

VERDICT r3 missing #2/#4: the 10M rung trails the 1M headline by ~6.5%,
attributed broadly to "gather/scatter". This tool decomposes the cost into
its real parts so the fix targets the binding term:

  a. full-table f32->bf16 cast (KShiftEmbedding casts the master table
     every step before the gather)
  b. the gather itself: bf16-cast-table vs f32-table + per-row cast
  c. dense gradient materialization (bucketed vs plain scatter-add)
  d. compact alternatives: sorted segment-sum via associative scan,
     scatter into a compact (M, d) destination
  e. scatter-add of M update rows into the (V, d) table (the sparse-apply
     cost a fully sparse optimizer would pay)
  f. lazy_rowwise_adam_update (includes its dense-grad nonzero scan)
  g. end-to-end KShift fwd+bwd via jax.grad (the thing the model pays)

Timing: chained jit + scalar fetch barrier (QUALITY.md round-3 notes; array
block_until_ready reports early on the tunneled runtime).

Usage: python tools_bench_table.py [--vocab 1000000,10000000]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import recommendations_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20, warmup=2):
    jfn = jax.jit(fn)
    for _ in range(warmup):
        out = jfn(*args)
    # scalar-fetch barrier
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0].ravel()[:1]))
    t0 = time.time()
    for _ in range(iters):
        out = jfn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0].ravel()[:1]))
    return (time.time() - t0) / iters * 1e3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", default="1000000,10000000")
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--rows", type=int, default=64 * 264 * 8,
                    help="gathered rows per step (batch*seq*k at the bench shape)")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from recommendations_tpu.ops.bucketed_scatter import (
        bucketed_scatter_add, plain_scatter_add, gather_rows,
    )
    from recommendations_tpu.train.sparse_table import (
        init_lazy_row_state, lazy_rowwise_adam_update,
    )

    d, m = args.d, args.rows
    rs = np.random.RandomState(0)
    results = {}
    for vocab in [int(v) for v in args.vocab.split(",")]:
        key = f"V={vocab}"
        res = {}
        table = jnp.asarray(rs.randn(vocab, d), jnp.float32)
        idx = jnp.asarray(rs.randint(0, vocab, size=(m,)), jnp.int32)
        rows16 = jnp.asarray(rs.randn(m, d), jnp.bfloat16)
        rows32 = rows16.astype(jnp.float32)

        res["a_cast_table_f32_to_bf16"] = timeit(
            lambda t: t.astype(jnp.bfloat16), table, iters=args.iters)
        t16 = table.astype(jnp.bfloat16)
        res["b_gather_bf16_table"] = timeit(
            lambda t, i: jnp.take(t, i, axis=0), t16, idx, iters=args.iters)
        res["b_gather_f32_table_cast_rows"] = timeit(
            lambda t, i: jnp.take(t, i, axis=0).astype(jnp.bfloat16),
            table, idx, iters=args.iters)
        res["c_bucketed_scatter_dense_bf16"] = timeit(
            lambda i, r: bucketed_scatter_add(i, r, vocab), idx, rows16,
            iters=args.iters)
        res["c_bucketed_scatter_dense_f32"] = timeit(
            lambda i, r: bucketed_scatter_add(i, r, vocab), idx, rows32,
            iters=args.iters)
        res["c_plain_scatter_dense_f32"] = timeit(
            lambda i, r: plain_scatter_add(i, r, vocab), idx, rows32,
            iters=max(3, args.iters // 4))

        def seg_scan(i, r):
            si, order = jax.lax.sort_key_val(i, jnp.arange(m, dtype=jnp.int32))
            sr = jnp.take(r, order, axis=0)

            def comb(a, b):
                ka, va = a
                kb, vb = b
                return kb, jnp.where((ka == kb)[:, None], va + vb, vb)

            _, acc = jax.lax.associative_scan(comb, (si, sr))
            is_end = jnp.concatenate([si[1:] != si[:-1],
                                      jnp.ones((1,), bool)])
            return jnp.where(is_end[:, None], acc, 0.0), si

        res["d_sorted_segsum_scan_f32"] = timeit(
            seg_scan, idx, rows32, iters=args.iters)

        def seg_scatter_compact(i, r):
            si, order = jax.lax.sort_key_val(i, jnp.arange(m, dtype=jnp.int32))
            sr = jnp.take(r, order, axis=0)
            pos = jnp.cumsum(
                jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                 (si[1:] != si[:-1]).astype(jnp.int32)]))
            return jnp.zeros((m, d), r.dtype).at[pos].add(
                sr, indices_are_sorted=True), si

        res["d_sorted_scatter_compact_f32"] = timeit(
            seg_scatter_compact, idx, rows32, iters=max(3, args.iters // 4))

        res["e_scatter_add_table_f32"] = timeit(
            lambda t, i, r: t.at[i].add(r), table, idx, rows32,
            iters=max(3, args.iters // 4))
        res["e_scatter_add_table_unique_sorted"] = timeit(
            lambda t, i, r: t.at[i].add(r, unique_indices=True,
                                        indices_are_sorted=True),
            table, jnp.sort(idx), rows32, iters=max(3, args.iters // 4))

        state = init_lazy_row_state(table)
        dense_g = plain_scatter_add(idx, rows32, vocab)
        dense_g = jax.block_until_ready(dense_g)
        res["f_lazy_rowwise_update"] = timeit(
            lambda t, g, s: lazy_rowwise_adam_update(
                t, g, s, learning_rate=1e-3, capacity=m),
            table, dense_g, state, iters=max(3, args.iters // 4))

        ids64 = jnp.asarray(
            rs.randint(-(2**62), 2**62, size=(m // 8,)), jnp.int64)

        def kshift_fwd_bwd(t, i64):
            from recommendations_tpu.nn.embeddings import kshift_row_indices

            def f(tt):
                ti = tt.astype(jnp.bfloat16)
                ix = kshift_row_indices(i64, vocab, 8)
                x = gather_rows(ti, ix)
                return jnp.sum(jnp.sum(x, axis=-2).astype(jnp.float32) ** 2)

            return jax.grad(f)(t)

        res["g_kshift_fwd_bwd_current"] = timeit(
            kshift_fwd_bwd, table, ids64, iters=max(3, args.iters // 4))

        results[key] = {k: round(v, 3) for k, v in res.items()}
        print(key, json.dumps(results[key], indent=2), flush=True)

    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
