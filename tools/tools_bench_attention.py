"""Attention kernel micro-bench on the real chip: fused Pallas vs XLA.

Measures fwd+bwd wall time per call at LTHM shapes (MQA, 32 heads x hd=16)
across sequence lengths. Drives RECOMMENDED_MAX_SEQ tuning in
ops/fused_attention.py.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import recommendations_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def bench_one(fn, args, iters=20):
    """Python-loop wall clock per call. HONESTY CAVEAT (round 5): at sub-ms
    step sizes this measures TUNNEL DISPATCH latency, not the device — the
    same pitfall the scan-based ranker rung fixed. Use bench_chained for
    device-rate numbers below ~1.5 ms/call; this loop stays useful only as
    an end-to-end dispatch-included figure."""
    out = jax.jit(fn)(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    # device fetch barrier (block_until_ready can report early on tunnels)
    s = jax.jit(lambda o: sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(o)))
    float(s(out))
    t0 = time.time()
    for _ in range(iters):
        out = jax.jit(fn)(*args)
    float(s(out))
    return (time.time() - t0) / iters * 1000


def bench_chained(grad_fn, args, steps=100, repeats=3):
    """Device rate: lax.scan the fwd+bwd STEPS times inside ONE program,
    chaining each step's grads into the next step's inputs so XLA cannot
    overlap or elide iterations. One dispatch, one fetch — the tunnel
    dispatch cost amortizes to nothing."""
    @jax.jit
    def many(*a):
        def step(carry, _):
            grads = grad_fn(*carry)
            nxt = tuple(
                x + jnp.asarray(0.001, x.dtype) * g.astype(x.dtype)
                for x, g in zip(carry, grads)
            )
            return nxt, ()
        final, _ = jax.lax.scan(step, a, None, length=steps)
        return sum(jnp.sum(jnp.abs(x).astype(jnp.float32)) for x in final)

    float(many(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        float(many(*args))
        best = min(best, (time.time() - t0) / steps * 1000)
    return best


def main():
    from recommendations_tpu.ops.fused_attention import fused_flash_attention
    from recommendations_tpu.nn.attention import _sdpa, causal_mask

    b, n_head, hd = 16, 32, 16
    d = n_head * hd
    dtype = jnp.bfloat16
    results = []
    for t in ([512, 1024, 2048] if len(sys.argv) < 2 else [int(x) for x in sys.argv[1:]]):
        key = jax.random.PRNGKey(0)
        kq, kk, kv_, kc = jax.random.split(key, 4)
        q = jax.random.normal(kq, (b, t, d), dtype)
        k = jax.random.normal(kk, (b, t, hd), dtype)
        v = jax.random.normal(kv_, (b, t, hd), dtype)
        cot = jax.random.normal(kc, (b, t, d), dtype)

        def fused_fb(q, k, v):
            def loss(q, k, v):
                return jnp.sum(
                    fused_flash_attention(q, k, v, n_head, True, None, False) * cot
                )
            return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        def xla_fb(q, k, v):
            mask = causal_mask(t)

            def loss(q, k, v):
                qh = q.reshape(b, t, n_head, hd).transpose(0, 2, 1, 3)
                kh = k.reshape(b, t, 1, hd).transpose(0, 2, 1, 3)
                vh = v.reshape(b, t, 1, hd).transpose(0, 2, 1, 3)
                y = _sdpa(qh, kh, vh, mask, None)
                y = y.transpose(0, 2, 1, 3).reshape(b, t, d)
                return jnp.sum(y * cot)
            return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        row = {"seq": t, "batch": b}
        try:
            row["fused_ms"] = round(bench_one(fused_fb, (q, k, v)), 2)
            row["fused_chained_ms"] = round(bench_chained(fused_fb, (q, k, v)), 4)
        except Exception as e:
            row["fused_error"] = str(e)[:200]
        try:
            row["xla_ms"] = round(bench_one(xla_fb, (q, k, v)), 2)
            row["xla_chained_ms"] = round(bench_chained(xla_fb, (q, k, v)), 4)
        except Exception as e:
            row["xla_error"] = str(e)[:200]
        print(json.dumps(row), flush=True)
        results.append(row)
    return 0


if __name__ == "__main__":
    sys.exit(main())
