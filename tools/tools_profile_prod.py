"""Per-segment profile at the PROD scale point (lthm_train.yaml shapes).

Measures each hot segment at the prod shapes: batch 64, seq 512(+CLS), 16
layers, d=512 MQA-32 with rel-pos bias, 10M-row KShift, remat
'dots_no_batch', loss chunk = 32 rows x 512 seq = 16K. Used to decide
where prod-step optimization effort goes.

MEASUREMENT METHODOLOGY (round-3 correction): the round-2 version timed a
``lax.scan`` of N iterations inside one jit — that harness inflated every
segment ~3x (e.g. the XLA pos-bias stack measured 639 ms vs its true 196
ms) and, worse, inflated different code paths by different factors, which
mis-ranked kernel variants. This version times a CHAINED single-step jit
(params updated with a data-dependent +1e-9*grad so iterations cannot
overlap or fold) and uses a scalar device-get as the barrier
(block_until_ready alone reports early on tunneled runtimes — see
bench_suite._timed_steps).
"""
import time
import numpy as np
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import recommendations_tpu  # noqa: F401
import jax, jax.numpy as jnp
from recommendations_tpu.nn.embeddings import KShiftEmbedding
from recommendations_tpu.nn.transformer import TransformerStack
from recommendations_tpu.models.lthm.loss import _head_loss

batch, seq, layers, d, vocab = 64, 512, 16, 512, 10_000_000
rs = np.random.RandomState(0)
key = jax.random.PRNGKey(0)
N_ITER = 5


def _checksum(vs):
    return jax.tree_util.tree_reduce(
        lambda a, p: a + jnp.sum(jnp.abs(p[:1] if p.ndim else p)).astype(jnp.float32),
        vs, jnp.float32(0),
    )


def timeloop(name, mod, grad, *args):
    vs = mod.init(key, *args)

    if grad:
        @jax.jit
        def step(v):
            def loss(vv):
                out = mod.apply(vv, *args)
                return sum(
                    jnp.sum(x.astype(jnp.float32) ** 2)
                    for x in jax.tree_util.tree_leaves(out)
                )
            g = jax.grad(loss)(v)
            return jax.tree_util.tree_map(
                lambda a, b: a + 1e-9 * b.astype(a.dtype), v, g
            )
    else:
        @jax.jit
        def step(v):
            out = mod.apply(v, *args)
            s = sum(
                jnp.sum(x.astype(jnp.float32))
                for x in jax.tree_util.tree_leaves(out)
            )
            return jax.tree_util.tree_map(lambda a: a + 1e-12 * s.astype(a.dtype), v)

    cks = jax.jit(_checksum)
    vs = step(vs)
    float(cks(vs))  # compile + real barrier (device fetch)
    t0 = time.time()
    for _ in range(N_ITER):
        vs = step(vs)
    float(cks(vs))
    dt = (time.time() - t0) / N_ITER
    print(f"{name:36s} {dt*1e3:8.2f} ms", flush=True)


def timeloss(name, chunk_rows):
    s_ = seq
    q = jnp.asarray(rs.randn(chunk_rows, s_, 128), jnp.float32)
    c = jnp.asarray(rs.randn(chunk_rows, s_, 128), jnp.float32)
    v = jnp.ones((chunk_rows, s_), bool)
    lq = jnp.zeros((chunk_rows, s_), jnp.float32)

    @jax.jit
    def step(qq):
        def loss(x):
            l, m = _head_loss(x, c, v, lq, temperature=0.05, beta=0.0)
            return l
        g = jax.grad(loss)(qq)
        return qq + 1e-9 * g

    q = step(q)
    float(jnp.sum(jnp.abs(q[0, 0])))
    t0 = time.time()
    for _ in range(N_ITER):
        q = step(q)
    float(jnp.sum(jnp.abs(q[0, 0])))
    dt = (time.time() - t0) / N_ITER
    print(f"{name:36s} {dt*1e3:8.2f} ms  (x 12 head-chunks = {12*dt*1e3:7.1f} ms)", flush=True)


x_stack = jnp.asarray(rs.randn(batch, seq + 1, d), jnp.bfloat16)
ids = jnp.asarray(rs.randint(-(2**62), 2**62, size=(batch, seq + 8)).astype(np.int64))

common = dict(num_layers=layers, n_embd=d, n_head=32, attn_type="multi_query",
              is_causal=True, use_bias=False, dropout=0.0, attn_dropout=0.0,
              rotator=4.0, dtype=jnp.bfloat16, remat=True)
stack_prod = TransformerStack(pos_bias_window=seq + 1, use_flash=False, **common)
stack_flash = TransformerStack(pos_bias_window=None, use_flash=True, **common)
stack_xla_nobias = TransformerStack(pos_bias_window=None, use_flash=False, **common)
# fused kernel with in-kernel rel-pos bias (dispatch picks it only above
# the measured seq-768 crossover; forced here for the comparison record)
import recommendations_tpu.ops.fused_attention as _fa
_orig = _fa.BIAS_MIN_SEQ
_fa.BIAS_MIN_SEQ = 0
stack_flash_bias = TransformerStack(pos_bias_window=seq + 1, use_flash=True, **common)

ks = KShiftEmbedding(num_embeddings=vocab, features=32, num_shifts=8,
                     normalize_output=True, compute_dtype=jnp.bfloat16)

timeloss("loss chunk 32x512 fwd+bwd", 32)
timeloop("kshift(10M) fwd+bwd", ks, True, ids)
timeloop("stack16 XLA+posbias fwd+bwd", stack_prod, True, x_stack)
timeloop("stack16 XLA no-bias fwd+bwd", stack_xla_nobias, True, x_stack)
timeloop("stack16 flash no-bias fwd+bwd", stack_flash, True, x_stack)
timeloop("stack16 flash+posbias fwd+bwd", stack_flash_bias, True, x_stack)
_fa.BIAS_MIN_SEQ = _orig
