"""Per-segment profile at the PROD scale point (lthm_train.yaml shapes).

Same in-graph lax.scan method as tools_profile_segments.py, at the prod
shapes: batch 64, seq 512(+CLS), 16 layers, d=512 MQA-32 with rel-pos bias
(forces the XLA sdpa path), 10M-row KShift, remat 'dots_no_batch', loss
chunk = 32 rows x 512 seq = 16K.  Used to decide where prod-step
optimization effort goes (attention vs loss vs scatter).
"""
import time
import numpy as np
import recommendations_tpu  # noqa: F401
import jax, jax.numpy as jnp
from recommendations_tpu.models.lthm.config import (
    LTHMModelConfig, LogQConfig, ProductTowerConfig, SelfAttentionConfig, TransformerConfig,
)
from recommendations_tpu.nn.embeddings import KShiftEmbedding
from recommendations_tpu.nn.transformer import TransformerStack
from recommendations_tpu.models.lthm.loss import _head_loss

batch, seq, layers, d, vocab = 64, 512, 16, 512, 10_000_000
rs = np.random.RandomState(0)
key = jax.random.PRNGKey(0)
N_ITER = 5


def timeloop(name, mod, grad, *args):
    vs = mod.init(key, *args)
    if grad:
        def body(v, _):
            def loss(vv):
                out = mod.apply(vv, *args)
                return sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in jax.tree_util.tree_leaves(out))
            g = jax.grad(loss)(v)
            return jax.tree_util.tree_map(lambda a, b: a + 1e-9 * b.astype(a.dtype), v, g), 0.0
    else:
        def body(v, _):
            out = mod.apply(v, *args)
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(out))
            return jax.tree_util.tree_map(lambda a: a + 1e-12 * s.astype(a.dtype), v), 0.0

    @jax.jit
    def run(v):
        v, _ = jax.lax.scan(body, v, None, length=N_ITER)
        return jax.tree_util.tree_reduce(lambda a, x: a + jnp.sum(jnp.abs(x[:1] if x.ndim else x)).astype(jnp.float32), v, jnp.float32(0))

    float(run(vs))
    t0 = time.time()
    float(run(vs))
    dt = (time.time() - t0) / N_ITER
    print(f"{name:36s} {dt*1e3:8.2f} ms", flush=True)


def timeloss(name, chunk_rows):
    s_ = seq
    n = chunk_rows * s_
    q = jnp.asarray(rs.randn(chunk_rows, s_, 128), jnp.float32)
    c = jnp.asarray(rs.randn(chunk_rows, s_, 128), jnp.float32)
    v = jnp.ones((chunk_rows, s_), bool)
    lq = jnp.zeros((chunk_rows, s_), jnp.float32)

    def body(carry, _):
        qq = carry

        def loss(x):
            l, m = _head_loss(x, c, v, lq, temperature=0.05, beta=0.0)
            return l
        g = jax.grad(loss)(qq)
        return qq + 1e-9 * g, 0.0

    @jax.jit
    def run(qq):
        qq, _ = jax.lax.scan(body, qq, None, length=N_ITER)
        return jnp.sum(jnp.abs(qq[0, 0]))

    float(run(q))
    t0 = time.time()
    float(run(q))
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
# the round-3 prod path: fused kernel with the in-kernel relative-pos bias
stack_flash_bias = TransformerStack(pos_bias_window=seq + 1, use_flash=True, **common)

ks = KShiftEmbedding(num_embeddings=vocab, features=32, num_shifts=8,
                     normalize_output=True, compute_dtype=jnp.bfloat16)

timeloss("loss chunk 32x512 fwd+bwd", 32)
timeloop("kshift(10M) fwd+bwd", ks, True, ids)
timeloop("stack16 XLA+posbias fwd+bwd", stack_prod, True, x_stack)
timeloop("stack16 XLA no-bias fwd+bwd", stack_xla_nobias, True, x_stack)
timeloop("stack16 flash no-bias fwd+bwd", stack_flash, True, x_stack)
timeloop("stack16 flash+posbias fwd+bwd", stack_flash_bias, True, x_stack)
