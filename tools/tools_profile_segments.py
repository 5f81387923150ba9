"""Per-segment fwd / fwd+bwd times via in-graph lax.scan (no dispatch noise).

Each segment runs N_ITER times inside one jitted scan, so per-call dispatch
(~2ms over the tunnel) and host-sync noise are amortized away.  Measured
2026-08-19 on 1x v5e (LTHM-base shapes, flash attention on):

    kshift fwd                      5.15 ms   (gather: row-latency bound)
    kshift fwd+bwd                 15.37 ms   (scatter-add backward ~10ms;
                                               XLA TPU scatter is serialized —
                                               sort/flags don't help, cost is
                                               ~f(rows)+g(table_size))
    product_tower fwd+bwd           4.20 ms
    query_tower fwd+bwd            39.36 ms
    stack(flash) fwd               15.41 ms
    stack(flash) fwd+bwd           35.86 ms   (vs 44.85 XLA sdpa)
    optimizer.update                ~4 ms     (AdamW over 216MB params)

The stack is now ~MXU-bound on the MLP matmuls (~207 GFLOP/layer fwd+bwd);
the remaining structural lever is the kshift scatter (two-level bucketed
scatter into VMEM-sized slices — future work).
"""
import time
import numpy as np
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root
import recommendations_tpu
import jax, jax.numpy as jnp
from recommendations_tpu.models.lthm.config import (
    LTHMModelConfig, LogQConfig, ProductTowerConfig, SelfAttentionConfig, TransformerConfig,
)
from recommendations_tpu.models.lthm.model import ProductTower, QueryTower
from recommendations_tpu.models.lthm.wrapper import LTHMModelWrapper
from recommendations_tpu.nn.embeddings import KShiftEmbedding
from recommendations_tpu.nn.transformer import TransformerStack

batch, seq, layers, d, vocab = 64, 256, 6, 512, 1_000_000
S = seq + 8
rs = np.random.RandomState(0)
key = jax.random.PRNGKey(0)
N_ITER = 10

def timeloop(name, mod, grad, *args):
    vs = mod.init(key, *args)
    if grad:
        def one(v):
            def loss(vv):
                out = mod.apply(vv, *args)
                return sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in jax.tree_util.tree_leaves(out))
            g = jax.grad(loss)(v)
            return g
        def body(v, _):
            g = one(v)
            return jax.tree_util.tree_map(lambda a, b: a + 1e-9 * b, v, g), 0.0
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
    print(f"{name:28s} {dt*1e3:7.2f} ms")

cfg = LTHMModelConfig(
    features={"defaults": {}},
    transformer_config=TransformerConfig(
        rotator_config={"ff_mult": 4}, is_causal=True, num_layers=layers,
        enable_gradient_checkpointing=False, use_flash_attention=True,
        attn_config=SelfAttentionConfig(n_head=32, n_embd=d, attn_type="multi_query",
                                        dropout=0.0, attn_dropout=0.0, bias=False),
    ),
    product_tower=ProductTowerConfig(
        inp_emb_dim=32, out_emb_dim=d, product_emb_dim=128, norm_bins=20,
        cosine_lsh_config=[{"num_bins": nb, "num_proj": 32} for nb in (2, 4, 8, 12, 16, 20)],
        latent_model_config={"vocab_size_latent": vocab, "num_shifts_latent": 8,
                             "normalize_embedding": True},
    ),
    log_q_config=LogQConfig(num_buckets=2**22, hash_offsets=[0, 34144, 7465477]),
    lookahead=[0, 5, 6, 12, 24, 30],
    context_width=seq, softmax_temperature=0.05, train_mini_batch_size=32,
)
ids = jnp.asarray(rs.randint(-(2**62), 2**62, size=(batch, S)).astype(np.int64))
embs = jnp.asarray(rs.randn(batch, S, 32), jnp.float32)
labels = jnp.asarray(rs.randint(0, 4, size=(batch, S)).astype(np.int64))
ts = jnp.asarray(rs.randint(1_600_000_000, 1_700_000_000, size=(batch, S)).astype(np.int64))
x_stack = jnp.asarray(rs.randn(batch, seq + 1, d), jnp.bfloat16)
inp = jnp.asarray(rs.randn(batch, S, d), jnp.float32)
target = jnp.asarray(rs.randn(batch, S, 128), jnp.float32)
mask = jnp.asarray(rs.rand(batch, S) < 0.1)

ks = KShiftEmbedding(num_embeddings=vocab, features=32, num_shifts=8,
                     normalize_output=True, compute_dtype=jnp.bfloat16)
stack = TransformerStack(num_layers=layers, n_embd=d, n_head=32, attn_type="multi_query",
                         is_causal=True, use_bias=False, dropout=0.0, attn_dropout=0.0,
                         rotator=cfg.transformer_config.rotator(), use_flash=True,
                         dtype=jnp.bfloat16)
stack_xla = TransformerStack(num_layers=layers, n_embd=d, n_head=32, attn_type="multi_query",
                             is_causal=True, use_bias=False, dropout=0.0, attn_dropout=0.0,
                             rotator=cfg.transformer_config.rotator(), use_flash=False,
                             dtype=jnp.bfloat16)
timeloop("kshift fwd", ks, False, ids)
timeloop("kshift fwd+bwd", ks, True, ids)
timeloop("product_tower fwd+bwd", ProductTower(cfg), True, ids, embs)
timeloop("query_tower fwd+bwd", QueryTower(cfg), True, inp, target, mask, labels, ts, ids)
timeloop("stack(flash) fwd", stack, False, x_stack)
timeloop("stack(flash) fwd+bwd", stack, True, x_stack)
timeloop("stack(xla) fwd+bwd", stack_xla, True, x_stack)
