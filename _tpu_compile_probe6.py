import time
import numpy as np
import recommendations_tpu
import jax, jax.numpy as jnp

M, V, d = 135168, 1_000_000, 32
rs = np.random.RandomState(0)
idx = jnp.asarray(rs.randint(0, V, M), jnp.int32)
g = jnp.asarray(rs.randn(M, d), jnp.float32)
rec = jnp.zeros((V, 128), jnp.float32)
cnt = jnp.zeros((), jnp.int32)

def base(r, i, gg, c, data_dep_idx, traced_pow):
    si, order = jax.lax.sort_key_val(i, jnp.arange(M, dtype=jnp.int32))
    sg = jnp.take(gg, order, axis=0)
    def comb(a, b):
        ka, va = a
        kb, vb = b
        return kb, jnp.where((ka == kb)[:, None], va + vb, vb)
    _, acc = jax.lax.associative_scan(comb, (si, sg))
    is_end = jnp.concatenate([si[1:] != si[:-1], jnp.ones((1,), bool)])
    if data_dep_idx:
        is_end = is_end & jnp.any(acc != 0, axis=1)
    uidx = jnp.where(is_end, si, jnp.int32(V))
    rows = jnp.take(r, jnp.where(is_end, si, 0), axis=0)
    scale = 1.0
    if traced_pow:
        cc = (c + 1).astype(jnp.float32)
        scale = 1.0 / (1.0 - jnp.float32(0.9) ** cc)
    new = rows + scale * jnp.pad(acc, ((0, 0), (0, 128 - d)))
    return r.at[uidx].set(new, mode="drop")

for name, dd_, tp in (("data_dep_idx", True, False), ("traced_pow", False, True)):
    t0 = time.time()
    jax.jit(lambda r, i, gg, c, a=dd_, b=tp: base(r, i, gg, c, a, b)).lower(rec, idx, g, cnt).compile()
    print(f"{name}: {time.time()-t0:.1f}s", flush=True)
