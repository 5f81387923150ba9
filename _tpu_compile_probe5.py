import time
import numpy as np
import recommendations_tpu
import jax, jax.numpy as jnp

M, V, d = 135168, 1_000_000, 32
rs = np.random.RandomState(0)
idx = jnp.asarray(rs.randint(0, V, M), jnp.int32)
g = jnp.asarray(rs.randn(M, d), jnp.float32)
rec = jnp.zeros((V, 128), jnp.float32)

def base(r, i, gg, extra):
    si, order = jax.lax.sort_key_val(i, jnp.arange(M, dtype=jnp.int32))
    sg = jnp.take(gg, order, axis=0)
    def comb(a, b):
        ka, va = a
        kb, vb = b
        return kb, jnp.where((ka == kb)[:, None], va + vb, vb)
    _, acc = jax.lax.associative_scan(comb, (si, sg))
    is_end = jnp.concatenate([si[1:] != si[:-1], jnp.ones((1,), bool)])
    uidx = jnp.where(is_end, si, jnp.int32(V))
    rows = jnp.take(r, jnp.where(is_end, si, 0), axis=0)
    new = rows + jnp.pad(acc, ((0, 0), (0, 128 - d)))
    new = extra(rows, acc, is_end, new)
    return r.at[uidx].set(new, mode="drop")

cases = {
    "plus_1lane_slice": lambda rows, acc, e, new: new + 0.001 * rows[:, 64:65],
    "plus_m1_mean": lambda rows, acc, e, new: new + 0.001 * jnp.mean(jnp.square(acc), axis=1, keepdims=True),
    "plus_zero_filter": lambda rows, acc, e, new: jnp.where((e & jnp.any(acc != 0, axis=1))[:, None], new, rows),
}
for name, extra in cases.items():
    t0 = time.time()
    jax.jit(lambda r, i, gg, ex=extra: base(r, i, gg, ex)).lower(rec, idx, g).compile()
    print(f"{name}: {time.time()-t0:.1f}s", flush=True)
