import time
import numpy as np
import recommendations_tpu
import jax, jax.numpy as jnp

M, V, d = 135168, 1_000_000, 32
rs = np.random.RandomState(0)
idx = jnp.asarray(rs.randint(0, V, M), jnp.int32)
g = jnp.asarray(rs.randn(M, d), jnp.float32)
rec = jnp.zeros((V, 128), jnp.float32)

def seg(si, sg):
    def comb(a, b):
        ka, va = a
        kb, vb = b
        return kb, jnp.where((ka == kb)[:, None], va + vb, vb)
    return jax.lax.associative_scan(comb, (si, sg))[1]

def upd_a(r, i, gg):  # sort + scan + gather + scatter, NO adam math
    si, order = jax.lax.sort_key_val(i, jnp.arange(M, dtype=jnp.int32))
    sg = jnp.take(gg, order, axis=0)
    acc = seg(si, sg)
    is_end = jnp.concatenate([si[1:] != si[:-1], jnp.ones((1,), bool)])
    uidx = jnp.where(is_end, si, jnp.int32(V))
    rows = jnp.take(r, jnp.where(is_end, si, 0), axis=0)
    new = rows + jnp.pad(acc, ((0, 0), (0, 128 - d)))
    return r.at[uidx].set(new, mode="drop")

def upd_b(r, i, gg):  # same but scatter gets sorted flags (uidx IS nondecreasing? no: V interleaved)
    si, order = jax.lax.sort_key_val(i, jnp.arange(M, dtype=jnp.int32))
    sg = jnp.take(gg, order, axis=0)
    acc = seg(si, sg)
    is_end = jnp.concatenate([si[1:] != si[:-1], jnp.ones((1,), bool)])
    uidx = jnp.where(is_end, si, jnp.int32(V))
    rows = jnp.take(r, jnp.where(is_end, si, 0), axis=0)
    new = rows + jnp.pad(acc, ((0, 0), (0, 128 - d)))
    return r.at[uidx].set(new, mode="drop", unique_indices=True)

for name, f in (("compose_noadam", upd_a), ("compose_unique", upd_b)):
    t0 = time.time()
    jax.jit(f).lower(rec, idx, g).compile()
    print(f"{name}: {time.time()-t0:.1f}s", flush=True)
