import time
import numpy as np
import recommendations_tpu
import jax, jax.numpy as jnp

M, V = 135168, 1_000_000
rs = np.random.RandomState(0)
idx = jnp.asarray(rs.randint(0, V, M), jnp.int32)
rows = jnp.asarray(rs.randn(M, 128), jnp.float32)
rec = jnp.zeros((V, 128), jnp.float32)

t0 = time.time()
jax.jit(lambda r, i: jnp.take(r, i, axis=0)).lower(rec, idx).compile()
print(f"gather_only: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
jax.jit(lambda r, i, x: r.at[i].set(x, mode="drop")).lower(rec, idx, rows).compile()
print(f"scatter_drop: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
jax.jit(lambda r, i, x: r.at[i].set(x, mode="drop", unique_indices=True)).lower(rec, idx, rows).compile()
print(f"scatter_drop_unique: {time.time()-t0:.1f}s", flush=True)

srt = jnp.sort(idx)
t0 = time.time()
jax.jit(lambda r, i, x: r.at[i].set(x, mode="drop", unique_indices=True,
                                    indices_are_sorted=True)).lower(rec, srt, rows).compile()
print(f"scatter_drop_unique_sorted: {time.time()-t0:.1f}s", flush=True)
