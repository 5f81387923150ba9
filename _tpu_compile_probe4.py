import time
import numpy as np
import recommendations_tpu
import jax, jax.numpy as jnp

M, V, d = 135168, 1_000_000, 32
rs = np.random.RandomState(0)
idx = jnp.asarray(rs.randint(0, V, M), jnp.int32)
g = jnp.asarray(rs.randn(M, d), jnp.float32)
rec = jnp.zeros((V, 128), jnp.float32)
from recommendations_tpu.train.sparse_table import FusedTableState
st = FusedTableState(count=jnp.zeros((), jnp.int32))
LR, B1, B2, EPS = 1e-3, 0.9, 0.999, 1e-8

def upd_pad(record, idx_flat, grad_rows, state):
    v_rows, lanes = record.shape
    m = idx_flat.shape[0]
    dd = grad_rows.shape[-1]
    count = state.count + 1
    si, order = jax.lax.sort_key_val(idx_flat.astype(jnp.int32), jnp.arange(m, dtype=jnp.int32))
    sg = jnp.take(grad_rows.astype(jnp.float32), order, axis=0)
    def comb(a, b):
        ka, va = a
        kb, vb = b
        return kb, jnp.where((ka == kb)[:, None], va + vb, vb)
    _, acc = jax.lax.associative_scan(comb, (si, sg))
    is_end = jnp.concatenate([si[1:] != si[:-1], jnp.ones((1,), bool)])
    is_end = is_end & jnp.any(acc != 0, axis=1)
    uidx = jnp.where(is_end, si, jnp.int32(v_rows))
    rows = jnp.take(record, jnp.where(is_end, si, 0), axis=0)
    t_rows = rows[:, :dd]
    m_rows = rows[:, dd:2*dd]
    v_row = rows[:, 2*dd:2*dd+1]
    g_sum = jnp.where(is_end[:, None], acc, 0.0)
    new_m = B1 * m_rows + (1 - B1) * g_sum
    g2 = jnp.mean(jnp.square(g_sum), axis=1, keepdims=True)
    new_v = B2 * v_row + (1 - B2) * g2
    c = count.astype(jnp.float32)
    mhat = new_m / (1 - jnp.float32(B1) ** c)
    vhat = new_v / (1 - jnp.float32(B2) ** c)
    new_t = t_rows - LR * mhat / (jnp.sqrt(vhat) + EPS)
    # pad-based assembly instead of 4-way lane concat
    new_rows = (
        jnp.pad(new_t, ((0, 0), (0, lanes - dd)))
        + jnp.pad(new_m, ((0, 0), (dd, lanes - 2 * dd)))
        + jnp.pad(new_v, ((0, 0), (2 * dd, lanes - 2 * dd - 1)))
    )
    lane = jnp.arange(lanes)
    new_rows = jnp.where(lane[None, :] > 2 * dd, rows, new_rows)
    return record.at[uidx].set(new_rows, mode="drop"), FusedTableState(count=count)

t0 = time.time()
f = jax.jit(upd_pad)
f.lower(rec, idx, g, st).compile()
print(f"upd_pad compile: {time.time()-t0:.1f}s", flush=True)

# numeric parity vs current implementation
from recommendations_tpu.train.sparse_table import sparse_fused_adam_update
a, _ = jax.jit(lambda r, i, gg, s: sparse_fused_adam_update(r, i, gg, s, learning_rate=LR))(rec, idx[:4096], g[:4096], st)
b, _ = f(rec, idx[:4096], g[:4096], st)
import numpy as np
print("parity max diff:", float(jnp.max(jnp.abs(a - b))), flush=True)
