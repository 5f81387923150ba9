"""Fused in-batch contrastive CE (Pallas TPU) with a custom-VJP backward.

The LTHM loss computes, per mini-batch chunk, an (N, N) similarity tile
(N = chunk_rows x seq = 16K at the prod scale point) with same-user /
validity masking, a logQ-adjusted logsumexp, the positive rank, and a
softmax backward (``models/lthm/loss.py``). In XLA the (N, N) tile is
537 MB at bf16 and makes several HBM round-trips (store raw, re-read for
mask/exp, materialize the cotangent, feed two GEMMs) — measured 7.2 ms per
32x512 chunk fwd+bwd (~15% MFU), x12 chunks = 86 ms of the prod step.

These kernels tile the (N, N) plane (row tiles x column chunks, column
axis innermost-sequential with accumulators in VMEM scratch) and fuse the
mask build, logQ adjustment, exp, rank compare, and reductions into the
GEMM tiles, so HBM never sees an (N, N) tensor in either direction:

- forward: the logsumexp shift is ANALYTIC (inputs are L2-normalized so
  |logits| <= 1/temperature, and the logQ term is bounded by
  beta*max|logQ| — ``loss.py:_ce_fwd_impl``), so no online flash max is
  needed; the positive diagonal comes from a cheap per-row dot kernel and
  rank = #(masked logits > diag) accumulates in the same pass as sumexp.
- backward: two kernels recompute each tile from the saved lse rows — dq
  accumulates ((p - eye) * a) @ C over column chunks; dc accumulates the
  row-axis contraction against Q over row chunks (the contraction axis
  does the transpose, as in ops/fused_attention).

Semantics identical to ``models/lthm/loss.py:_ce_core`` (the XLA
implementation, kept as the parity oracle): masked = (same_user & ~eye) |
~valid[col]; adj = logits - beta*logq[col] off-diagonal; fully-masked rows
produce a huge-but-finite ce that the caller zero-weights.

Reference behavior replaced: ``models/lthm/sequence/wrapper.py:185-218``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG_NEG = -1e9
_LANE = 128


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mm(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())), preferred_element_type=jnp.float32)


def _adj_tile(q_tile, c_tile, vcol, lqcol, r0, c0, s: int, n: int, inv_t, beta):
    """One (R, C) tile of adj logits + masks at global offset (r0, c0).

    q_tile (R, D), c_tile (C, D) operand dtype; vcol/lqcol (1, C) f32.
    Returns (masked logits, adj, eye) in f32.

    Index math (iota, the // s user-id divisions, the j < n bound) runs on
    (R, 1) / (1, C) VECTORS and reaches tile width only through broadcast
    compares — the previous 2D formulation spent ~4 full-tile VPU passes
    per tile on iota + integer division, which dominated these K=128 GEMM
    tiles (the CE block measured 27% MFU, VERDICT r4 #1).
    """
    rows, cols = q_tile.shape[0], c_tile.shape[0]
    raw = _mm(q_tile, c_tile, ((1,), (1,))) * jnp.float32(inv_t)
    i = r0 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)  # (R, 1)
    j = c0 + jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1)  # (1, C)
    same_user = (i // jnp.int32(s)) == (j // jnp.int32(s))  # one tile pass
    eye = i == j  # one tile pass
    ok = (vcol > 0) & (j < jnp.int32(n))  # (1, C) vector
    masked = (same_user & ~eye) | ~ok
    logits = jnp.where(masked, jnp.float32(_BIG_NEG), raw)
    adj = jnp.where(eye, logits, logits - jnp.float32(beta) * lqcol)
    return logits, adj, eye


def _row_diag_kernel(q_ref, cd_ref, v_ref, d_ref, *, inv_t, n):
    """diag[i] = q_i . c_i * inv_t where valid else BIG_NEG — the masked
    diagonal of the adj tile (cd is C row-aligned with Q).

    Vector operands/outputs ride as FULL (nt, r) arrays (they are a few KB;
    (1, r) blocks violate the TPU 8-sublane block rule) and are row-sliced
    in-kernel."""
    t = pl.program_id(0)
    rows = q_ref.shape[0]
    r0 = t * jnp.int32(rows)
    prod = jnp.sum(
        q_ref[...].astype(jnp.float32) * cd_ref[...].astype(jnp.float32),
        axis=1, keepdims=True,
    ) * jnp.float32(inv_t)
    i = r0 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    vrow = v_ref[pl.ds(t, 1), :]  # (1, rows)
    ok = (jnp.transpose(vrow) > 0) & (i < jnp.int32(n))
    d_ref[pl.ds(t, 1), :] = jnp.transpose(jnp.where(ok, prod, jnp.float32(_BIG_NEG)))


def _ce_fwd_kernel(
    q_ref, c_ref, v_ref, lq_ref, m_ref, diag_ref, ce_ref, rank_ref,
    se_scr, rk_scr, *, s, n, inv_t, beta, n_chunks,
):
    t = pl.program_id(0)
    c = pl.program_id(1)
    rows, cols = q_ref.shape[0], c_ref.shape[0]
    r0 = t * jnp.int32(rows)
    c0 = c * jnp.int32(cols)

    @pl.when(c == 0)
    def _():
        se_scr[...] = jnp.zeros(se_scr.shape, jnp.float32)
        rk_scr[...] = jnp.zeros(rk_scr.shape, jnp.float32)

    logits, adj, _eye = _adj_tile(
        q_ref[...], c_ref[...], v_ref[pl.ds(c, 1), :], lq_ref[pl.ds(c, 1), :],
        r0, c0, s, n, inv_t, beta
    )
    m = m_ref[0, 0]
    diag = jnp.transpose(diag_ref[pl.ds(t, 1), :])  # (R, 1)
    se_scr[:, :1] = se_scr[:, :1] + jnp.sum(jnp.exp(adj - m), axis=1, keepdims=True)
    rk_scr[:, :1] = rk_scr[:, :1] + jnp.sum(
        (logits > diag).astype(jnp.float32), axis=1, keepdims=True
    )

    @pl.when(c == n_chunks - 1)
    def _():
        lse = m + jnp.log(se_scr[:, :1])  # (R, 1)
        ce_ref[pl.ds(t, 1), :] = jnp.transpose(lse) - diag_ref[pl.ds(t, 1), :]
        rank_ref[pl.ds(t, 1), :] = jnp.transpose(rk_scr[:, :1])


def _ce_dq_kernel(
    q_ref, c_ref, v_ref, lq_ref, m_ref, lse_ref, a_ref, dq_ref, dq_scr,
    *, s, n, inv_t, beta, n_chunks,
):
    t = pl.program_id(0)
    c = pl.program_id(1)
    rows, cols = q_ref.shape[0], c_ref.shape[0]
    r0 = t * jnp.int32(rows)
    c0 = c * jnp.int32(cols)

    @pl.when(c == 0)
    def _():
        dq_scr[...] = jnp.zeros(dq_scr.shape, jnp.float32)

    _logits, adj, eye = _adj_tile(
        q_ref[...], c_ref[...], v_ref[pl.ds(c, 1), :], lq_ref[pl.ds(c, 1), :],
        r0, c0, s, n, inv_t, beta
    )
    # padded rows carry lse = BIG_NEG (ce pad 0 + masked diag): exp would
    # overflow to inf and inf * (a == 0) = NaN poisons the contraction —
    # same hazard class the XLA oracle guards (loss.py:_ce_core_bwd)
    lse_row = jnp.transpose(lse_ref[pl.ds(t, 1), :])  # (R, 1)
    p = jnp.where(
        lse_row > jnp.float32(-1e8), jnp.exp(adj - lse_row), jnp.float32(0.0)
    )
    g = (p - eye.astype(jnp.float32)) * jnp.transpose(a_ref[pl.ds(t, 1), :])
    dq_scr[...] = dq_scr[...] + _mm(g.astype(c_ref.dtype), c_ref[...], ((1,), (0,)))

    @pl.when(c == n_chunks - 1)
    def _():
        dq_ref[...] = dq_scr[...]


def _ce_dc_kernel(
    q_ref, c_ref, v_ref, lq_ref, m_ref, lse_ref, a_ref, dc_ref, dc_scr,
    *, s, n, inv_t, beta, n_chunks,
):
    """dc tile: C rows are the TILE (grid dim 0), Q rows the CHUNK axis;
    dc[j] = sum_i g[i, j] q[i] — the row-axis contraction is the transpose."""
    t = pl.program_id(0)
    c = pl.program_id(1)
    ctile, qrows = c_ref.shape[0], q_ref.shape[0]
    c0 = t * jnp.int32(ctile)
    r0 = c * jnp.int32(qrows)

    @pl.when(c == 0)
    def _():
        dc_scr[...] = jnp.zeros(dc_scr.shape, jnp.float32)

    _logits, adj, eye = _adj_tile(
        q_ref[...], c_ref[...], v_ref[pl.ds(t, 1), :], lq_ref[pl.ds(t, 1), :],
        r0, c0, s, n, inv_t, beta
    )
    # same padded-row guard as the dq kernel; lse/a ride the CHUNK axis here
    lse_row = jnp.transpose(lse_ref[pl.ds(c, 1), :])  # (qrows, 1)
    p = jnp.where(
        lse_row > jnp.float32(-1e8), jnp.exp(adj - lse_row), jnp.float32(0.0)
    )
    g = (p - eye.astype(jnp.float32)) * jnp.transpose(a_ref[pl.ds(c, 1), :])
    dc_scr[...] = dc_scr[...] + _mm(g.astype(q_ref.dtype), q_ref[...], ((0,), (0,)))

    @pl.when(c == n_chunks - 1)
    def _():
        dc_ref[...] = dc_scr[...]


def _interpret_default(interpret: Optional[bool]) -> bool:
    if interpret is None:
        return jax.default_backend() == "cpu"
    return interpret


def _auto_geometry(n: int) -> Tuple[int, int]:
    """Pick (tile, chunk) minimizing row padding, preferring larger tiles.

    The fixed (512, 1024) default pads the headline chunk shape N=8448
    (mini-batch 32 x seq 264) to 9216 — 9.1% of every tile pass and GEMM
    spent on rows that are masked out. N=8448 = 66*128 admits exact
    (384, 768) covers; the prod chunk N=16384 keeps (512, 1024) exactly.
    Candidates stay >=256/>=512 so tiles stay MXU/VPU-efficient.
    """
    if n <= 512:
        r = _ceil_to(n, 128)
        return r, r
    best = None
    for r_c in (512, 384, 256):
        for ch_c in (1024, 768, 512):
            if ch_c < r_c:
                continue
            lcm = (r_c * ch_c) // int(np.gcd(r_c, ch_c))
            n_pad = _ceil_to(n, lcm)
            key = (n_pad, -(r_c * ch_c))
            if best is None or key < best[0]:
                best = (key, r_c, ch_c)
    return best[1], best[2]


def _prep(q16, c16, v, lq, tile: Optional[int], chunk: Optional[int]):
    n, d = q16.shape
    # all ints must be PYTHON ints: an np.int64 (e.g. np.gcd's return)
    # reaching a kernel becomes an i64 const operand, which the TPU X64
    # rewriter rejects
    auto_r, auto_ch = _auto_geometry(int(n))
    r = int(tile) if tile is not None else auto_r
    ch = int(chunk) if chunk is not None else auto_ch
    n_pad = int(_ceil_to(n, (r * ch) // int(np.gcd(r, ch))))
    d_pad = _ceil_to(d, _LANE)
    qp = jnp.pad(q16, [(0, n_pad - n), (0, d_pad - d)])
    cp = jnp.pad(c16, [(0, n_pad - n), (0, d_pad - d)])
    vp = jnp.pad(v.astype(jnp.float32), [(0, n_pad - n)])  # pads invalid
    lqp = jnp.pad(lq.astype(jnp.float32), [(0, n_pad - n)])
    return qp, cp, vp, lqp, n_pad, d_pad, r, ch


def _mat_tile(r, d_pad):
    return pl.BlockSpec((r, d_pad), lambda t, c: (t, jnp.int32(0)), memory_space=pltpu.VMEM)


def _mat_chunk(ch, d_pad):
    return pl.BlockSpec((ch, d_pad), lambda t, c: (c, jnp.int32(0)), memory_space=pltpu.VMEM)


def _vec_full(nrows, width):
    """Whole (nrows, width) vector array resident (a few KB); (1, width)
    blocks would violate the 8-sublane block-shape rule."""
    return pl.BlockSpec(
        (nrows, width), lambda t, c: (jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )


def _smem_scalar():
    return pl.BlockSpec(
        (1, 1), lambda t, c: (jnp.int32(0), jnp.int32(0)), memory_space=pltpu.SMEM
    )


def _grid_params():
    return pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary"))


def _grid_params_shared_out():
    """All-'arbitrary' for kernels whose outputs are row-slices of ONE
    shared constant-index block (the fwd ce/rank vectors): a 'parallel'
    tile dim is split across Megacore cores, each of which would flush its
    own partial copy of the whole block (ADVICE r3 #1 hazard class). The
    dq/dc kernels keep 'parallel' — their outputs are tile-indexed."""
    return pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary"))


def _fwd_impl(q16, c16, v, lq, s, inv_t, beta, tile, chunk, interpret):
    n = q16.shape[0]
    qp, cp, vp, lqp, n_pad, d_pad, r, ch = _prep(q16, c16, v, lq, tile, chunk)
    nt, nc = n_pad // r, n_pad // ch
    # analytic logsumexp shift (loss.py:_ce_fwd_impl)
    m = (jnp.float32(inv_t) + jnp.float32(beta) * jnp.max(jnp.abs(lqp)) + 1.0).reshape(1, 1)
    v_t = vp.reshape(nt, r)       # tiled as ROW vectors (per row tile)
    v_c = vp.reshape(nc, ch)      # tiled as CHUNK vectors (per col chunk)
    lq_c = lqp.reshape(nc, ch)

    diag = pl.pallas_call(
        functools.partial(_row_diag_kernel, inv_t=inv_t, n=n),
        out_shape=jax.ShapeDtypeStruct((nt, r), jnp.float32),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((r, d_pad), lambda t: (t, jnp.int32(0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, d_pad), lambda t: (t, jnp.int32(0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, r), lambda t: (jnp.int32(0), jnp.int32(0)), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nt, r), lambda t: (jnp.int32(0), jnp.int32(0)), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(qp, cp, v_t)

    ce_t, rank_t = pl.pallas_call(
        functools.partial(_ce_fwd_kernel, s=s, n=n, inv_t=inv_t, beta=beta, n_chunks=nc),
        out_shape=(
            jax.ShapeDtypeStruct((nt, r), jnp.float32),
            jax.ShapeDtypeStruct((nt, r), jnp.float32),
        ),
        grid=(nt, nc),
        in_specs=[
            _mat_tile(r, d_pad),
            _mat_chunk(ch, d_pad),
            _vec_full(nc, ch),
            _vec_full(nc, ch),
            _smem_scalar(),
            _vec_full(nt, r),
        ],
        out_specs=(_vec_full(nt, r), _vec_full(nt, r)),
        scratch_shapes=[
            pltpu.VMEM((r, _LANE), jnp.float32),
            pltpu.VMEM((r, _LANE), jnp.float32),
        ],
        compiler_params=_grid_params_shared_out(),
        interpret=interpret,
    )(qp, cp, v_c, lq_c, m, diag)
    ce = ce_t.reshape(-1)[:n]
    rank = rank_t.reshape(-1)[:n]
    return ce, rank, (qp, cp, vp, lqp, m, diag, r, ch)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def fused_contrastive_ce(
    q16: jnp.ndarray,
    c16: jnp.ndarray,
    v: jnp.ndarray,
    lq: jnp.ndarray,
    s: int,
    inv_t: float,
    beta: float,
    tile: Optional[int] = None,
    chunk: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ce, rank) per row; differentiable wrt q16 and c16.

    q16/c16: (N, D) L2-normalized queries/candidates (bf16 on the hot
    path); v: (N,) bool candidate validity; lq: (N,) f32 logQ per
    candidate; s: tokens per user (same-user block size); inv_t = 1/tau.
    """
    interpret_ = _interpret_default(interpret)
    ce, rank, _ = _fwd_impl(q16, c16, v, lq, s, inv_t, beta, tile, chunk, interpret_)
    return ce, rank.astype(jnp.int32)


def _vjp_fwd(q16, c16, v, lq, s, inv_t, beta, tile, chunk, interpret):
    interpret_ = _interpret_default(interpret)
    ce, rank, res = _fwd_impl(q16, c16, v, lq, s, inv_t, beta, tile, chunk, interpret_)
    qp, cp, vp, lqp, m, diag, r, ch = res
    n = q16.shape[0]
    # lse = ce + diag, O(N) residual; the (N, N) tile is recomputed in bwd.
    # r/ch ride along so the backward reuses the EXACT tiling _prep chose:
    # re-deriving them from n_pad diverges for N in 513..896 (n_pad is the
    # r/ch lcm ceiling, not the ceil-to-128 _prep saw — ADVICE r3 #3)
    lse = jnp.pad(ce, [(0, qp.shape[0] - n)]) + diag.reshape(-1)
    return (ce, rank.astype(jnp.int32)), (
        qp, cp, vp, lqp, m, lse, n, q16.shape[1], r, ch
    )


def _vjp_bwd(s, inv_t, beta, tile, chunk, interpret, res, cts):
    interpret_ = _interpret_default(interpret)
    qp, cp, vp, lqp, m, lse, n, d, r, ch = res
    n_pad, d_pad = (int(x) for x in qp.shape)
    r, ch = int(r), int(ch)
    nt, nc = n_pad // r, n_pad // ch
    dce = cts[0].astype(jnp.float32)
    a = jnp.pad(dce, [(0, n_pad - n)]) * jnp.float32(inv_t)
    v_t, v_c = vp.reshape(nt, r), vp.reshape(nc, ch)
    lq_t, lq_c = lqp.reshape(nt, r), lqp.reshape(nc, ch)

    dq = pl.pallas_call(
        functools.partial(_ce_dq_kernel, s=s, n=n, inv_t=inv_t, beta=beta, n_chunks=nc),
        out_shape=jax.ShapeDtypeStruct((n_pad, d_pad), jnp.float32),
        grid=(nt, nc),
        in_specs=[
            _mat_tile(r, d_pad),
            _mat_chunk(ch, d_pad),
            _vec_full(nc, ch),
            _vec_full(nc, ch),
            _smem_scalar(),
            _vec_full(nt, r),    # lse rows
            _vec_full(nt, r),    # a rows
        ],
        out_specs=_mat_tile(r, d_pad),
        scratch_shapes=[pltpu.VMEM((r, d_pad), jnp.float32)],
        compiler_params=_grid_params(),
        interpret=interpret_,
    )(qp, cp, v_c, lq_c, m, lse.reshape(nt, r), a.reshape(nt, r))

    # dc: tile over C rows (r-sized), chunk over Q rows (ch-sized); the
    # column-side vectors (v, lq) now ride per TILE, lse/a per CHUNK
    dc = pl.pallas_call(
        functools.partial(
            _ce_dc_kernel, s=s, n=n, inv_t=inv_t, beta=beta, n_chunks=nc
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, d_pad), jnp.float32),
        grid=(nt, nc),
        in_specs=[
            _mat_chunk(ch, d_pad),  # q rows ride the chunk axis
            _mat_tile(r, d_pad),    # c rows ride the tile axis
            _vec_full(nt, r),       # v of the tile's columns
            _vec_full(nt, r),       # lq of the tile's columns
            _smem_scalar(),
            _vec_full(nc, ch),      # lse of the chunk's rows
            _vec_full(nc, ch),      # a of the chunk's rows
        ],
        out_specs=_mat_tile(r, d_pad),
        scratch_shapes=[pltpu.VMEM((r, d_pad), jnp.float32)],
        compiler_params=_grid_params(),
        interpret=interpret_,
    )(qp, cp, v_t, lq_t, m, lse.reshape(nc, ch), a.reshape(nc, ch))

    return (
        dq[:n, :d].astype(qp.dtype),
        dc[:n, :d].astype(cp.dtype),
        np.zeros((n,), dtype=jax.dtypes.float0),
        jnp.zeros((n,), jnp.float32),
    )


fused_contrastive_ce.defvjp(_vjp_fwd, _vjp_bwd)
