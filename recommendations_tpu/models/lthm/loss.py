"""Multi-horizon in-batch contrastive loss with streaming logQ correction.

Static-shape rebuild of reference ``models/lthm/sequence/wrapper.py:114-245``.
Where the reference reshapes per sampled offset (``input_emb[:, offset:]``)
and *drops* rows (``logits[~not_use]``) — both dynamic shapes — this
implementation keeps one fixed (N, N) logits tile per head and expresses the
same semantics through masks and weights:

- candidate at flattened slot t=(b,j) is ``roll(input_emb, -offset)[b,j]``
  = input token (b, j+offset); query slot t is head-i transformer output at
  position j.  Positives stay on the diagonal exactly as in the reference
  (labels = arange).
- slot validity v[b,j] = (j < S-offset) AND token (b,j+offset) is not
  padding — replaces the reference's slicing + pad-mask rows/cols.
- 'same-user non-diagonal → -inf', 'padded row/col → -inf', 'skip rows with
  no negatives', and 'NaN filtering' all become additive masks / zero
  weights (reference ``wrapper.py:185-218``).
- hit_rate@k via rank = #(masked logits > positive) instead of top-k, so
  k_eff = min(k, min negatives) can be traced (reference ``wrapper.py:240-242``).

The (N, N) tile is bounded by loss-side mini-batching
(``train_mini_batch_size``, reference ``wrapper.py:78-112``): chunks of the
batch are processed in a static python loop inside the same jit.

Offsets are sampled *inside* the jit (one randint per head with traced
bounds), matching the reference's per-step curriculum
(``wrapper.py:147-152``) without retracing.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from recommendations_tpu.nn.logq import LogQState, logq_correction, logq_update

Metrics = Dict[str, jnp.ndarray]

_BIG_NEG = -1e9


def sample_offsets(rng: jax.Array, lookahead: List[int]) -> jnp.ndarray:
    """offset_0 = lookahead[0]; offset_i ~ U(prev+1, lookahead[i]) — the
    lookahead curriculum of reference ``wrapper.py:147-152``."""
    offsets = [jnp.asarray(lookahead[0], dtype=jnp.int32)]
    prev = offsets[0]
    for i in range(1, len(lookahead)):
        sub = jax.random.fold_in(rng, i)
        off = jax.random.randint(
            sub, (), minval=prev + 1, maxval=jnp.asarray(lookahead[i], jnp.int32) + 1,
            dtype=jnp.int32,
        )
        offsets.append(off)
        prev = off
    return jnp.stack(offsets)


def _masked_adj(q, c, vv, lqv, s: int, inv_t: float, beta: float):
    # store the (N, N) GEMM output in the operand dtype (bf16 on TPU):
    # it is the dominant HBM tensor of the loss; the f32 upcast fuses
    # into the elementwise mask/exp consumers so f32 never hits HBM.
    # bf16 quantum at |logit|<=1/temperature is coarse (~0.125 at 20),
    # but the *adjusted* CE subtracts a same-magnitude diagonal — the
    # measured step-loss delta vs f32 storage is <0.01% (see commit).
    n = q.shape[0]
    raw = jax.lax.dot_general(
        q, c, (((1,), (1,)), ((), ())), preferred_element_type=q.dtype
    ).astype(jnp.float32) * jnp.float32(inv_t)
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    same_user = (i_idx // s) == (j_idx // s)
    eye = i_idx == j_idx
    masked = (same_user & ~eye) | (~vv)[None, :]
    logits = jnp.where(masked, jnp.float32(_BIG_NEG), raw)
    # logQ subtracted per candidate column, zeroed at the positive
    # (reference wrapper.py:167-174)
    adj = jnp.where(eye, logits, logits - jnp.float32(beta) * lqv[None, :])
    return logits, adj, eye


def _ce_fwd_impl(q, c, vv, lqv, s, inv_t, beta):
    logits, adj, eye = _masked_adj(q, c, vv, lqv, s, inv_t, beta)
    # Analytic logsumexp shift: inputs are L2-normalized so raw logits are
    # bounded by 1/temperature, and the logQ term by beta*max|logQ| — a
    # scalar bound replaces the per-row max pass over the (N, N) tile.
    m = jnp.float32(inv_t) + jnp.float32(beta) * jnp.max(jnp.abs(lqv)) + 1.0
    lse = m + jnp.log(jnp.sum(jnp.exp(adj - m), axis=-1))
    diag = jnp.sum(jnp.where(eye, adj, 0.0), axis=-1)
    ce = lse - diag
    rank = jnp.sum((logits > diag[:, None]).astype(jnp.int32), axis=-1)
    return ce, rank


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _ce_core(q, c, vv, lqv, s, inv_t, beta):
    """Per-row contrastive CE + positive rank with a hand-written VJP.

    Autodiff of the naive formulation materializes the f32 (N, N) cotangent
    and layout-converts it for the two transposed matmuls (~30 ms/step of
    pure transpose copies at the bench scale point).  The custom backward
    instead recomputes the logits GEMM, forms ``g = (softmax(adj) - I) * a``
    in one fused pass, and feeds both input grads as direct bf16 matmuls
    with the contraction on the appropriate axis — no transpose, no f32
    (N, N) cotangent.  This is SURVEY §7 hard-part #4 (the tiled logits+CE
    kernel) expressed in XLA ops: the runtime here cannot lower gridded
    Pallas calls, and the GEMM/fusion structure below is what the Pallas
    kernel would pipeline anyway.

    Defined at module level (NOT nested in the caller): a custom_vjp created
    inside a traced function leaks trace-time constants into the residual
    jaxpr, which breaks lax.scan's transpose ("No constant handler for
    DynamicJaxprTracer") — the scan path below relies on this.
    """
    return _ce_fwd_impl(q, c, vv, lqv, s, inv_t, beta)


def _ce_core_fwd(q, c, vv, lqv, s, inv_t, beta):
    ce, rank = _ce_fwd_impl(q, c, vv, lqv, s, inv_t, beta)
    # residuals are O(N): the (N, N) tile is recomputed in bwd
    return (ce, rank), (q, c, vv, lqv, ce)


def _ce_core_bwd(s, inv_t, beta, res, cts):
    q, c, vv, lqv, ce = res
    dce = cts[0].astype(jnp.float32)
    _logits, adj, eye = _masked_adj(q, c, vv, lqv, s, inv_t, beta)
    # p = softmax(adj) per row, recovered from ce: lse = ce + diag(adj)
    diag = jnp.sum(jnp.where(eye, adj, 0.0), axis=-1)
    # fully-masked rows (invalid slot with no valid candidates in the chunk)
    # have ce = lse = -inf; exp(adj - (-inf)) = inf would NaN the whole
    # chunk's dc through the transposed matmul even though dce = 0 there
    # (inf * 0 = NaN). Pin lse to 0 for those rows: adj is -1e9 everywhere
    # on them, so p underflows to exactly 0 and the row contributes nothing.
    lse = jnp.where(jnp.isfinite(ce), ce + diag, jnp.float32(0.0))
    a = dce * jnp.float32(inv_t)
    p = jnp.exp(adj - lse[:, None])
    # masked columns underflow to exactly 0 (exp(-1e9 - lse)); rows whose
    # diagonal is masked only occur with w=0 upstream => dce=0 there
    g16 = ((p - eye.astype(jnp.float32)) * a[:, None]).astype(jnp.bfloat16)
    dq = jax.lax.dot_general(
        g16, c, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dc = jax.lax.dot_general(
        g16, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return (
        dq.astype(q.dtype),
        dc.astype(c.dtype),
        np.zeros(vv.shape, dtype=jax.dtypes.float0),
        jnp.zeros_like(lqv),
    )


_ce_core.defvjp(_ce_core_fwd, _ce_core_bwd)


def _ce_rows(
    q16: jnp.ndarray,   # (N, D) bf16 normalized queries
    c16: jnp.ndarray,   # (N, D) bf16 normalized candidates
    v: jnp.ndarray,     # (N,) bool slot validity
    lq: jnp.ndarray,    # (N,) f32 logQ of candidates
    bc: int,
    s: int,
    temperature: float,
    beta: float,
    fused_ce: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``fused_ce`` selects the Pallas fused CE (ops/fused_ce) over the XLA
    formulation. Honest chained-step measurement at the prod chunk shape
    (N=16K, D=128, v5e): fused 5.31 ms vs XLA 5.21 ms fwd+bwd — a wash, so
    XLA (module-level custom VJP, bf16 logits storage, _ce_core) stays the
    default; the kernel serves regimes where the (N, N) tile's HBM
    round-trips dominate (larger N / narrower D) and doubles as a second
    implementation validated against the oracle (tests/test_fused_ce.py).
    The choice is a typed model-config field (``LTHMModelConfig.fused_ce``)
    so it is serialized with the run."""
    if fused_ce:
        from recommendations_tpu.ops.fused_ce import fused_contrastive_ce

        return fused_contrastive_ce(
            q16, c16, v, lq, s, float(1.0 / temperature), float(beta)
        )
    return _ce_core(q16, c16, v, lq, s, float(1.0 / temperature), float(beta))


def _head_loss(
    query: jnp.ndarray,       # (Bc, S, D) normalized head-i outputs
    cand: jnp.ndarray,        # (Bc, S, D) normalized rolled candidates
    valid: jnp.ndarray,       # (Bc, S) slot validity
    cand_logq: jnp.ndarray,   # (Bc, S) logQ of candidate tokens
    temperature: float,
    beta: float,
    fused_ce: bool = False,
) -> Tuple[jnp.ndarray, Metrics]:
    bc, s, d = query.shape
    n = bc * s
    # The N x N similarity matmul dominates the step's FLOPs.  bf16 operands
    # with an immediate upcast keep fwd AND both bwd matmuls on the MXU fast
    # path; the MXU accumulates in f32 either way, and inputs are
    # L2-normalized so bf16 rounding is a <0.5% perturbation of a [-1,1] dot.
    q16 = query.reshape(n, d).astype(jnp.bfloat16)
    c16 = cand.reshape(n, d).astype(jnp.bfloat16)
    v = valid.reshape(n)
    lq = jax.lax.stop_gradient(cand_logq.reshape(n).astype(jnp.float32))

    ce, rank = _ce_rows(
        q16, c16, v, lq, bc, s, float(temperature), float(beta), fused_ce
    )

    # negatives per row, closed form (no (N, N) mask reduction): columns that
    # are valid and either cross-user or the diagonal, minus the positive:
    #   num_neg_i = (#valid) - (#valid in user(i)) + v_i - 1
    vf = v.astype(jnp.float32)
    per_user = vf.reshape(bc, s).sum(axis=-1)
    num_neg = (
        jnp.sum(vf) - jnp.repeat(per_user, s) + vf - 1.0
    ).astype(jnp.int32)
    w = (v & (num_neg > 0)).astype(jnp.float32)

    # NaN filter (wrapper.py:210-213); also catches the -inf a fully-masked
    # row produces under the scalar-shift logsumexp (such rows have w=0)
    ce = jnp.where(jnp.isfinite(ce), ce, 0.0)
    used = jnp.sum(w)
    loss = jnp.sum(ce * w) / jnp.maximum(used, 1.0)
    metrics = {
        "effective_batch_size": used,
        "average_negatives_per_token": jnp.sum(num_neg * w) / jnp.maximum(used, 1.0),
        "used_tokens": used,
        "loss_all_tokens": loss,
        "average_hit_position": jnp.sum(rank * w) / jnp.maximum(used, 1.0),
        "median_hit_position": jnp.nanquantile(
            jnp.where(w > 0, rank.astype(jnp.float32), jnp.nan), 0.5
        ),
        "_rank": rank,
        "_weight": w,
        "_min_neg": jnp.min(jnp.where(w > 0, num_neg, jnp.iinfo(jnp.int32).max)),
    }
    return loss, metrics


def contrastive_step(
    output: Dict[str, jnp.ndarray],
    logq_state: LogQState,
    batch_idx: jnp.ndarray,
    rng: jax.Array,
    *,
    lookahead: List[int],
    temperature: float,
    beta: float,
    alpha: float,
    metrics_k_all: List[int],
    train_mini_batch_size: int,
    training: bool,
    fused_ce: bool = False,
) -> Tuple[jnp.ndarray, Metrics, LogQState]:
    """Full train/val loss over the macro batch.

    Mirrors reference ``wrapper.py:72-245``: normalize embeddings, update the
    streaming logQ estimator on real (unmasked) tokens, then accumulate the
    per-head contrastive losses over mini-batch chunks.
    """
    # keep the (B, S, K, D) head tensor in its compute dtype: upcasting it
    # to f32 before normalizing costs two full passes over ~208MB at the
    # bench shape (trace: 4.9 ms of convert fusions) and the CE path
    # re-casts to bf16 anyway. The norm reduction itself accumulates in f32.
    out_emb = output["next_token_emb"]
    in_emb = output["current_token_emb"]
    mask = output["current_token_mask"]
    ids = output["current_token_ids"]

    from recommendations_tpu.nn.functional import l2_normalize_f32acc as _l2n

    out_emb = _l2n(out_emb)
    in_emb = _l2n(in_emb)

    b, s = mask.shape
    k_heads = len(lookahead)
    assert out_emb.shape[1] == s + 1 and out_emb.shape[2] == k_heads

    # --- streaming logQ (training only; the reference also updates during
    # val as a side effect of sharing the helper — wrapper.py:132-136 —
    # which silently skews the estimator with val data)
    if training:
        logq_state = logq_update(logq_state, ids, ~mask, batch_idx, alpha=alpha)
    logq = logq_correction(logq_state, ids)  # (B, S)

    offsets = sample_offsets(rng, lookahead)

    prefix = "train" if training else "val"
    chunk = train_mini_batch_size if (training and train_mini_batch_size > 0) else b
    chunk = min(chunk, b)
    starts = list(range(0, b, chunk))

    total_loss = jnp.asarray(0.0, jnp.float32)
    metrics: Metrics = {
        f"{prefix}_batch_size": jnp.asarray(b, jnp.float32),
        f"{prefix}_seq_len": jnp.asarray(s, jnp.float32),
    }

    for i in range(k_heads):
        off = offsets[i]
        # roll the candidate stream so slot (b, j) pairs with token (b, j+off)
        cand = jnp.roll(in_emb, -off, axis=1)
        cand_mask = jnp.roll(mask, -off, axis=1)
        cand_logq = jnp.roll(logq, -off, axis=1)
        pos_ok = jnp.arange(s)[None, :] < (s - off)
        valid = (~cand_mask) & pos_ok
        query = out_emb[:, :s, i, :]

        n_chunks = len(starts)
        # no jax.checkpoint needed: _ce_rows' custom VJP keeps only O(N)
        # residuals and recomputes the (N,N) logits GEMM in backward
        head_loss_fn = lambda *a: _head_loss(
            *a, temperature=temperature, beta=beta, fused_ce=fused_ce
        )
        if n_chunks > 1 and b % chunk == 0 and not fused_ce:
            # lax.scan serializes the chunks: a python loop leaves XLA free to
            # schedule every chunk's (N,N) tile with overlapping liveness —
            # at the prod scale point (chunk·S = 16K) that is 512 MB/tile x
            # heads x chunks of HLO temps and an HBM OOM.  scan bounds the
            # live set to one chunk in forward AND backward.
            # With fused_ce the (N, N) tile never reaches HBM (ops/fused_ce
            # keeps it in VMEM scratch), so the memory argument vanishes and
            # the python-loop unroll below skips the while-loop glue
            # (~0.25 ms per head x chunk on this runtime, trace-measured).
            xs = tuple(
                a.reshape((n_chunks, chunk) + a.shape[1:])
                for a in (query, cand, valid, cand_logq)
            )

            def chunk_body(acc, x):
                ce_loss, m = head_loss_fn(*x)
                return acc + ce_loss, m

            head_total, ms = jax.lax.scan(
                chunk_body, jnp.asarray(0.0, jnp.float32), xs
            )
            head_loss = head_total / n_chunks
            rank_all = ms.pop("_rank").reshape(-1)
            w_all = ms.pop("_weight").reshape(-1)
            min_neg = jnp.min(ms.pop("_min_neg"))
            agg = {key: jnp.mean(val, axis=0) for key, val in ms.items()}
        else:
            head_loss = jnp.asarray(0.0, jnp.float32)
            agg = {}
            ranks, weights, min_negs = [], [], []
            for cs in starts:
                ce_loss, m = head_loss_fn(
                    query[cs : cs + chunk],
                    cand[cs : cs + chunk],
                    valid[cs : cs + chunk],
                    cand_logq[cs : cs + chunk],
                )
                head_loss = head_loss + ce_loss / n_chunks
                ranks.append(m.pop("_rank"))
                weights.append(m.pop("_weight"))
                min_negs.append(m.pop("_min_neg"))
                for key, val in m.items():
                    agg[key] = agg.get(key, 0.0) + val / n_chunks
            rank_all = jnp.concatenate(ranks)
            w_all = jnp.concatenate(weights)
            min_neg = jnp.min(jnp.stack(min_negs))

        total_loss = total_loss + head_loss
        used = jnp.maximum(jnp.sum(w_all), 1.0)
        for k in metrics_k_all:
            k_eff = jnp.minimum(k, min_neg)
            hit = (rank_all < k_eff).astype(jnp.float32)
            agg[f"hit_rate_at_{k}"] = jnp.sum(hit * w_all) / used

        # per-head metric keys use the head index (the sampled offset is a
        # traced value, so it is reported as a metric rather than a key —
        # deviation from the reference's f'..._offset_{offset}' names)
        agg["offset"] = off.astype(jnp.float32)
        for key, val in agg.items():
            metrics[f"{prefix}_{key}_lookahead_{i}"] = val

    metrics[f"{prefix}_loss"] = total_loss
    return total_loss, metrics, logq_state
