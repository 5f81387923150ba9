"""Transformer block, MoE feed-forward, and the residual stack.

Re-design of reference ``commons/transformers/layers.py:87-136,271-421``.

TPU-first choices:
- ``MoELinear`` computes every expert densely (as the reference does,
  ``transformers/layers.py:130-136``) but as ONE batched einsum over stacked
  expert weights — a single large MXU matmul instead of a python loop of E
  small ones.  Expert-parallel sharding (``expert`` mesh axis) only requires
  annotating the stacked weights.
- Static sparse-token subsampling keeps a per-depth pseudo-random token
  subset; the keep-set is computed at module-construction time with a seeded
  NumPy RNG, so gathers have static shape (the reference filters ``idx < T``
  at runtime, ``transformers/layers.py:385-388`` — T is static under jit, so
  the filter happens at trace time here).
- Gradient checkpointing is ``jax.checkpoint`` applied per block by
  ``TransformerStack`` (reference uses ``torch.utils.checkpoint`` per block,
  ``transformers/layers.py:375-380``).

Deviation from the reference (intent over letter): the reference's
``QueryTower.transformer_encoder`` computes ``x = x + block(x)`` where
``block`` already returns ``x + attn + mlp`` — doubling the residual stream
every layer (×2¹⁶ at its 16-layer config), an evident defect in never-run
code (SURVEY.md §2.5).  ``TransformerStack`` applies standard pre-LN residual
blocks: ``x = block(x)``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

def _flash_bias_ok(seq_len: int) -> bool:
    from recommendations_tpu.ops.fused_attention import fused_flash_bias_recommended

    return fused_flash_bias_recommended(seq_len)


from recommendations_tpu.nn.attention import (
    MultiHeadAttention,
    MultiQueryAttention,
    causal_mask,
)
from recommendations_tpu.nn.functional import gelu_tanh


@dataclasses.dataclass(frozen=True)
class MoESpec:
    """MoE rotator config — reference ``commons/transformers/configs.py:10-15``."""

    num_experts: int
    proj_features: int
    ff_mult_factor: float
    gate_sizes: Tuple[int, ...] = ()
    top_k: Optional[int] = None


class MoELinear(nn.Module):
    """Softmax-gated dense-compute mixture of expert 2-layer MLPs.

    Reference ``commons/transformers/layers.py:101-136``: gate = MLP(x) /
    sqrt(in_features), optional top-k mask, softmax; every expert computed and
    mixed.  Experts are stacked into (E, in, proj) / (E, proj, out) tensors →
    two einsums on the MXU.
    """

    out_features: int
    proj_features: int
    num_experts: int
    use_bias: bool = True
    top_k: Optional[int] = None
    gate_sizes: Tuple[int, ...] = ()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        gates = x
        for i, g in enumerate(self.gate_sizes):
            gates = nn.Dense(g, use_bias=self.use_bias, dtype=self.dtype, name=f"gate_{i}")(gates)
            gates = gelu_tanh(gates)
        gates = nn.Dense(
            self.num_experts, use_bias=self.use_bias, dtype=self.dtype, name="gate_out"
        )(gates)
        gates = gates / jnp.sqrt(jnp.asarray(in_features, jnp.float32)).astype(gates.dtype)

        if self.top_k is not None:
            k = min(self.top_k, self.num_experts)
            vals = jax.lax.top_k(gates, k)[0]
            thresh = vals[..., -1:]
            gates = jnp.where(gates < thresh, -jnp.inf, gates)
        gates = jax.nn.softmax(gates.astype(jnp.float32), axis=-1).astype(x.dtype)

        kernel_init = nn.initializers.lecun_normal()
        w1 = self.param(
            "w1", kernel_init, (self.num_experts, in_features, self.proj_features)
        ).astype(x.dtype)
        b1 = self.param("b1", nn.initializers.zeros, (self.num_experts, self.proj_features)).astype(x.dtype)
        w2 = self.param(
            "w2", kernel_init, (self.num_experts, self.proj_features, self.out_features)
        ).astype(x.dtype)
        b2 = self.param("b2", nn.initializers.zeros, (self.num_experts, self.out_features)).astype(x.dtype)

        h = jnp.einsum("...i,eij->...ej", x, w1, preferred_element_type=jnp.float32).astype(x.dtype) + b1
        h = gelu_tanh(h)
        out = jnp.einsum("...ej,ejo->...eo", h, w2, preferred_element_type=jnp.float32).astype(x.dtype) + b2
        return jnp.einsum("...e,...eo->...o", gates, out)


def _sparse_keep_sets(
    max_block_size: int, sparsity_factor: float, seed: int, n_cls: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Static per-depth keep/skip index sets.

    Reference ``transformers/layers.py:352-367``: deterministic permutation
    seeded per depth; the first ``n_cls`` positions always kept.
    """
    n_non_zeros = int(sparsity_factor * max_block_size)
    rng = np.random.RandomState(seed)
    perm = rng.permutation(max_block_size)
    full = np.concatenate([np.arange(n_cls, dtype=np.int64), perm[n_cls:]])
    idx = np.sort(full[:n_non_zeros])
    not_idx = np.sort(full[n_non_zeros:])
    return idx, not_idx


class TransformerBlock(nn.Module):
    """Pre-LN residual block: x + attn(ln(x)); + mlp(ln(x)).

    Reference ``commons/transformers/layers.py:323-420``.  ``rotator`` is
    either an MLP hidden multiplier (float) or an :class:`MoESpec`.
    """

    n_embd: int
    n_head: int
    attn_type: str = "multi_head"  # 'multi_head' | 'multi_query'
    is_causal: bool = False
    use_bias: bool = True
    dropout: float = 0.0
    attn_dropout: float = 0.0
    pos_bias_window: Optional[int] = None
    rotator: Union[float, MoESpec] = 4.0
    # static sparse-token subsampling
    is_sparse_attn: bool = False
    max_block_size: Optional[int] = None
    sparsity_factor: float = 0.5
    sparse_seed: int = 0
    n_cls: int = 0
    use_flash: bool = False
    # context-parallel ring attention: seq dim sharded over mesh[ring_axis]
    use_ring: bool = False
    mesh: Optional[object] = None
    ring_axis: str = "model"
    data_axis: str = "data"
    dtype: Optional[jnp.dtype] = None

    def _attn(self):
        cls = MultiQueryAttention if self.attn_type == "multi_query" else MultiHeadAttention
        return cls(
            n_embd=self.n_embd,
            n_head=self.n_head,
            attn_dropout=self.attn_dropout,
            dropout=self.dropout,
            use_bias=self.use_bias,
            pos_bias_window=self.pos_bias_window,
            use_flash=self.use_flash,
            use_ring=self.use_ring,
            mesh=self.mesh,
            ring_axis=self.ring_axis,
            data_axis=self.data_axis,
            dtype=self.dtype,
            name="attn",
        )

    def _mlp(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if isinstance(self.rotator, MoESpec):
            spec = self.rotator
            hidden = int(spec.ff_mult_factor * self.n_embd)
            x = MoELinear(
                hidden,
                proj_features=spec.proj_features,
                num_experts=spec.num_experts,
                use_bias=self.use_bias,
                top_k=spec.top_k,
                gate_sizes=tuple(spec.gate_sizes),
                dtype=self.dtype,
                name="moe_fc",
            )(x)
            x = gelu_tanh(x)
            x = MoELinear(
                self.n_embd,
                proj_features=spec.proj_features,
                num_experts=spec.num_experts,
                use_bias=self.use_bias,
                top_k=spec.top_k,
                gate_sizes=tuple(spec.gate_sizes),
                dtype=self.dtype,
                name="moe_proj",
            )(x)
        else:
            hidden = int(float(self.rotator) * self.n_embd)
            x = nn.Dense(hidden, use_bias=self.use_bias, dtype=self.dtype, name="c_fc")(x)
            x = gelu_tanh(x)
            x = nn.Dense(self.n_embd, use_bias=self.use_bias, dtype=self.dtype, name="c_proj")(x)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        seq_len = x.shape[1]
        x_orig = x
        idx = not_idx = None
        if self.is_sparse_attn:
            assert self.max_block_size is not None
            idx_np, not_idx_np = _sparse_keep_sets(
                self.max_block_size, self.sparsity_factor, self.sparse_seed, self.n_cls
            )
            idx = idx_np[idx_np < seq_len]
            not_idx = not_idx_np[not_idx_np < seq_len]
            null = nn.Dense(self.n_embd, use_bias=self.use_bias, dtype=self.dtype, name="null_connector")
            if len(idx) <= 1:
                return x_orig + null(x_orig)
            x = jnp.take(x, idx, axis=1)
            if attn_mask is not None:
                attn_mask = attn_mask[:, :, idx, :][:, :, :, idx]

        # flash/ring paths handle causality inside the kernel; the XLA path
        # gets the additive mask.  Ring carries the relative-position bias
        # natively (per-hop Toeplitz gather, parallel/ring_attention) —
        # pos_bias no longer forces the XLA fallback (VERDICT r3 #3); the
        # stack asserts the UNPADDED length fits the table (ring padding may
        # overhang it, those rows clip and never contribute).
        ring_ok = (
            self.use_ring
            and self.mesh is not None
            and attn_mask is None
            and self.mesh.shape.get(self.ring_axis, 1) > 1
        )
        flash_ok = ring_ok or (
            self.use_flash
            and attn_mask is None
            and (
                self.pos_bias_window is None
                # the fused kernel applies the relative-position bias
                # in-kernel when the table covers the sequence AND the
                # length is in the kernel's measured winning range
                or (
                    x.shape[1] <= self.pos_bias_window
                    and _flash_bias_ok(x.shape[1])
                )
            )
        )
        if self.is_causal and not flash_ok:
            cm = causal_mask(x.shape[1])
            attn_mask = cm if attn_mask is None else attn_mask + cm

        ln1 = nn.LayerNorm(use_bias=self.use_bias, epsilon=1e-5, dtype=self.dtype, name="ln_1")
        ln2 = nn.LayerNorm(use_bias=self.use_bias, epsilon=1e-5, dtype=self.dtype, name="ln_2")
        x = x + self._attn()(
            ln1(x), mask=attn_mask, deterministic=deterministic,
            causal=self.is_causal and flash_ok,
        )
        x = x + self._mlp(ln2(x), deterministic)

        if not self.is_sparse_attn:
            return x
        out = jnp.zeros_like(x_orig)
        out = out.at[:, idx].set(x)
        skipped = jnp.take(x_orig, not_idx, axis=1)
        out = out.at[:, not_idx].set(skipped + null(skipped))
        return out


class TransformerStack(nn.Module):
    """Input dropout + N transformer blocks, optional per-block remat.

    Reference ``models/lthm/sequence/query_tower.py:36-46,132-137`` (with the
    residual-doubling defect fixed — see module docstring).
    """

    num_layers: int
    n_embd: int
    n_head: int
    attn_type: str = "multi_head"
    is_causal: bool = False
    use_bias: bool = True
    dropout: float = 0.0
    attn_dropout: float = 0.0
    pos_bias_window: Optional[int] = None
    rotator: Union[float, MoESpec] = 4.0
    is_sparse_attn: bool = False
    max_block_size: Optional[int] = None
    sparsity_factor: float = 0.5
    n_cls: int = 0
    use_flash: bool = False
    # context parallelism: shard the sequence dim over mesh[ring_axis]; every
    # positionwise op (LN/Dense/MLP) splits for free via the sharding
    # constraint below, attention runs the ring schedule
    use_ring: bool = False
    mesh: Optional[object] = None
    ring_axis: str = "model"
    data_axis: str = "data"
    remat: bool = False
    # 'full' recomputes everything; 'dots' saves ALL matmul outputs — on the
    # XLA attention path that includes the (B,H,S,S) logits (1.27 GB/layer at
    # the prod scale point: 16 layers OOM'd a 16G chip); 'dots_no_batch'
    # (default) saves only batch-dim-free dots — the projection/MLP GEMMs —
    # and recomputes attention logits in backward, bounding saved bytes to
    # ~B*T*5d per layer regardless of S
    remat_policy: str = "dots_no_batch"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        ring_on = (
            self.use_ring
            and self.mesh is not None
            and self.mesh.shape.get(self.ring_axis, 1) > 1
        )
        t_orig = x.shape[1]
        if ring_on:
            from jax.sharding import NamedSharding, PartitionSpec as P

            assert attn_mask is None, "sequence_parallel requires attn_mask=None"
            assert self.is_causal, "sequence_parallel requires is_causal"
            if self.pos_bias_window is not None and t_orig > self.pos_bias_window:
                raise ValueError(
                    f"seq {t_orig} exceeds the pos-bias table window "
                    f"{self.pos_bias_window}"
                )
            # pad T to a ring multiple so the constraint (and every block's
            # ring) sees even shards; pad sits at the END, so under causal
            # masking no real row reads it — sliced off at exit
            n_ring = self.mesh.shape[self.ring_axis]
            t_pad = ((t_orig + n_ring - 1) // n_ring) * n_ring
            if t_pad != t_orig:
                x = jnp.pad(x, ((0, 0), (0, t_pad - t_orig), (0, 0)))
            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, P(self.data_axis, self.ring_axis, None))
            )
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        block_cls = TransformerBlock
        if self.remat:
            cp = jax.checkpoint_policies
            # flash kernel outputs (o, lse) are named saveables: the dots_*
            # policies only match dot_general, so without the names the
            # backward re-runs the whole pallas forward per block
            flash_names = cp.save_only_these_names("flash_out", "flash_lse")
            policy = {
                "dots": cp.save_from_both_policies(cp.dots_saveable, flash_names),
                "dots_no_batch": cp.save_from_both_policies(
                    cp.dots_with_no_batch_dims_saveable, flash_names
                ),
                "full": None,
            }[self.remat_policy]
            block_cls = nn.remat(TransformerBlock, static_argnums=(3,), policy=policy)
        for depth in range(self.num_layers):
            block = block_cls(
                n_embd=self.n_embd,
                n_head=self.n_head,
                attn_type=self.attn_type,
                is_causal=self.is_causal,
                use_bias=self.use_bias,
                dropout=self.dropout,
                attn_dropout=self.attn_dropout,
                pos_bias_window=self.pos_bias_window,
                rotator=self.rotator,
                is_sparse_attn=self.is_sparse_attn,
                max_block_size=self.max_block_size,
                sparsity_factor=self.sparsity_factor,
                sparse_seed=depth,
                n_cls=self.n_cls,
                use_flash=self.use_flash,
                use_ring=ring_on,
                mesh=self.mesh if ring_on else None,
                ring_axis=self.ring_axis,
                data_axis=self.data_axis,
                dtype=self.dtype,
                name=f"block_{depth}",
            )
            x = block(x, attn_mask, deterministic)
        if ring_on and x.shape[1] != t_orig:
            x = x[:, :t_orig]
        return x
