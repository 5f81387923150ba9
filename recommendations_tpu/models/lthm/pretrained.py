"""Frozen pretrained compressed product-embedding module.

The TPU-native replacement for the reference's TorchScripted
``mask(x).sigmoid() * emb(x)`` artifact produced by
``embedding_module_gen.py:32-41`` and loaded at ``encoder.py:26-29``: a
KShift reconstruction table plus a KShift+MLP mask model whose parameters
live in the frozen ``constants`` collection (the train step never
differentiates them).  ``tools/embedding_module_gen.py`` trains and saves
these weights as an Orbax artifact; ``load_pretrained_constants`` splices
them into a model's variables.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from recommendations_tpu.nn.embeddings import kshift_row_indices
from recommendations_tpu.nn.functional import l2_normalize, quick_gelu


class PretrainedProductEmbedding(nn.Module):
    """out = sigmoid(mask_mlp(kshift_mask(x))) * kshift_emb(x), all frozen."""

    num_embeddings: int
    features: int
    num_shifts: int = 16
    normalize_output: bool = True
    mask_emb_dim: int = 4
    mask_hidden: int = 64
    # bf16 halves gathered-row bytes (row-transfer-bound); the module is
    # frozen so there is no precision concern for optimizer state
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        def const(name, shape):
            return self.variable(
                "constants",
                name,
                lambda: jax.random.normal(self.make_rng("params"), shape, jnp.float32),
            ).value

        emb_table = const("emb_table", (self.num_embeddings, self.features))
        mask_table = const("mask_table", (self.num_embeddings, self.mask_emb_dim))
        w1 = const("mask_w1", (self.mask_emb_dim, self.mask_hidden))
        b1 = self.variable(
            "constants", "mask_b1", lambda: jnp.zeros((self.mask_hidden,), jnp.float32)
        ).value
        w2 = const("mask_w2", (self.mask_hidden, 1))
        b2 = self.variable(
            "constants", "mask_b2", lambda: jnp.zeros((1,), jnp.float32)
        ).value

        if self.compute_dtype is not None:
            emb_table = emb_table.astype(self.compute_dtype)
        idx = kshift_row_indices(ids, self.num_embeddings, self.num_shifts)
        emb = jnp.take(emb_table, idx.astype(jnp.int32), axis=0).sum(axis=-2)
        emb = emb.astype(jnp.float32)
        if self.normalize_output:
            emb = l2_normalize(emb)
        else:
            emb = emb / jnp.sqrt(jnp.float32(self.num_shifts))

        midx = kshift_row_indices(ids, self.num_embeddings, 4)
        m = jnp.take(mask_table, midx.astype(jnp.int32), axis=0).sum(axis=-2)
        m = m / 2.0  # 1/sqrt(4)
        gate = jax.nn.sigmoid(quick_gelu(m @ w1 + b1) @ w2 + b2)
        return gate * emb


def load_pretrained_constants(variables: Dict[str, Any], artifact: Dict[str, Any], module_path: str = "product_emb_module") -> Dict[str, Any]:
    """Replace the randomly-initialised constants of a
    PretrainedProductEmbedding submodule with trained weights."""
    import flax

    flat = flax.traverse_util.flatten_dict(variables["constants"])
    art = {k: jnp.asarray(v) for k, v in artifact.items()}
    for key in list(flat):
        if key[0] == module_path and key[-1] in art:
            flat[key] = art[key[-1]]
    new_constants = flax.traverse_util.unflatten_dict(flat)
    out = dict(variables)
    out["constants"] = new_constants
    return out
