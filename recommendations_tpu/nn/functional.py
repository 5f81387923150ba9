"""Stateless ops shared across the layer library.

Parity contracts (reference files cited per function) are re-expressed as
pure jnp; everything is jit-safe and static-shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702 x) — reference ``commons/layers.py:9-11``."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """GELU(approximate='tanh') — reference ``commons/transformers/layers.py:75``."""
    return jax.nn.gelu(x, approximate=True)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize(p=2) semantics: x / max(||x||, eps).

    Gradient-safe at x == 0: the max is taken on the *squared* norm before
    the sqrt, so the sqrt never sees 0 and d||x||/dx never produces NaN
    (exact-zero rows are routine here — masked product embeddings are zeroed,
    reference ``product_tower.py:59``).
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return x / norm


def l2_normalize_f32acc(
    x: jnp.ndarray, axis: int = -1, eps: float = 1e-12
) -> jnp.ndarray:
    """``l2_normalize`` with the norm reduction in f32 but the OUTPUT kept in
    the input dtype — avoids materializing an f32 copy of large low-precision
    tensors (the LTHM loss normalizes a (B, S, K, D) bf16 tensor; an f32
    round-trip costs two full HBM passes it immediately undoes)."""
    xf = x.astype(jnp.float32)
    sq = jnp.sum(xf * xf, axis=axis, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return (xf / norm).astype(x.dtype)


@jax.custom_vjp
def cap_gradients(x: jnp.ndarray) -> jnp.ndarray:
    """Identity forward; L2-normalizes the cotangent in backward.

    Reference ``commons/functional.py:4-28`` (``_Capradients``): used to
    balance gradients flowing into a shared trunk under multi-task losses.
    """
    return x


def _cap_fwd(x):
    return x, None


def _cap_bwd(_, g):
    norm = jnp.linalg.norm(g)
    return (g / jnp.maximum(norm, 1e-12),)


cap_gradients.defvjp(_cap_fwd, _cap_bwd)
