"""Mixed-precision policy.

The reference gates AMP fp16 via HF Accelerate and actually disables it for
LTHM due to instability (``hydra-configs/lthm_train.yaml:107-108``).  On TPU
the native policy is: parameters and optimizer state in float32, activations
and matmuls in bfloat16, reductions (losses, norms, softmax accumulators) in
float32.  No loss scaling is required for bf16.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        import jax

        def _cast(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(self.compute_dtype)
            return x

        return jax.tree_util.tree_map(_cast, tree)


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)
