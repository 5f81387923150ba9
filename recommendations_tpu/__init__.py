"""recommendations_tpu — a TPU-native sequence-recommendation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``ranjanbalappa-nykaa/recommendations`` (the reference), redesigned TPU-first:

- SPMD over a ``jax.sharding.Mesh`` (data / model / expert axes) instead of
  Ray + torch DDP (reference ``commons/training_strategy/accelerate_training_strategy.py``).
- bf16 compute policy instead of AMP autocast.
- Functional, jit-compiled train steps with in-step collectives instead of
  NCCL all-reduce.
- Row-sharded embedding tables with ICI collectives (a capability the
  reference only approximates via hash-compression).

64-bit integers are enabled globally: the feature-hashing contract
(xxh64(value) - 2**63, see reference ``commons/feature_utils.py:40-46``)
produces IDs spanning the full int64 range, and all on-device hash math
(KShift bit rotations, remainder hashing) must preserve them.  Float dtypes
are always explicit in this codebase, so enabling x64 does not leak float64
into the compute path.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: first TPU compile of the train step is slow
# (minutes over remote-compile links); later processes reuse it.  Opt out
# with RECS_TPU_NO_COMPILE_CACHE=1.
if not os.environ.get("RECS_TPU_NO_COMPILE_CACHE"):
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "JAX_COMPILATION_CACHE_DIR", "/tmp/recs_tpu_jax_cache"
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

# Some TPU plugin bootstraps override platform selection in-process at
# interpreter start; re-apply the user's JAX_PLATFORMS choice so
# `JAX_PLATFORMS=cpu python main_training.py ...` behaves as documented.
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    try:
        jax.config.update("jax_platforms", _plat)
    except Exception:
        pass

__version__ = "0.1.0"
