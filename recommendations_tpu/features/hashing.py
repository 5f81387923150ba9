"""xxhash-based feature hashing.

Contract (reference ``commons/feature_utils.py:36-46``):
- seed for a feature = ``xxh32(lowercase(feature_name), 0)``
- value hash = ``xxh64(str(value), seed) - 2**63``  → full int64 range

This runs host-side in the input pipeline.  A C++ batch kernel
(``recommendations_tpu/native``) accelerates the vectorized path when built;
the python-xxhash C core is the fallback.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np
import xxhash

from recommendations_tpu.features.constants import MAX_LONG_VALUE_PLUS_ONE


def hash_feature_name_to_int(feature_name: str) -> int:
    return xxhash.xxh32(feature_name.lower(), 0).intdigest()


def hash_string_to_long(arg: str, seed: int, value_to_lower: bool) -> int:
    arg = str(arg)
    if value_to_lower:
        arg = arg.lower()
    return xxhash.xxh64(arg, seed).intdigest() - MAX_LONG_VALUE_PLUS_ONE


_native = None


def _load_native():
    global _native
    if _native is None:
        try:
            from recommendations_tpu.native import fasthash as _fh

            _native = _fh
        except Exception:
            _native = False
    return _native


def hash_strings_to_long(
    values: Iterable, seed: int, value_to_lower: bool
) -> np.ndarray:
    """Vectorized value hashing → int64 array."""
    native = _load_native()
    if native:
        return native.hash_strings_to_long(values, seed, value_to_lower)
    return np.fromiter(
        (hash_string_to_long(v, seed, value_to_lower) for v in values),
        dtype=np.int64,
    )
