"""Native (C++) host-side kernels with build-on-first-import + ctypes.

``fasthash``: batch xxHash for the feature pipeline (see fasthash.cpp).
The build is cached next to the source; any failure degrades to the pure
python-xxhash path in ``features/hashing.py`` (which imports this lazily and
catches errors).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Iterable, Optional

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fasthash.cpp")
_SO = os.path.join(_DIR, "_fasthash.so")


def _build() -> None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC]
    logger.info("building native fasthash: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)


_build()
_lib = ctypes.CDLL(_SO)
_lib.hash_strings_to_long.argtypes = [
    ctypes.c_char_p,
    np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
    ctypes.c_int64,
    ctypes.c_uint64,
    np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
]
_lib.xxh64_single.restype = ctypes.c_uint64
_lib.xxh64_single.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_uint64]
_lib.xxh32_single.restype = ctypes.c_uint32
_lib.xxh32_single.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_uint32]


class fasthash:
    """Namespace mirroring features.hashing's vectorized API."""

    @staticmethod
    def hash_strings_to_long(values: Iterable, seed: int, value_to_lower: bool) -> np.ndarray:
        # lowercase in Python (unicode-aware, matching str.lower semantics of
        # the reference) before the C batch call
        if value_to_lower:
            encoded = [str(v).lower().encode("utf-8") for v in values]
        else:
            encoded = [str(v).encode("utf-8") for v in values]
        n = len(encoded)
        lengths = np.fromiter((len(e) for e in encoded), dtype=np.int64, count=n)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        buf = b"".join(encoded)
        out = np.empty(n, dtype=np.int64)
        _lib.hash_strings_to_long(buf, offsets, n, ctypes.c_uint64(seed), out)
        return out

    @staticmethod
    def xxh64(data: bytes, seed: int = 0) -> int:
        return int(_lib.xxh64_single(data, len(data), ctypes.c_uint64(seed)))

    @staticmethod
    def xxh32(data: bytes, seed: int = 0) -> int:
        return int(_lib.xxh32_single(data, len(data), ctypes.c_uint32(seed)))
