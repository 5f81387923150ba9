"""Native batch hasher vs python-xxhash golden values."""

import numpy as np
import pytest
import xxhash

native = pytest.importorskip("recommendations_tpu.native").fasthash

from recommendations_tpu.features.hashing import hash_string_to_long


@pytest.mark.parametrize(
    "s",
    [b"", b"a", b"abc", b"1234", b"12345678", b"123456789012",
     b"a-longer-string-over-32-bytes-for-the-stripe-loop!!", b"\x00\xff\x80"],
)
@pytest.mark.parametrize("seed", [0, 1, 123456789])
def test_xxh64_matches_reference_impl(s, seed):
    assert native.xxh64(s, seed) == xxhash.xxh64(s, seed).intdigest()


@pytest.mark.parametrize("s", [b"", b"abc", b"0123456789abcdef0123", b"\xde\xad"])
@pytest.mark.parametrize("seed", [0, 77])
def test_xxh32_matches_reference_impl(s, seed):
    assert native.xxh32(s, seed) == xxhash.xxh32(s, seed).intdigest()


def test_batch_hash_matches_scalar_contract():
    vals = ["sku_1", "SKU_2", "", "日本語テスト", "x" * 100]
    seed = 424242
    got = native.hash_strings_to_long(vals, seed, value_to_lower=False)
    want = np.array([hash_string_to_long(v, seed, False) for v in vals])
    np.testing.assert_array_equal(got, want)

    got_l = native.hash_strings_to_long(vals, seed, value_to_lower=True)
    want_l = np.array([hash_string_to_long(v, seed, True) for v in vals])
    np.testing.assert_array_equal(got_l, want_l)


def test_hashing_module_uses_native_when_available():
    from recommendations_tpu.features import hashing

    vals = [f"id_{i}" for i in range(1000)]
    got = hashing.hash_strings_to_long(vals, 7, False)
    want = np.array([hash_string_to_long(v, 7, False) for v in vals])
    np.testing.assert_array_equal(got, want)
