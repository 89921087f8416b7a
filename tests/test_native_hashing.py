"""native/ batch ID hashing: C++ path vs pure-Python fallback parity,
distribution sanity, and stability."""

import numpy as np
import pytest

from two_tower_models_tpu import native


def test_native_builds_or_falls_back():
    # On this container a C++ toolchain exists; elsewhere the fallback works.
    ids = np.arange(100, dtype=np.uint64)
    out = native.hash_ids(ids, 1024)
    assert out.dtype == np.int32
    assert out.min() >= 0 and out.max() < 1024


@pytest.mark.skipif(not native.native_available(), reason="no C++ toolchain")
def test_u64_native_matches_fallback():
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 2**63, size=10_000, dtype=np.uint64)
    a = native.hash_ids(ids, 65536)
    b = native.hash_ids(ids, 65536, force_fallback=True)
    np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not native.native_available(), reason="no C++ toolchain")
def test_strings_native_matches_fallback():
    keys = [f"user:{i}" for i in range(500)] + ["", "x", "exactly8", "longer-than-eight-bytes"]
    a = native.hash_strings(keys, 4096)
    b = native.hash_strings(keys, 4096, force_fallback=True)
    np.testing.assert_array_equal(a, b)


def test_stable_and_seeded():
    ids = np.arange(1000, dtype=np.uint64)
    a = native.hash_ids(ids, 4096, seed=1)
    b = native.hash_ids(ids, 4096, seed=1)
    c = native.hash_ids(ids, 4096, seed=2)
    np.testing.assert_array_equal(a, b)  # deterministic across calls
    assert (a != c).mean() > 0.9  # seed actually matters


def test_distribution_roughly_uniform():
    ids = np.arange(200_000, dtype=np.uint64)
    out = native.hash_ids(ids, 256)
    counts = np.bincount(out, minlength=256)
    expected = len(ids) / 256
    # chi-square-ish bound: all buckets within 15% of expectation
    assert counts.min() > expected * 0.85 and counts.max() < expected * 1.15


def test_shape_preserved():
    ids = np.arange(24, dtype=np.uint64).reshape(4, 6)
    out = native.hash_ids(ids, 128)
    assert out.shape == (4, 6)
