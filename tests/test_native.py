"""Cross-validate the native C++ witness-engine kernels against exact
Python-int arithmetic and the numpy (npgl) paths.

VERDICT round-1 item 9: native/witness_engine.cpp carried only its own
self_test; a toolchain-dependent miscompile would pass CI (numpy fallback)
and fail only in production. These tests pin every ctypes entry point to the
exact semantics on random + edge-case vectors whenever g++ built the lib.
"""

import numpy as np
import pytest

from boojum_tpu.utils import native, npgl

P = npgl.ORDER

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native witness engine not built (no g++)")


def _edge_and_random(n=4096, seed=11):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, P, size=n, dtype=np.uint64)
    edges = np.array([0, 1, 2, P - 1, P - 2, 0xFFFF_FFFF, 0x1_0000_0000,
                      P >> 1, (1 << 63) % P, 0xFFFF_FFFE_0000_0002 % P],
                     dtype=np.uint64)
    return np.concatenate([edges, vals])


def test_native_mul_matches_exact():
    a = _edge_and_random(seed=1)
    b = _edge_and_random(seed=2)[::-1].copy()
    out = native.mul(a, b)
    exact = np.array([(int(x) * int(y)) % P for x, y in zip(a, b)],
                     dtype=np.uint64)
    np.testing.assert_array_equal(out, exact)


def test_native_add_matches_exact():
    a = _edge_and_random(seed=3)
    b = _edge_and_random(seed=4)[::-1].copy()
    out = native.add(a, b)
    exact = np.array([(int(x) + int(y)) % P for x, y in zip(a, b)],
                     dtype=np.uint64)
    np.testing.assert_array_equal(out, exact)


def test_native_batch_inv_matches_exact():
    a = _edge_and_random(seed=5)
    a = a[a != 0]
    out = native.batch_inv(a)
    exact = np.array([pow(int(x), P - 2, P) for x in a], dtype=np.uint64)
    np.testing.assert_array_equal(out, exact)


def test_native_powers_matches_exact():
    for base in (7, P - 1, 0x185629DCDA58878C, 1):
        out = native.powers(base, 257)
        exact = np.array([pow(base, i, P) for i in range(257)],
                         dtype=np.uint64)
        np.testing.assert_array_equal(out, exact)


def test_native_agrees_with_numpy_paths():
    """The npgl numpy implementations and the native kernels must agree on
    large random vectors (both are used interchangeably at runtime)."""
    rng = np.random.default_rng(99)
    a = rng.integers(0, P, size=1 << 14, dtype=np.uint64)
    b = rng.integers(0, P, size=1 << 14, dtype=np.uint64)
    # bypass npgl.mul's native dispatch: reimplement via the numpy kernels
    s = a + b
    s = np.where(s < a, s + np.uint64(0xFFFF_FFFF), s)
    np_add = np.where(s >= np.uint64(P), s - np.uint64(P), s)
    np.testing.assert_array_equal(native.add(a, b), np_add)
    hi, lo = npgl._mul_wide(a, b)
    np_mul = npgl._reduce128(hi, lo)
    np.testing.assert_array_equal(native.mul(a, b), np_mul)
