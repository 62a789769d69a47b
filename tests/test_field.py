"""Field-layer parity tests: jnp u32-limb Goldilocks vs exact Python ints.

Mirrors reference unit tests at src/field/goldilocks/mod.rs:614-679 and the
MixedGL vs scalar cross-checks in the per-ISA impl files.
"""

import numpy as np
import pytest

from boojum_tpu.field import extension as ext
from boojum_tpu.field import goldilocks as gl

P = gl.ORDER
RNG = np.random.default_rng(0xB00)


def rand_u64(n, include_edge=True):
    vals = RNG.integers(0, P, size=n, dtype=np.uint64)
    if include_edge and n >= 8:
        vals[:8] = [0, 1, 2, P - 1, P - 2, 0xFFFFFFFF, P - 0xFFFFFFFF, (1 << 63)]
        vals[:8] = np.array(vals[:8], dtype=np.uint64) % np.uint64(P)
    return vals


def test_roundtrip():
    x = rand_u64(1024)
    assert np.array_equal(gl.to_u64(gl.from_u64(x)), x)


@pytest.mark.parametrize("op,sop", [
    ("add", lambda a, b: (a + b) % P),
    ("sub", lambda a, b: (a - b) % P),
    ("mul", lambda a, b: (a * b) % P),
])
def test_binary_ops(op, sop):
    a = rand_u64(4096)
    b = rand_u64(4096)
    b[:8] = a[:8][::-1].copy()  # edge-vs-edge combos
    got = gl.to_u64(getattr(gl, op)(gl.from_u64(a), gl.from_u64(b)))
    want = np.array([sop(int(x), int(y)) for x, y in zip(a, b)], dtype=np.uint64)
    assert np.array_equal(got, want), f"{op} mismatch"


def test_mul_exhaustive_edges():
    edge = [0, 1, 2, 7, P - 1, P - 2, 0xFFFFFFFF, 0x100000000, P - 0xFFFFFFFF,
            (1 << 63) % P, gl.RADIX_2_SUBGROUP_GENERATOR]
    a = np.array([x for x in edge for _ in edge], dtype=np.uint64)
    b = np.array([y for _ in edge for y in edge], dtype=np.uint64)
    got = gl.to_u64(gl.mul(gl.from_u64(a), gl.from_u64(b)))
    want = np.array([(int(x) * int(y)) % P for x, y in zip(a, b)], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_neg_double():
    a = rand_u64(512)
    assert np.array_equal(gl.to_u64(gl.neg(gl.from_u64(a))),
                          np.array([(-int(x)) % P for x in a], dtype=np.uint64))
    assert np.array_equal(gl.to_u64(gl.double(gl.from_u64(a))),
                          np.array([(2 * int(x)) % P for x in a], dtype=np.uint64))


def test_mul_by_u32():
    a = rand_u64(512)
    for k in [0, 1, 7, 0xFFFFFFFF]:
        got = gl.to_u64(gl.mul_by_u32(gl.from_u64(a), k))
        want = np.array([(int(x) * k) % P for x in a], dtype=np.uint64)
        assert np.array_equal(got, want)


def test_inverse():
    a = rand_u64(64)
    a[a == 0] = 1
    inv = gl.to_u64(gl.inverse(gl.from_u64(a)))
    for x, y in zip(a, inv):
        assert (int(x) * int(y)) % P == 1


def test_batch_inverse():
    a = rand_u64(257)
    a[a == 0] = 1
    inv = gl.to_u64(gl.batch_inverse(gl.from_u64(a)))
    for x, y in zip(a, inv):
        assert (int(x) * int(y)) % P == 1


def test_pow_const():
    a = rand_u64(32)
    for e in [0, 1, 2, 5, 1023, P - 2]:
        got = gl.to_u64(gl.pow_const(gl.from_u64(a), e))
        want = np.array([pow(int(x), e, P) for x in a], dtype=np.uint64)
        assert np.array_equal(got, want)


def test_field_constants():
    # reference src/field/goldilocks/mod.rs:110-116
    assert gl.ORDER == 0xFFFFFFFF00000001
    assert pow(gl.RADIX_2_SUBGROUP_GENERATOR, 1 << 32, P) == 1
    assert pow(gl.RADIX_2_SUBGROUP_GENERATOR, 1 << 31, P) == P - 1
    assert gl.domain_generator(1) == P - 1
    g16 = gl.domain_generator(4)
    assert pow(g16, 16, P) == 1 and pow(g16, 8, P) != 1


# ---------------------------------------------------------------------------
# Extension field
# ---------------------------------------------------------------------------


def rand_ext(n):
    return rand_u64(n), rand_u64(n)


def test_ext_mul_matches_scalar():
    a0, a1 = rand_ext(512)
    b0, b1 = rand_ext(512)
    got = ext.to_u64_pair(ext.mul(ext.from_u64_pair(a0, a1), ext.from_u64_pair(b0, b1)))
    for i in range(512):
        want = ext.s2_mul((int(a0[i]), int(a1[i])), (int(b0[i]), int(b1[i])))
        assert (int(got[0][i]), int(got[1][i])) == want


def test_ext_inverse():
    a0, a1 = rand_ext(64)
    a0[0], a1[0] = 5, 0
    x = ext.from_u64_pair(a0, a1)
    inv = ext.inverse(x)
    prod = ext.to_u64_pair(ext.mul(x, inv))
    assert np.all(prod[0] == 1) and np.all(prod[1] == 0)


def test_ext_batch_inverse():
    a0, a1 = rand_ext(100)
    a1[(a0 == 0) & (a1 == 0)] = 1  # avoid the zero element
    x = ext.from_u64_pair(a0, a1)
    inv = ext.batch_inverse(x)
    prod = ext.to_u64_pair(ext.mul(x, inv))
    assert np.all(prod[0] == 1) and np.all(prod[1] == 0)


def test_ext_scalar_ops():
    a, b = (3, 4), (5, 6)
    assert ext.s2_mul(a, b) == ((3 * 5 + 7 * 4 * 6) % P, (3 * 6 + 4 * 5) % P)
    assert ext.s2_mul(a, ext.s2_inv(a)) == (1, 0)
    # u^2 = 7
    assert ext.s2_mul((0, 1), (0, 1)) == (7, 0)


# ---------------------------------------------------------------------------
# Lazy-reduction ops: any-u64 representatives, congruent mod p, < 2^64 out
# ---------------------------------------------------------------------------


def rand_full_u64(n):
    """Arbitrary u64 values INCLUDING non-canonical (>= p) representatives."""
    vals = RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)
    if n >= 10:
        vals[:10] = [0, 1, P - 1, P, P + 1, (1 << 64) - 1, (1 << 64) - 2,
                     0xFFFFFFFF, (1 << 64) - 0xFFFFFFFF,
                     np.uint64(0xFFFFFFFF00000000)]
    return vals


def _from_raw_u64(x):
    import jax.numpy as jnp
    x = np.asarray(x, np.uint64)
    return gl.GL(jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
                 jnp.asarray((x >> np.uint64(32)).astype(np.uint32)))


def test_add_lazy_congruence():
    a = rand_full_u64(4096)
    b = rand_full_u64(4096)
    b[:10] = a[:10][::-1].copy()
    got = gl.to_u64(gl.add_lazy(_from_raw_u64(a), _from_raw_u64(b)))
    for x, y, g in zip(a, b, got):
        assert int(g) % P == (int(x) + int(y)) % P


def test_mul_lazy_congruence():
    a = rand_full_u64(4096)
    b = rand_full_u64(4096)
    b[:10] = a[:10][::-1].copy()
    got = gl.to_u64(gl.mul_lazy(_from_raw_u64(a), _from_raw_u64(b)))
    for x, y, g in zip(a, b, got):
        assert int(g) % P == (int(x) * int(y)) % P


def test_square_lazy_congruence():
    a = rand_full_u64(4096)
    got = gl.to_u64(gl.square_lazy(_from_raw_u64(a)))
    for x, g in zip(a, got):
        assert int(g) % P == (int(x) * int(x)) % P


def test_mul_pow2_lazy_congruence():
    a = rand_full_u64(2048)
    for s in (0, 1, 3, 8, 16, 23, 31):
        got = gl.to_u64(gl.mul_pow2_lazy(_from_raw_u64(a), s))
        for x, g in zip(a, got):
            assert int(g) % P == (int(x) << s) % P, (hex(int(x)), s)


def test_canonicalize_lazy():
    a = rand_full_u64(4096)
    got = gl.to_u64(gl.canonicalize(_from_raw_u64(a)))
    want = a % np.uint64(P)
    assert np.array_equal(got, want)


def test_canonical_ops_accept_lazy_inputs():
    a = rand_full_u64(2048)
    b = rand_full_u64(2048)
    ga, gb = _from_raw_u64(a), _from_raw_u64(b)
    add = gl.to_u64(gl.add(ga, gb))
    mul = gl.to_u64(gl.mul(ga, gb))
    for x, y, s, m in zip(a, b, add, mul):
        assert int(s) == (int(x) + int(y)) % P
        assert int(m) == (int(x) * int(y)) % P
