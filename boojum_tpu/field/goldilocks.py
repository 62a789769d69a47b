"""Goldilocks field arithmetic on 32-bit limbs, TPU-native.

The field is F_p with p = 2^64 - 2^32 + 1 (the "Goldilocks" prime).
Reference behavior: /root/reference/src/field/goldilocks/mod.rs (constants at
:110-116, EPSILON reduction trick at :472-527, mul at :529-560).

TPU design: TPU integer datapaths are 32-bit, so a field element is a pair of
uint32 arrays ``(lo, hi)`` — the tensor lane dimension plays the role the
reference's SIMD ``MixedGL`` vector plays (the whole jnp array IS the vector).
All ops are elementwise, shape-polymorphic, jit/vmap-friendly, and keep the
canonical-representative invariant (value < p) on output.

The same functions trace on CPU (for tests, under
``--xla_force_host_platform_device_count``) and on TPU. These jnp versions are
the semantics-defining reference implementation; XLA fuses the limb arithmetic
into surrounding kernels, and Pallas twins exist where fusion is not enough
(:mod:`boojum_tpu.ntt.pallas_ntt`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32

# Field constants — must match reference src/field/goldilocks/mod.rs:110-116.
ORDER = 0xFFFF_FFFF_0000_0001  # p = 2^64 - 2^32 + 1
EPSILON = 0xFFFF_FFFF  # 2^32 - 1 = 2^64 mod p
MULTIPLICATIVE_GENERATOR = 7
TWO_ADICITY = 32
RADIX_2_SUBGROUP_GENERATOR = 0x185629DCDA58878C  # order 2^32 root of unity
CHAR_BITS = 64

P_LO = np.uint32(ORDER & 0xFFFF_FFFF)  # = 1
P_HI = np.uint32(ORDER >> 32)  # = 0xFFFFFFFF


class GL(NamedTuple):
    """A tensor of Goldilocks field elements as (lo, hi) uint32 limb arrays.

    NamedTuple => automatically a JAX pytree; shape/dtype live on the limbs.
    """

    lo: jax.Array
    hi: jax.Array

    @property
    def shape(self):
        return self.lo.shape

    @property
    def ndim(self):
        return self.lo.ndim

    def __getitem__(self, idx):  # type: ignore[override]
        return GL(self.lo[idx], self.hi[idx])

    def reshape(self, *shape):
        return GL(self.lo.reshape(*shape), self.hi.reshape(*shape))

    def astuple(self):
        return (self.lo, self.hi)


# ----------------------------------------------------------------------------
# Host-side conversion helpers (numpy, exact)
# ----------------------------------------------------------------------------


def from_u64(x) -> GL:
    """numpy/py-int array of u64 values -> GL limbs (device arrays)."""
    x = np.asarray(x, dtype=np.uint64)
    lo = (x & np.uint64(0xFFFF_FFFF)).astype(np.uint32)
    hi = (x >> np.uint64(32)).astype(np.uint32)
    return GL(jnp.asarray(lo), jnp.asarray(hi))


def to_u64(a: GL) -> np.ndarray:
    """GL -> numpy u64 array (host)."""
    lo = np.asarray(jax.device_get(a.lo), dtype=np.uint64)
    hi = np.asarray(jax.device_get(a.hi), dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def zeros(shape) -> GL:
    z = jnp.zeros(shape, dtype=U32)
    return GL(z, z)


def ones(shape) -> GL:
    return GL(jnp.ones(shape, dtype=U32), jnp.zeros(shape, dtype=U32))


def full(shape, value: int) -> GL:
    value %= ORDER
    return GL(
        jnp.full(shape, value & 0xFFFF_FFFF, dtype=U32),
        jnp.full(shape, value >> 32, dtype=U32),
    )


def broadcast_to(a: GL, shape) -> GL:
    return GL(jnp.broadcast_to(a.lo, shape), jnp.broadcast_to(a.hi, shape))


# ----------------------------------------------------------------------------
# u32/u64 primitive helpers (all elementwise on uint32 arrays)
# ----------------------------------------------------------------------------


def _mul32_wide(a, b):
    """32x32 -> 64-bit product as (hi, lo) uint32, via 16-bit limbs.

    TPU VPU has no widening 32-bit multiply; 16x16->32 products are exact in
    uint32. This is the analogue of the reference's u64 widening muls.
    """
    mask = U32(0xFFFF)
    al = a & mask
    ah = a >> 16
    bl = b & mask
    bh = b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = lh + hl
    mid_carry = (mid < lh).astype(U32)  # wrapped past 2^32
    mid_lo_shift = mid << 16
    lo = ll + mid_lo_shift
    lo_carry = (lo < ll).astype(U32)
    hi = hh + (mid >> 16) + (mid_carry << 16) + lo_carry
    return hi, lo


def _add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^128-ish: returns (lo, hi, carry_out) of 64-bit add."""
    lo = alo + blo
    c0 = (lo < alo).astype(U32)
    t = ahi + bhi
    c1 = (t < ahi).astype(U32)
    hi = t + c0
    c2 = (hi < t).astype(U32)
    return lo, hi, c1 | c2


def _sub64(alo, ahi, blo, bhi):
    """(a - b) wrapped mod 2^64: returns (lo, hi, borrow_out)."""
    lo = alo - blo
    b0 = (alo < blo).astype(U32)
    hi1 = ahi - bhi
    b1 = (ahi < bhi).astype(U32)
    hi = hi1 - b0
    b2 = ((hi1 < b0)).astype(U32)
    return lo, hi, b1 | b2


def _geq_p(lo, hi):
    """value >= p, for canonicalization. p = (P_HI, P_LO) = (0xFFFFFFFF, 1)."""
    return (hi == P_HI) & (lo >= P_LO)  # hi can't exceed P_HI == 2^32-1


def _canonicalize(lo, hi):
    """One conditional subtract of p; valid for any value < 2p (and any u64,
    since every u64 is < 2p = 2^65 - 2^33 + 2)."""
    ge = _geq_p(lo, hi)
    slo, shi, _ = _sub64(lo, hi, U32(P_LO), U32(P_HI))
    return jnp.where(ge, slo, lo), jnp.where(ge, shi, hi)


def _reduce_u64_pair_with_carry(lo, hi, carry):
    """Reduce a 65-bit value (carry * 2^64 + hi:lo) to canonical form mod p.

    2^64 ≡ EPSILON (mod p): on carry, add EPSILON (twice at most).
    """
    # first EPSILON add if carry
    add_lo, add_hi, c2 = _add64(lo, hi, carry * U32(EPSILON & 0xFFFF_FFFF), U32(0))
    # second (c2 can only be 1 when carry was 1 and hi:lo was huge)
    add_lo2, add_hi2, _ = _add64(add_lo, add_hi, c2 * U32(EPSILON & 0xFFFF_FFFF), U32(0))
    return _canonicalize(add_lo2, add_hi2)


# ----------------------------------------------------------------------------
# Field ops
# ----------------------------------------------------------------------------


def add(a: GL, b: GL) -> GL:
    lo, hi, carry = _add64(a.lo, a.hi, b.lo, b.hi)
    lo, hi = _reduce_u64_pair_with_carry(lo, hi, carry)
    return GL(lo, hi)


def sub(a: GL, b: GL) -> GL:
    lo, hi, borrow = _sub64(a.lo, a.hi, b.lo, b.hi)
    # on borrow: wrapped value = a - b + 2^64 ≡ a - b + EPSILON + p; so
    # subtract EPSILON to land in [0, p) territory (cannot re-borrow: wrapped
    # >= 2^64 - (p-1) > EPSILON).
    slo, shi, _ = _sub64(lo, hi, borrow * U32(EPSILON & 0xFFFF_FFFF), U32(0))
    slo, shi = _canonicalize(slo, shi)
    return GL(slo, shi)


def neg(a: GL) -> GL:
    return sub(zeros(a.shape), a)


def double(a: GL) -> GL:
    return add(a, a)


def _mul_wide(a: GL, b: GL):
    """64x64 -> 128-bit product as four u32 limbs (x0..x3, little-endian)."""
    h00, l00 = _mul32_wide(a.lo, b.lo)
    h01, l01 = _mul32_wide(a.lo, b.hi)
    h10, l10 = _mul32_wide(a.hi, b.lo)
    h11, l11 = _mul32_wide(a.hi, b.hi)

    x0 = l00
    s = h00 + l01
    c1 = (s < h00).astype(U32)
    x1 = s + l10
    c2 = (x1 < s).astype(U32)
    carry1 = c1 + c2

    t = l11 + h01
    d1 = (t < l11).astype(U32)
    t2 = t + h10
    d2 = (t2 < t).astype(U32)
    x2 = t2 + carry1
    d3 = (x2 < t2).astype(U32)
    carry2 = d1 + d2 + d3

    x3 = h11 + carry2
    return x0, x1, x2, x3


def _reduce128(x0, x1, x2, x3):
    """Reduce x0 + x1·2^32 + x2·2^64 + x3·2^96 mod p.

    2^64 ≡ 2^32 - 1 and 2^96 ≡ -1 (mod p), so
    n ≡ (x1:x0) + x2·(2^32 - 1) - x3  (the reference's EPSILON trick,
    src/field/goldilocks/mod.rs:529-560).
    """
    # e = x2 * (2^32 - 1) = (x2 << 32) - x2 as an exact u64
    e_lo = U32(0) - x2
    e_hi = x2 - (x2 != 0).astype(U32)
    lo, hi, carry = _add64(x0, x1, e_lo, e_hi)
    lo, hi = _reduce_u64_pair_with_carry(lo, hi, carry)
    # subtract x3 (x3 < 2^32); on borrow, wrapped ≡ value + 2^64 ≡ value + EPSILON,
    # so subtract EPSILON from the wrapped result (cannot re-borrow).
    slo, shi, borrow = _sub64(lo, hi, x3, U32(0))
    slo2, shi2, _ = _sub64(slo, shi, borrow * U32(EPSILON & 0xFFFF_FFFF), U32(0))
    slo2, shi2 = _canonicalize(slo2, shi2)
    return slo2, shi2


def mul(a: GL, b: GL) -> GL:
    x0, x1, x2, x3 = _mul_wide(a, b)
    lo, hi = _reduce128(x0, x1, x2, x3)
    return GL(lo, hi)


# ----------------------------------------------------------------------------
# Lazy-reduction ops: values live in [0, 2^64) (any u64 representative of the
# residue class) instead of canonical [0, p). Mod-p congruence is preserved by
# every op, so a computation done lazily and canonicalized once at the end is
# BIT-IDENTICAL to the canonical-everywhere path — at roughly half the VPU op
# count (the reference's unreduced-representation trick,
# src/field/goldilocks/mod.rs:472-527, taken to its TPU-native conclusion).
# Hot consumers: the Poseidon2 permutation (hash/poseidon2.py) and NTT
# butterflies. NOT valid for comparisons/serialization without canonicalize().
# ----------------------------------------------------------------------------


def add_lazy(a: GL, b: GL) -> GL:
    """a + b mod p on lazy (any-u64) representatives; output < 2^64.

    s = a + b mod 2^64 with carry c; each 2^64 wrap adds EPSILON
    (2^64 ≡ EPSILON mod p). The second wrap can only happen when the first
    correction itself carries, and cannot recur after that."""
    lo, hi, carry = _add64(a.lo, a.hi, b.lo, b.hi)
    # first EPSILON fix (EPSILON fits the lo limb)
    e = carry * U32(EPSILON)
    lo2 = lo + e
    c = (lo2 < lo).astype(U32)
    hi2 = hi + c
    wrap = (c & (hi2 == 0)).astype(U32)  # hi overflowed past 2^64
    lo3 = lo2 + wrap * U32(EPSILON)
    # lo3 cannot wrap again with hi2 == 0 (EPSILON + EPSILON < 2^32? no —
    # 2*EPSILON wraps; but wrap==1 implies lo2 came from lo + EPSILON with
    # lo <= EPSILON... keep the exact guard: propagate a carry if it happens)
    c2 = (lo3 < lo2).astype(U32)
    return GL(lo3, hi2 + c2)


def _reduce128_lazy(x0, x1, x2, x3):
    """Reduce a 128-bit product to a lazy (< 2^64) representative.

    n ≡ (x1:x0) + x2·EPSILON − x3 (mod p). Cheaper than _reduce128: no
    final canonicalization, single-pass carry fixes."""
    # e = x2 * EPSILON = (x2 << 32) - x2 as exact u64 limbs
    e_lo = U32(0) - x2
    e_hi = x2 - (x2 != 0).astype(U32)
    lo, hi, carry = _add64(x0, x1, e_lo, e_hi)
    # EPSILON fix for the 2^64 wrap (can cascade once)
    e = carry * U32(EPSILON)
    lo2 = lo + e
    c = (lo2 < lo).astype(U32)
    hi2 = hi + c
    wrap = (c & (hi2 == 0)).astype(U32)
    lo3 = lo2 + wrap * U32(EPSILON)
    c2 = (lo3 < lo2).astype(U32)
    hi3 = hi2 + c2
    # subtract x3 (< 2^32); a borrow means we passed below 0, i.e. the true
    # value gained 2^64 ≡ EPSILON, so subtract EPSILON (cannot re-borrow:
    # the wrapped value is ≥ 2^64 - 2^32 > EPSILON)
    slo = lo3 - x3
    b0 = (lo3 < x3).astype(U32)
    shi = hi3 - b0
    borrow = (b0 & (hi3 == 0)).astype(U32)
    # after a 2^64 borrow the wrapped value is >= 2^64 - 2^32 > EPSILON, so
    # the 64-bit value cannot go negative again; the lo-limb borrow still
    # propagates into hi
    e = borrow * U32(EPSILON)
    slo2 = slo - e
    b2 = (slo < e).astype(U32)
    return slo2, shi - b2


def mul_lazy(a: GL, b: GL) -> GL:
    """a * b mod p on lazy representatives; output < 2^64."""
    x0, x1, x2, x3 = _mul_wide(a, b)
    lo, hi = _reduce128_lazy(x0, x1, x2, x3)
    return GL(lo, hi)


def square_lazy(a: GL) -> GL:
    """a² mod p on lazy representatives: 3 widening muls instead of 4
    (symmetric cross term doubled)."""
    hll, lll = _mul32_wide(a.lo, a.lo)
    hlh, llh = _mul32_wide(a.lo, a.hi)
    hhh, lhh = _mul32_wide(a.hi, a.hi)
    # cross = 2 * (lo*hi) as a 65-bit value: (chi:clo, ctop)
    clo = llh + llh
    cc = (clo < llh).astype(U32)
    chi = hlh + hlh + cc
    ctop = (hlh >> 31)  # bit 64 of the doubled cross term
    # x = lll + clo·2^32 + (lhh + chi + ctop·2^32? no—ctop goes to x3)·2^64...
    x0 = lll
    x1 = hll + clo
    c1 = (x1 < hll).astype(U32)
    x2 = lhh + chi
    c2 = (x2 < lhh).astype(U32)
    x2 = x2 + c1
    c3 = (x2 < c1).astype(U32)
    x3 = hhh + ctop + c2 + c3
    lo, hi = _reduce128_lazy(x0, x1, x2, x3)
    return GL(lo, hi)


def mul_pow2_lazy(a: GL, s: int) -> GL:
    """a · 2^s mod p for a static shift 0 <= s < 32, lazy domain."""
    if s == 0:
        return a
    sh = U32(s)
    inv = U32(32 - s)
    x0 = a.lo << sh
    x1 = (a.hi << sh) | (a.lo >> inv)
    x2 = a.hi >> inv
    # n ≡ (x1:x0) + x2·EPSILON (mod p), x3 = 0
    e_lo = U32(0) - x2
    e_hi = x2 - (x2 != 0).astype(U32)
    lo, hi, carry = _add64(x0, x1, e_lo, e_hi)
    e = carry * U32(EPSILON)
    lo2 = lo + e
    c = (lo2 < lo).astype(U32)
    hi2 = hi + c
    wrap = (c & (hi2 == 0)).astype(U32)
    lo3 = lo2 + wrap * U32(EPSILON)
    c2 = (lo3 < lo2).astype(U32)
    return GL(lo3, hi2 + c2)


def canonicalize(a: GL) -> GL:
    """Map a lazy (< 2^64) representative to canonical [0, p)."""
    lo, hi = _canonicalize(a.lo, a.hi)
    return GL(lo, hi)


def square(a: GL) -> GL:
    return mul(a, a)


def mul_by_u32(a: GL, k) -> GL:
    """Multiply by a small (u32) constant: 64x32 -> 96-bit then reduce."""
    k = jnp.asarray(k, dtype=U32)
    h0, l0 = _mul32_wide(a.lo, k)
    h1, l1 = _mul32_wide(a.hi, k)
    x0 = l0
    x1 = h0 + l1
    c = (x1 < h0).astype(U32)
    x2 = h1 + c
    x3 = jnp.zeros_like(x2)
    lo, hi = _reduce128(x0, x1, x2, x3)
    return GL(lo, hi)


def pow_const(a: GL, e: int) -> GL:
    """a ** e for a static Python-int exponent (unrolled square & multiply)."""
    assert e >= 0
    if e == 0:
        return ones(a.shape)
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    return result


def inverse(a: GL) -> GL:
    """Fermat inverse a^(p-2), rolled into a lax.fori_loop over the exponent
    bits (the unrolled 64-step square-and-multiply chain compiles
    pathologically slowly on XLA:CPU). 0 maps to 0 is NOT guaranteed here —
    callers must ensure nonzero input."""
    import jax
    import jax.numpy as jnp

    e = ORDER - 2
    bits = jnp.asarray([(e >> i) & 1 for i in range(64)], dtype=bool)

    def body(i, carry):
        res, base = carry
        taken = mul(res, base)
        res = select(bits[i], taken, res)
        return (res, square(base))

    res, _ = jax.lax.fori_loop(0, 64, body, (ones(a.shape), a))
    return res


def inverse_unrolled(a: GL) -> GL:
    """Unrolled Fermat chain (fewer ops at runtime; big traced graph)."""
    return pow_const(a, ORDER - 2)


def batch_inverse(a: GL) -> GL:
    """Montgomery batch inversion along the last axis (flattened internally).

    Mirrors reference utils batch inverses
    (src/cs/implementations/utils.rs:405-615): one Fermat inverse + 3n muls.
    Zero entries produce zeros in all outputs of their chain — callers must
    guarantee nonzero input (true everywhere the protocol uses it).
    """
    shape = a.shape
    flat = a.reshape(-1)
    n = flat.lo.shape[0]

    def fwd(carry, x):
        nxt = mul(carry, x)
        return nxt, carry  # prefix products exclusive

    init = ones(())
    total, prefix = jax.lax.scan(fwd, init, flat)
    inv_total = inverse(total)

    def bwd(carry, xs):
        x, pfx = xs
        out = mul(carry, pfx)
        nxt = mul(carry, x)
        return nxt, out

    _, inv_flat = jax.lax.scan(bwd, inv_total, (flat, prefix), reverse=True)
    return inv_flat.reshape(shape)


def select(mask, a: GL, b: GL) -> GL:
    """Elementwise mask ? a : b (mask is bool array)."""
    return GL(jnp.where(mask, a.lo, b.lo), jnp.where(mask, a.hi, b.hi))


def eq(a: GL, b: GL):
    return (a.lo == b.lo) & (a.hi == b.hi)


def is_zero(a: GL):
    return (a.lo == 0) & (a.hi == 0)


def concat(parts, axis=0) -> GL:
    return GL(
        jnp.concatenate([p.lo for p in parts], axis=axis),
        jnp.concatenate([p.hi for p in parts], axis=axis),
    )


def stack(parts, axis=0) -> GL:
    return GL(
        jnp.stack([p.lo for p in parts], axis=axis),
        jnp.stack([p.hi for p in parts], axis=axis),
    )


# ----------------------------------------------------------------------------
# Host-side exact scalar helpers (Python ints) — the "scalar field" twin used
# by the transcript, verifier and tests. Mirrors src/field/goldilocks scalar.
# ----------------------------------------------------------------------------


def s_add(a: int, b: int) -> int:
    return (a + b) % ORDER


def s_sub(a: int, b: int) -> int:
    return (a - b) % ORDER


def s_mul(a: int, b: int) -> int:
    return (a * b) % ORDER


def s_inv(a: int) -> int:
    return pow(a, ORDER - 2, ORDER)


def s_pow(a: int, e: int) -> int:
    return pow(a, e, ORDER)


def s_sqrt(a: int):
    """Tonelli-Shanks square root, mirroring the reference's SqrtField impl
    (src/field/goldilocks/mod.rs:359-420): same fixed Z constant, so the
    returned root (out of the pair ±r) is identical to the reference's.
    Returns None for quadratic non-residues; sqrt(0) = 0."""
    a %= ORDER
    if a == 0:
        return 0
    T = (ORDER - 1) >> TWO_ADICITY  # odd part of p-1
    TONELLI_SHANKS_Z = 1753635133440165772

    omega = pow(a, T >> 1, ORDER)
    a_omega = a * omega % ORDER
    b = a_omega * omega % ORDER

    a0 = b
    for _ in range(TWO_ADICITY - 1):
        a0 = a0 * a0 % ORDER
    if a0 == ORDER - 1:
        return None

    v = TWO_ADICITY
    x = a_omega
    z = TONELLI_SHANKS_Z
    while b != 1:
        k = 0
        tmp = b
        while tmp != 1:
            tmp = tmp * tmp % ORDER
            k += 1
        omega = z
        for _ in range(v - k - 1):
            omega = omega * omega % ORDER
        z = omega * omega % ORDER
        b = b * z % ORDER
        x = x * omega % ORDER
        v = k
    assert x * x % ORDER == a
    return x


def domain_generator(log2_size: int) -> int:
    """Generator of the order-2^log2_size subgroup, matching the reference's
    radix-2 generator tower (src/cs/implementations/utils.rs:13)."""
    assert log2_size <= TWO_ADICITY
    g = RADIX_2_SUBGROUP_GENERATOR
    for _ in range(TWO_ADICITY - log2_size):
        g = s_mul(g, g)
    return g
