"""Vectorized host-side Goldilocks arithmetic on numpy uint64 arrays.

Used by witness generation (the TPU build's replacement for the reference's
multithreaded DAG resolver, src/dag/ — see SURVEY §2.6: dependency-ordered
vectorized host batches) and by host-side setup computations. Device-side
arithmetic lives in boojum_tpu.field.goldilocks (u32-limb jnp).

All functions take/return canonical uint64 arrays (< p) elementwise.
"""

from __future__ import annotations

import numpy as np

# uint64 wraparound is intentional throughout (carry/borrow tracking)
np.seterr(over="ignore")

P = np.uint64(0xFFFF_FFFF_0000_0001)
EPSILON = np.uint64(0xFFFF_FFFF)  # 2^64 mod p
_MASK32 = np.uint64(0xFFFF_FFFF)
_U32 = np.uint64(32)

ORDER = 0xFFFF_FFFF_0000_0001


def _tiny(a, b):
    """Fast exact-int path for size-1 operands (gadget scalar calls dominate
    synthesis; numpy dispatch on 1-element arrays costs ~30µs vs ~1µs)."""
    return a.size == 1 and b.size == 1


def add(a, b):
    """(a + b) mod p for canonical a, b."""
    a = np.asarray(a, np.uint64)
    b = np.asarray(b, np.uint64)
    if _tiny(a, b):
        v = (int(a.reshape(-1)[0]) + int(b.reshape(-1)[0])) % ORDER
        return np.full(a.shape if a.ndim >= b.ndim else b.shape, v, np.uint64)
    s = a + b
    wrapped = s < a  # overflow past 2^64: add EPSILON
    s = np.where(wrapped, s + EPSILON, s)
    # canonicalize (one conditional subtract suffices: s < 2p always)
    ge = s >= P
    return np.where(ge, s - P, s)


def sub(a, b):
    a = np.asarray(a, np.uint64)
    b = np.asarray(b, np.uint64)
    if _tiny(a, b):
        v = (int(a.reshape(-1)[0]) - int(b.reshape(-1)[0])) % ORDER
        return np.full(a.shape if a.ndim >= b.ndim else b.shape, v, np.uint64)
    d = a - b
    borrow = a < b
    # wrapped: d = a - b + 2^64 ≡ a - b + EPSILON (mod p)
    return np.where(borrow, d - EPSILON, d)


def neg(a):
    a = np.asarray(a, np.uint64)
    return np.where(a == 0, a, P - a)


def _mul_wide(a, b):
    """64x64 -> (hi, lo) uint64 pair."""
    a0 = a & _MASK32
    a1 = a >> _U32
    b0 = b & _MASK32
    b1 = b >> _U32
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    # mid = lh + hl + (ll >> 32), tracking carry out of 64 bits
    mid = lh + (ll >> _U32)
    mid2 = mid + hl
    carry = np.where(mid2 < hl, np.uint64(1), np.uint64(0))
    lo = (ll & _MASK32) | (mid2 << _U32)
    hi = hh + (mid2 >> _U32) + (carry << _U32)
    return hi, lo


def _reduce128(hi, lo):
    """Reduce hi:lo mod p via 2^64 ≡ 2^32 - 1, 2^96 ≡ -1."""
    x2 = hi & _MASK32  # bits 64..96
    x3 = hi >> _U32  # bits 96..128
    # lo + x2 * (2^32 - 1)
    e = (x2 << _U32) - x2
    s = lo + e
    wrapped = s < lo
    s = np.where(wrapped, s + EPSILON, s)
    # subtract x3
    d = s - x3
    borrow = s < x3
    d = np.where(borrow, d - EPSILON, d)
    ge = d >= P
    return np.where(ge, d - P, d)


def mul(a, b):
    a = np.asarray(a, np.uint64)
    b = np.asarray(b, np.uint64)
    if _tiny(a, b):
        v = (int(a.reshape(-1)[0]) * int(b.reshape(-1)[0])) % ORDER
        return np.full(a.shape if a.ndim >= b.ndim else b.shape, v, np.uint64)
    hi, lo = _mul_wide(a, b)
    return _reduce128(hi, lo)


def mul_scalar(a, k: int):
    return mul(a, np.uint64(k % ORDER))


def pow_scalar(a, e: int):
    """a ** e elementwise for python-int e."""
    a = np.asarray(a, np.uint64)
    result = np.full(a.shape, 1, np.uint64)
    base = a
    while e:
        if e & 1:
            result = mul(result, base)
        e >>= 1
        if e:
            base = mul(base, base)
    return result


def inv(a):
    """Fermat inverse elementwise (0 -> 0)."""
    return pow_scalar(a, ORDER - 2)


def batch_inv(a):
    """Bulk inversion. Vectorized Fermat (≈128 whole-array passes) beats a
    sequential Montgomery chain in numpy; 0 maps to 0."""
    return inv(a)


def powers(base: int, count: int):
    """[base^0 .. base^(count-1)] as uint64 (exact doubling ladder)."""
    out = np.empty(count, np.uint64)
    if count == 0:
        return out
    out[0] = 1
    have = 1
    while have < count:
        step = np.uint64(pow(base, have, ORDER))
        take = min(have, count - have)
        out[have:have + take] = mul(out[:take], step)
        have += take
    return out
