"""MXU matmul-NTT: small-radix NTT stages as exact int8 matrix multiplies.

Reference analogue: the cache-friendly `MixedGL` NTT (src/fft/mod.rs:852) is
the reference's one hand-optimized kernel; on TPU the systolic array (MXU) is
where the FLOPs live, so the radix-R stage becomes a dense twiddle-matrix
multiply instead of SIMD butterflies.

Exactness scheme (everything integer, no rounding anywhere):

- a radix-R stage (R = 128/256) is Y = W X with W[p, j] = ω_R^{bitrev(p)·j}
  over Goldilocks — identical semantics to `ntt.ntt_cols` at size R;
- W and X decompose into 8 byte digits; signed int8 inputs are obtained with
  the ±128 offset trick (d' = d - 128), whose corrections are rank-1:
  row-sums of W digits (precomputed) and column-sums of X digits (one VPU
  reduction per digit);
- digit-pair products accumulate on the MXU in int32
  (|products| ≤ 128·128² = 2^21 per term, ≤ 8·R·255² < 2^27 per
  reassembled convolution slot — exact with huge margin);
- the 15 convolution slots T_k reassemble on the VPU into a 160-bit integer
  Σ T_k·2^{8k}, folded mod p via 2^64 ≡ 2^32-1, 2^96 ≡ -1, 2^128 ≡ -2^32.

The stage slots into the existing four-step recursion (`ntt.ntt_fourstep_cols`)
so 2^14..2^24-point transforms run 2-3 matmul stages + cross-twiddle VPU muls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..field.goldilocks import GL, ORDER, U32

# number of 8-bit digits per 64-bit element
DIGITS = 8
# convolution slots: k = i + j for i, j < DIGITS
SLOTS = 2 * DIGITS - 1


def _bitrev(log_r: int) -> np.ndarray:
    n = 1 << log_r
    idx = np.arange(n)
    rev = np.zeros(n, np.int64)
    for b in range(log_r):
        rev |= ((idx >> b) & 1) << (log_r - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _w_matrix_u64(log_r: int, inverse: bool) -> np.ndarray:
    """The exact radix-R stage matrix, host u64.

    forward:  W[p, j] = ω^{bitrev(p)·j}            (natural -> bitreversed)
    inverse:  W[j, p] = n⁻¹·ω^{-j·bitrev(p)}       (bitreversed -> natural,
                                                     including the 1/R scale
                                                     `ntt.intt_cols` applies)
    """
    r = 1 << log_r
    omega = gl.domain_generator(log_r)
    rev = _bitrev(log_r)
    out = np.empty((r, r), np.uint64)
    if not inverse:
        for p in range(r):
            base = pow(omega, int(rev[p]), ORDER)
            acc = 1
            for j in range(r):
                out[p, j] = acc
                acc = acc * base % ORDER
    else:
        omega_inv = pow(omega, ORDER - 2, ORDER)
        r_inv = pow(r, ORDER - 2, ORDER)
        for j in range(r):
            base = pow(omega_inv, j, ORDER)
            acc = r_inv
            for p_nat in range(r):
                # column index is the bitreversed position
                out[j, rev[p_nat]] = acc
                acc = acc * base % ORDER
    return out


@functools.lru_cache(maxsize=None)
def _w_digit_tables(log_r: int, inverse: bool):
    """(DIGITS·R, R) int8 stacked offset digits of W + per-digit row sums."""
    w = _w_matrix_u64(log_r, inverse)
    r = w.shape[0]
    digs = np.empty((DIGITS, r, r), np.uint8)
    for i in range(DIGITS):
        digs[i] = ((w >> np.uint64(8 * i)) & np.uint64(0xFF)).astype(np.uint8)
    rowsums = digs.astype(np.int64).sum(axis=2)  # (DIGITS, R) true digit sums
    signed = (digs.astype(np.int16) - 128).astype(np.int8)
    stacked = signed.reshape(DIGITS * r, r)
    return stacked, rowsums.astype(np.int32)


def _fold160(v0, v1, v2, v3, v4) -> GL:
    """Fold a 160-bit little-endian u32-limb value mod p to a lazy (< 2^64)
    representative: value ≡ (v1:v0) + v2·(2^32-1) - v3 - v4·2^32 (mod p)."""
    from ..field.goldilocks import EPSILON, _add64

    # (v1:v0) + v2·EPSILON, EPSILON·v2 = (v2<<32) - v2
    e_lo = U32(0) - v2
    e_hi = v2 - (v2 != 0).astype(U32)
    lo, hi, carry = _add64(v0, v1, e_lo, e_hi)
    e = carry * U32(EPSILON)
    lo2 = lo + e
    c = (lo2 < lo).astype(U32)
    hi2 = hi + c
    wrap = (c & (hi2 == 0)).astype(U32)
    lo3 = lo2 + wrap * U32(EPSILON)
    c2 = (lo3 < lo2).astype(U32)
    hi3 = hi2 + c2
    # subtract v3 (64-bit borrow -> -EPSILON) then v4·2^32 (borrow likewise)
    slo = lo3 - v3
    b0 = (lo3 < v3).astype(U32)
    shi = hi3 - b0
    bor = (b0 & (hi3 == 0)).astype(U32)
    e = bor * U32(EPSILON)
    slo2 = slo - e
    b2 = (slo < e).astype(U32)
    shi2 = shi - b2
    # subtract v4·2^32: hi-limb subtract; borrow means -2^64 ≡ -EPSILON
    shi3 = shi2 - v4
    b3 = (shi2 < v4).astype(U32)
    e = b3 * U32(EPSILON)
    slo3 = slo2 - e
    b4 = (slo2 < e).astype(U32)
    return GL(slo3, shi3 - b4)


def _recombine_slots(slots) -> GL:
    """slots: list of SLOTS int32 arrays (true digit-convolution values,
    each < 2^27) -> GL lazy value of Σ slots[k]·2^{8k} mod p."""
    shape = slots[0].shape
    v = [jnp.zeros(shape, U32) for _ in range(5)]

    def add_at(v, word, val):
        # v[word] += val with carry chain upward (val: u32)
        out = list(v)
        cur = val
        w = word
        while w < 5:
            s = out[w] + cur
            carry = (s < out[w]).astype(U32)
            out[w] = s
            if w + 1 >= 5:
                break
            cur = carry
            w += 1
            # stop early when no further carry is possible
            if not isinstance(cur, jnp.ndarray):
                break
        return out

    for k in range(SLOTS):
        t = slots[k].astype(U32)  # < 2^27, non-negative by construction
        word, off = divmod(8 * k, 32)
        lo_part = t << off if off else t
        v = add_at(v, word, lo_part)
        if off:
            hi_part = t >> (32 - off)
            if word + 1 < 5:
                v = add_at(v, word + 1, hi_part)
    return _fold160(*v)


@functools.lru_cache(maxsize=None)
def _stage_jit(log_r: int, m: int, inverse: bool):
    """One radix-R NTT stage on (R, M) GL columns via MXU matmuls."""
    r = 1 << log_r

    def f(lo, hi):
        w_stacked, w_rowsums = _w_digit_tables(log_r, inverse)
        wd = jnp.asarray(w_stacked)  # (8R, R) int8
        # X digits, offset to int8
        xd = []
        for i in range(DIGITS):
            limb = lo if i < 4 else hi
            sh = 8 * (i % 4)
            b = (limb >> sh).astype(jnp.uint8) if sh else limb.astype(jnp.uint8)
            xd.append(b)
        # column sums of TRUE X digits (for the W-offset correction)
        xcs = [d.astype(jnp.int32).sum(axis=0) for d in xd]  # (M,) each
        # signed offset digits d-128: flip the top bit and BITCAST (astype
        # would value-convert; the flipped bit pattern IS d-128 in int8)
        xds = [jax.lax.bitcast_convert_type(d ^ jnp.uint8(0x80), jnp.int8)
               for d in xd]

        # per X-digit matmul against all stacked W digits: (8R, M) int32
        prods = [
            jax.lax.dot_general(
                wd, xds[j],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            for j in range(DIGITS)
        ]

        rs = jnp.asarray(w_rowsums)  # (8, R) int32 true W digit row sums
        slots = []
        for k in range(SLOTS):
            acc = None
            for i in range(DIGITS):
                j = k - i
                if not (0 <= j < DIGITS):
                    continue
                # true W_i X_j = P + 128·(colsum_j' ) ... derive exactly:
                # W_i X_j = (W_i'+128)(X_j'+128)
                #         = P_ij + 128·colsum(X_j') + 128·rowsum(W_i') + 128²·R
                # with rowsum(W_i') = rowsum(W_i) - 128R and
                #      colsum(X_j') = colsum(X_j) - 128R:
                # W_i X_j = P_ij + 128·colsum(X_j) + 128·rowsum(W_i) - 128²·R
                p_ij = prods[j][i * r:(i + 1) * r]
                term = (p_ij
                        + 128 * xcs[j][None, :]
                        + 128 * rs[i][:, None]
                        - (128 * 128 * r))
                acc = term if acc is None else acc + term
            slots.append(acc)
        out = _recombine_slots(slots)
        out = gl.canonicalize(out)
        return out.lo, out.hi

    return jax.jit(f)


def ntt_cols_matmul(x: GL, inverse: bool = False) -> GL:
    """NTT along axis 0 of (R, M) via the MXU stage; exact, bit-identical to
    `ntt.ntt_cols(x, plan)` / `ntt.intt_cols` at the same size (tested)."""
    r, m = x.shape
    log_r = r.bit_length() - 1
    assert 1 << log_r == r
    lo, hi = _stage_jit(log_r, m, inverse)(x.lo, x.hi)
    return GL(lo, hi)
