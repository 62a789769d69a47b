"""MXU matmul-NTT: small-radix NTT stages as exact f32 matrix multiplies.

Reference analogue: the cache-friendly `MixedGL` NTT (src/fft/mod.rs:852) is
the reference's one hand-optimized kernel; on TPU the systolic array (MXU) is
where the FLOPs live, so the radix-R stage becomes a dense twiddle-matrix
multiply instead of SIMD butterflies.

Exactness scheme (everything integer-valued, no rounding anywhere):

- a radix-R stage (R = 128/256) is Y = W X with W[p, j] = ω_R^{bitrev(p)·j}
  over Goldilocks — identical semantics to `ntt.ntt_cols` at size R;
- W and X decompose into 8 byte digits held in f32 (integers ≤ 255 are
  exactly representable); digit-pair products accumulate on the MXU in f32:
  every partial sum ≤ R·255² ≤ 16,646,400 < 2^24, so f32 accumulation is
  EXACT (verified on-device including the all-255 worst case at K=256;
  the int8 and bf16 input paths measured ~1000x slower on this backend,
  while f32 matmul sustains ~180 TFLOP/s);
- per-(i,j) products convert to int32 (< 2^24, exact) and sum into the 15
  digit-convolution slots T_k (< 8·R·255² < 2^27, exact in int32);
- the slots reassemble on the VPU into a 160-bit integer Σ T_k·2^{8k},
  folded mod p via 2^64 ≡ 2^32-1, 2^96 ≡ -1, 2^128 ≡ -2^32.

The stage slots into the existing four-step recursion
(`ntt.ntt_fourstep_cols`), so 2^14..2^24-point transforms run 2-3 matmul
stages + cross-twiddle VPU muls.
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
def _w_digit_stack_f32(log_r: int, inverse: bool) -> np.ndarray:
    """(DIGITS·R, R) f32 stacked byte digits of W (digit i at rows iR..)."""
    w = _w_matrix_u64(log_r, inverse)
    r = w.shape[0]
    digs = np.empty((DIGITS, r, r), np.float32)
    for i in range(DIGITS):
        digs[i] = ((w >> np.uint64(8 * i)) & np.uint64(0xFF)).astype(np.float32)
    return digs.reshape(DIGITS * r, r)


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
    """One radix-R NTT stage on (R, M) GL columns via an MXU f32 matmul."""
    r = 1 << log_r

    def f(lo, hi):
        wd = jnp.asarray(_w_digit_stack_f32(log_r, inverse))  # (8R, R) f32
        # X byte digits as f32, concatenated along M: (R, 8M)
        xd = []
        for i in range(DIGITS):
            limb = lo if i < 4 else hi
            sh = 8 * (i % 4)
            b = (limb >> sh) & U32(0xFF) if sh else limb & U32(0xFF)
            xd.append(b.astype(jnp.float32))
        xs = jnp.concatenate(xd, axis=1)  # (R, 8M)
        # ONE exact f32 matmul: every partial sum ≤ R·255² < 2^24
        prod = jax.lax.dot_general(
            wd, xs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (8R, 8M)
        # int32 view (exact: every entry < 2^24), sliced per digit pair
        pi = prod.astype(jnp.int32)
        slots = []
        for k in range(SLOTS):
            acc = None
            for i in range(DIGITS):
                j = k - i
                if not (0 <= j < DIGITS):
                    continue
                p_ij = pi[i * r:(i + 1) * r, j * m:(j + 1) * m]
                acc = p_ij if acc is None else acc + p_ij
            slots.append(acc)
        out = _recombine_slots(slots)
        out = gl.canonicalize(out)
        return out.lo, out.hi

    return jax.jit(f)


# ---------------------------------------------------------------------------
# Fused Pallas stage: the digit-product tensor is 64x the input, so the
# jnp-dot formulation above round-trips ~8 GB of HBM per big pass and LOSES
# to the VPU butterflies. The fused kernel keeps the per-tile products and
# the 160-bit accumulator words in VMEM: HBM traffic = input + output only,
# and the MXU runs at its measured ~180 TFLOP/s f32 marginal rate.
# ---------------------------------------------------------------------------

TILE_M = 256  # lanes per grid step


def _mxu_kernel(log_r: int, inverse: bool):
    r = 1 << log_r

    def kernel(w_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
        tm = lo_ref.shape[1]
        # 160-bit accumulator words v0..v4 for Σ T_k·2^{8k}
        v = [jnp.zeros((r, tm), U32) for _ in range(5)]

        def add_at(v, word, val):
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
            return out

        lo = lo_ref[:]
        hi = hi_ref[:]
        for j in range(DIGITS):
            limb = lo if j < 4 else hi
            sh = 8 * (j % 4)
            d = (limb >> sh) & U32(0xFF) if sh else limb & U32(0xFF)
            # Mosaic has no u32->f32 cast; bitcast to i32 (values < 2^8)
            dj = jax.lax.bitcast_convert_type(d, jnp.int32).astype(jnp.float32)
            # (8R, R) @ (R, TM) on the MXU — exact (partial sums < 2^24)
            p = jax.lax.dot_general(
                w_ref[:], dj, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            pi = p.astype(jnp.int32)
            for i in range(DIGITS):
                # < 2^24 and non-negative: bitcast i32 -> u32 is exact
                t = jax.lax.bitcast_convert_type(pi[i * r:(i + 1) * r], U32)
                k = i + j
                word, off = divmod(8 * k, 32)
                v = add_at(v, word, t << off if off else t)
                if off:
                    hi_part = t >> (32 - off)
                    if word + 1 < 5:
                        v = add_at(v, word + 1, hi_part)
        out = gl.canonicalize(_fold160(*v))
        out_lo_ref[:] = out.lo
        out_hi_ref[:] = out.hi

    return kernel


def _kernel_version() -> int:
    """Stage-kernel selector: 2 = slot-accumulate (round 5), 1 = legacy
    per-pair carry chains. BOOJUM_MXU_V1=1 opts back into v1."""
    import os
    return 1 if os.environ.get("BOOJUM_MXU_V1") == "1" else 2


@functools.lru_cache(maxsize=None)
def _stage_pallas_jit(log_r: int, m: int, inverse: bool, interpret: bool,
                      version: int = None, twmode: int = 0,
                      tw_width: int = 0):
    """One compiled Mosaic program for a radix-R stage over (R, m).

    twmode/tw_width: optional fused cross-twiddle (see _mxu_kernel_v2).
    The twiddle input is a (R, tw_width) table; each grid tile reads the
    (R, TILE_M) slice at lane offset (i*TILE_M) % tw_width — with
    batch-major lanes (c, j2) this IS the per-element twiddle, with no
    lane-expansion materialization at all."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if version is None:
        version = _kernel_version()
    r = 1 << log_r
    # the twiddle-fused variant carries two extra (r, tile) inputs; at
    # tile=256 the double-buffered working set overflows the v5e's 16 MB
    # VMEM by ~0.8 MB, so it runs at half tile width
    tile = TILE_M // 2 if twmode else TILE_M
    assert m % tile == 0
    grid = (m // tile,)
    w_spec = pl.BlockSpec((DIGITS * r, r), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((r, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    if twmode:
        assert version == 2 and tw_width % tile == 0
        tw_blocks = tw_width // tile
        tw_spec = pl.BlockSpec((r, tile), lambda i: (0, i % tw_blocks),
                               memory_space=pltpu.VMEM)
        kernel = _mxu_kernel_v2(log_r, inverse, twmode)

        def f(lo, hi, twl, twh):
            w = jnp.asarray(_w_digit_stack_f32(log_r, inverse))
            return pl.pallas_call(
                kernel,
                out_shape=(jax.ShapeDtypeStruct((r, m), jnp.uint32),
                           jax.ShapeDtypeStruct((r, m), jnp.uint32)),
                grid=grid,
                in_specs=[w_spec, spec, spec, tw_spec, tw_spec],
                out_specs=(spec, spec),
                interpret=interpret,
            )(w, lo, hi, twl, twh)

        return jax.jit(f)

    kernel = (_mxu_kernel_v2 if version == 2 else _mxu_kernel)(log_r, inverse)

    def f(lo, hi):
        w = jnp.asarray(_w_digit_stack_f32(log_r, inverse))
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((r, m), jnp.uint32),
                       jax.ShapeDtypeStruct((r, m), jnp.uint32)),
            grid=grid,
            in_specs=[w_spec, spec, spec],
            out_specs=(spec, spec),
            interpret=interpret,
        )(w, lo, hi)

    return jax.jit(f)


def _mxu_kernel_v2(log_r: int, inverse: bool, twmode: int = 0):
    """Round-5 kernel: slot-accumulate-then-recombine.

    The v1 kernel ran a 160-bit add_at carry chain per (i, j) digit pair —
    ~17 VPU ops per element per pair, 64 pairs — and measured ~9x VPU-bound
    against its own MXU work (12.8%% of roofline, BENCH_r04). v2 restores
    the balance:

    - per digit j: ONE matmul (8R, R) @ (R, TM), convert to int32, and ADD
      into 15 slot accumulators T_k = sum_{i+j=k} P_ij (exact: T_k <=
      8*R*255^2 < 2^28 fits int32) — 2 VPU ops per (i, j) pair instead of
      ~17;
    - recombination happens ONCE per tile on the 15 slots via the 4-column
      split: value = A + (B<<8) + (C<<16) + (D<<24) where column r packs
      slots k ≡ r (mod 4) into 5 u32 words with NO carries (T_k < 2^32),
      so only the 3 shifted adds need carry chains;
    - the 160-bit fold + canonicalize run once per tile as before.

    twmode: 0 = plain stage; 1 = multiply the stage OUTPUT by a per-element
    twiddle tile (the four-step cross twiddle fused into the forward pass —
    saves a full HBM round-trip + the lane-expansion materialization);
    2 = multiply the INPUT (the inverse pass, where the cross twiddle
    divides before the stage). Twiddle muls are mul_lazy + the shared final
    canonicalize, which produces the same canonical representative as the
    separate gl.mul — proofs stay byte-identical.
    """
    r = 1 << log_r

    def kernel(*refs):
        if twmode:
            w_ref, lo_ref, hi_ref, twl_ref, twh_ref, out_lo_ref, \
                out_hi_ref = refs
        else:
            w_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref = refs
        tm = lo_ref.shape[1]
        lo = lo_ref[:]
        hi = hi_ref[:]
        if twmode == 2:
            x_tw = gl.mul_lazy(GL(lo, hi), GL(twl_ref[:], twh_ref[:]))
            lo, hi = x_tw.lo, x_tw.hi
        slots = [None] * SLOTS
        for j in range(DIGITS):
            limb = lo if j < 4 else hi
            sh = 8 * (j % 4)
            d = (limb >> sh) & U32(0xFF) if sh else limb & U32(0xFF)
            dj = jax.lax.bitcast_convert_type(d, jnp.int32).astype(jnp.float32)
            p = jax.lax.dot_general(
                w_ref[:], dj, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (8R, TM), exact
            pi = p.astype(jnp.int32)
            for i in range(DIGITS):
                k = i + j
                blk = pi[i * r:(i + 1) * r]
                slots[k] = blk if slots[k] is None else slots[k] + blk
        # u32 views (values < 2^28, non-negative)
        T = [jax.lax.bitcast_convert_type(s, U32) for s in slots]
        zero = jnp.zeros((r, tm), U32)

        def shifted(col, s):
            # 5-word left shift by s in {8, 16, 24} of a word list (< 5 long)
            words = []
            prev = None
            for w in range(5):
                cur = col[w] if w < len(col) else None
                v = (cur << s) if cur is not None else None
                if prev is not None:
                    pv = prev >> (32 - s)
                    v = pv if v is None else (v | pv)
                words.append(v if v is not None else zero)
                prev = cur
            return words

        def add5(x, y):
            out = []
            carry = None
            for w in range(5):
                s = x[w] + y[w]
                c = (s < x[w]).astype(U32)
                if carry is not None:
                    s2 = s + carry
                    c = c | (s2 < s).astype(U32)
                    s = s2
                out.append(s)
                carry = c
            return out

        A = [T[0], T[4], T[8], T[12], zero]
        B = [T[1], T[5], T[9], T[13]]
        C = [T[2], T[6], T[10], T[14]]
        D = [T[3], T[7], T[11]]
        total = add5(add5(A, shifted(B, 8)),
                     add5(shifted(C, 16), shifted(D, 24)))
        out = _fold160(*total)
        if twmode == 1:
            out = gl.mul_lazy(out, GL(twl_ref[:], twh_ref[:]))
        out = gl.canonicalize(out)
        out_lo_ref[:] = out.lo
        out_hi_ref[:] = out.hi

    return kernel


# fixed M per kernel call: every radix shares TWO compiled Mosaic programs
# (small + large) regardless of batch width (each extra pallas shape costs
# ~4-5 s of cold start even on a persistent-cache hit — server-side load).
# The large shape covers full-prover passes in 1-2 calls (32 calls/pass at
# the old 2^14 cost ~25 ms of slice+concat HBM copies per pass, round 5).
FIXED_M = 1 << 16
SMALL_M = 1 << 14


def _padded_m(m: int) -> int:
    """Kernel lane-width bucket: two shared shapes for small/medium m (one
    compiled program each), exact TILE_M-rounded width above FIXED_M (the
    chunk-and-concat alternative cost ~4 extra HBM touches per pass)."""
    if m <= SMALL_M:
        return SMALL_M
    if m <= FIXED_M:
        return FIXED_M
    return -(-m // TILE_M) * TILE_M


def ntt_cols_matmul(x: GL, inverse: bool = False, interpret: bool = False,
                    fused: bool = None, tw: tuple = None,
                    tw_pre: bool = False) -> GL:
    """NTT along axis 0 of (R, M) via the MXU stage; exact, bit-identical to
    `ntt.ntt_cols(x, plan)` / `ntt.intt_cols` at the same size (tested).

    fused=True (default on TPU) runs the Pallas VMEM kernel; fused=False is
    the jnp-dot reference formulation.

    tw: optional (twl, twh) device (R, W) twiddle table with W | M (the
    four-step cross twiddle for batch-major lanes); multiplied into the
    OUTPUT (tw_pre=False, forward) or the INPUT (tw_pre=True, inverse)
    inside the kernel. Caller guarantees lane l's twiddle is column
    l % W of the table."""
    r, m = x.shape
    log_r = r.bit_length() - 1
    assert 1 << log_r == r
    if fused is None:
        fused = jax.default_backend() not in ("cpu",)
    if not fused or m % TILE_M or (tw is not None and _kernel_version() != 2):
        tw_full = None
        if tw is not None:
            reps = m // tw[0].shape[1]
            tw_full = GL(jnp.tile(tw[0], (1, reps)),
                         jnp.tile(tw[1], (1, reps)))
        if tw_full is not None and tw_pre:
            x = gl.mul(x, tw_full)
        lo, hi = _stage_jit(log_r, m, inverse)(x.lo, x.hi)
        out = GL(lo, hi)
        if tw_full is not None and not tw_pre:
            out = gl.mul(out, tw_full)
        return out
    mp = _padded_m(m)
    if m < mp:
        x = GL(jnp.pad(x.lo, ((0, 0), (0, mp - m))),
               jnp.pad(x.hi, ((0, 0), (0, mp - m))))
    if tw is not None:
        twl, twh = tw
        w_ = twl.shape[1]
        tw_tile = TILE_M // 2  # matches the twmode kernel's tile width
        if w_ < tw_tile:
            reps = tw_tile // w_
            twl = jnp.tile(twl, (1, reps))
            twh = jnp.tile(twh, (1, reps))
            w_ = tw_tile
        lo, hi = _stage_pallas_jit(log_r, mp, inverse, interpret,
                                   twmode=2 if tw_pre else 1,
                                   tw_width=w_)(x.lo, x.hi, twl, twh)
    else:
        lo, hi = _stage_pallas_jit(log_r, mp, inverse, interpret)(x.lo, x.hi)
    if m < mp:
        return GL(lo[:, :m], hi[:, :m])
    return GL(lo, hi)
