"""Device-side (jnp) building blocks of the prover pipeline.

These are the five hot kernels SURVEY §3.2 identifies (NTT/LDE, Merkle
hashing, gate sweeps, batch inverses, sponges) expressed as jnp/GL functions:

- column batches live as GL arrays shaped (n, num_polys) — rows on axis 0 so
  the NTT transforms axis 0 and polys ride the TPU lane dim;
- LDE output is (lde, n, num_polys) with axis 0 in *bitreversed coset
  enumeration*, so flattening axes (0, 1) yields the bitreversed enumeration
  of the full lde·n domain over the coset g·<ω_{lde·n}> — the exact layout
  the reference stores (GenericLdeStorage) and FRI folding needs;
- inversion is Fermat (63 squarings, fully lane-parallel) instead of the
  reference's sequential Montgomery batches — the TPU-idiomatic tradeoff;
- grand products use `jax.lax.associative_scan` (log-depth) instead of the
  reference's chunked sequential scans.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import extension as ext2
from ..field import goldilocks as gl
from ..field.extension import GL2
from ..field.goldilocks import GL
from ..ntt import ntt
from ..utils import npgl


def to_device_cols(cols_u64: np.ndarray) -> GL:
    """(num_polys, n) host u64 -> GL (n, num_polys) device."""
    return gl.from_u64(np.ascontiguousarray(cols_u64.T))


@functools.lru_cache(maxsize=None)
def _assemble_packed_jit(n, k, idx8, idx16, idx32, idx64):
    """Reassemble (n, k) GL limbs from width-classified column groups."""
    import jax

    perm = np.concatenate([np.asarray(idx8, np.int64),
                           np.asarray(idx16, np.int64),
                           np.asarray(idx32, np.int64),
                           np.asarray(idx64, np.int64)])
    inv = np.empty(k, np.int64)
    inv[perm] = np.arange(k)

    def f(a8, a16, a32, lo64, hi64):
        lo = jnp.concatenate([a8.astype(jnp.uint32),
                              a16.astype(jnp.uint32), a32, lo64], axis=1)
        hi = jnp.concatenate(
            [jnp.zeros((n, len(idx8) + len(idx16) + len(idx32)),
                       jnp.uint32), hi64],
            axis=1)
        return lo[:, inv], hi[:, inv]

    return jax.jit(f)


def to_device_cols_packed(cols_u64: np.ndarray) -> GL:
    """Transfer-compressed variant of to_device_cols: columns whose values
    fit 8/16/32 bits upload as uint8/16/32 (the witness of byte/char-chunk
    heavy circuits is mostly tiny values; the tunnel sustains ~8-10 MB/s, so
    the raw 8-byte upload is a top per-proof cost). Device-side reassembly
    is one fused gather; classification is per column, so the jit
    re-specializes only if a column's value range class changes between
    proofs."""
    k, n = cols_u64.shape
    if k == 0:
        return gl.from_u64(np.ascontiguousarray(cols_u64.T))
    maxes = cols_u64.max(axis=1)
    cls8 = maxes < (1 << 8)
    cls16 = ~cls8 & (maxes < (1 << 16))
    cls32 = ~cls8 & ~cls16 & (maxes < (1 << 32))
    cls64 = ~(cls8 | cls16 | cls32)
    idx8 = tuple(int(i) for i in np.nonzero(cls8)[0])
    idx16 = tuple(int(i) for i in np.nonzero(cls16)[0])
    idx32 = tuple(int(i) for i in np.nonzero(cls32)[0])
    idx64 = tuple(int(i) for i in np.nonzero(cls64)[0])
    a8 = np.ascontiguousarray(cols_u64[list(idx8)].T.astype(np.uint8))
    a16 = np.ascontiguousarray(cols_u64[list(idx16)].T.astype(np.uint16))
    a32 = np.ascontiguousarray(cols_u64[list(idx32)].T.astype(np.uint32))
    c64 = np.ascontiguousarray(cols_u64[list(idx64)].T)
    lo64 = (c64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi64 = (c64 >> np.uint64(32)).astype(np.uint32)
    f = _assemble_packed_jit(n, k, idx8, idx16, idx32, idx64)
    lo, hi = f(jnp.asarray(a8), jnp.asarray(a16), jnp.asarray(a32),
               jnp.asarray(lo64), jnp.asarray(hi64))
    return GL(lo, hi)


def from_device(a: GL) -> np.ndarray:
    return gl.to_u64(a)


COL_BLOCK = 64  # fixed column-block width: ONE compiled NTT/LDE program per
# (log_n, lde) regardless of how many polys an oracle holds


@functools.lru_cache(maxsize=None)
def _jit_cols_to_monomials(log_n: int):
    if log_n >= 14:
        return jax.jit(
            lambda cols: ntt.intt_fourstep_cols(ntt.bitreverse_gl(cols)))
    plan = ntt.get_plan(log_n)
    return jax.jit(lambda cols: ntt.intt_cols(ntt.bitreverse_gl(cols), plan))


@functools.lru_cache(maxsize=None)
def _jit_lde_all_cosets(log_n: int, lde_factor: int, block: int):
    """Full LDE of one column block in ONE dispatch with ONE single-NTT-sized
    graph: the coset power columns are DATA (lde, n), the coset axis is
    folded into the NTT's batch axis. (Unrolling the lde cosets into the
    graph — lde_from_monomials under jit — hit the superlinear-compile
    pathology: ~8x graph = minutes on the axon backend.)"""
    plan = ntt.get_plan(log_n)
    n = 1 << log_n

    def f(lo, hi, plo, phi):
        # (n, B) x (L, n) -> (n, L*B) scaled copies, 2-D THROUGHOUT:
        # elementwise math on a (n, L, B) view is the TPU layout cliff
        # (trailing dim < 128 wastes lanes; measured ~100x off roofline,
        # round-5 profile). tile/repeat are lane gathers XLA fuses.
        import jax.numpy as _jnp
        x = gl.mul(GL(_jnp.tile(lo, (1, lde_factor)),
                      _jnp.tile(hi, (1, lde_factor))),
                   GL(_jnp.repeat(plo.T, block, axis=1),
                      _jnp.repeat(phi.T, block, axis=1)))
        flat = x
        if log_n >= 14:
            out = ntt.ntt_fourstep_cols(flat)
        else:
            out = ntt.ntt_cols(flat, plan)
        out = out.reshape(n, lde_factor, block)
        return (jnp.swapaxes(out.lo, 0, 1), jnp.swapaxes(out.hi, 0, 1))

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _coset_power_limbs_host(log_n: int, lde_factor: int):
    """HOST (lde, n) u32-limb coset power columns (bitreversed-coset
    order). Cached as numpy — caching jnp arrays would capture a tracer
    when first materialized inside a jit trace (the fused oracle-commit
    program) and leak it to later callers."""
    n = 1 << log_n
    lows, highs = [], []
    for coset in ntt.lde_cosets(log_n, lde_factor):
        pows = npgl.powers(int(coset), n)
        lows.append((pows & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        highs.append((pows >> np.uint64(32)).astype(np.uint32))
    return np.stack(lows), np.stack(highs)


def _coset_power_limbs_dev(log_n: int, lde_factor: int):
    lo, hi = _coset_power_limbs_host(log_n, lde_factor)
    return jnp.asarray(lo), jnp.asarray(hi)


def _blocked(fn, x: GL, out_axis_offset: int = 0) -> GL:
    """Apply fn over fixed-width column blocks of (n, k), padding the last."""
    n, k = x.shape
    outs = []
    for start in range(0, k, COL_BLOCK):
        blk_lo = x.lo[:, start:start + COL_BLOCK]
        blk_hi = x.hi[:, start:start + COL_BLOCK]
        pad = COL_BLOCK - blk_lo.shape[1]
        if pad:
            blk_lo = jnp.pad(blk_lo, ((0, 0), (0, pad)))
            blk_hi = jnp.pad(blk_hi, ((0, 0), (0, pad)))
        outs.append(fn(GL(blk_lo, blk_hi)))
    axis = outs[0].lo.ndim - 1
    lo = jnp.concatenate([o.lo for o in outs], axis=axis)[..., :k]
    hi = jnp.concatenate([o.hi for o in outs], axis=axis)[..., :k]
    return GL(lo, hi)


def cols_to_monomials(cols: GL) -> GL:
    """Lagrange values (n, k) on the plain domain -> monomial coeffs (n, k)."""
    n, _ = cols.shape
    return _blocked(_jit_cols_to_monomials(n.bit_length() - 1), cols)


def monomials_to_lde(mono: GL, lde_factor: int) -> GL:
    """(n, k) monomials -> (lde, n, k) bitreversed coset evals."""
    n = mono.shape[0]
    log_n = n.bit_length() - 1
    f = _jit_lde_all_cosets(log_n, lde_factor, COL_BLOCK)
    plo, phi = _coset_power_limbs_dev(log_n, lde_factor)
    return _blocked(lambda b: GL(*f(b.lo, b.hi, plo, phi)), mono)


def lde_flat(lde: GL) -> GL:
    """(lde, n, k) -> (lde*n, k) flattened full-domain bitreversed order."""
    l, n, k = lde.shape
    return lde.reshape(l * n, k)


def leaf_columns(lde: GL) -> GL:
    """(lde, n, k) -> (k, lde*n) leaf-source layout for the Merkle builder."""
    flat = lde_flat(lde)
    return GL(flat.lo.T, flat.hi.T)


# ---------------------------------------------------------------------------
# Extension-field array helpers (GL2 with arbitrary leading shape)
# ---------------------------------------------------------------------------


def ext_const(c, shape=()) -> GL2:
    """(c0, c1) python ints -> broadcastable GL2."""
    return GL2(gl.full(shape, c[0]), gl.full(shape, c[1]))


def ext_inverse(a: GL2) -> GL2:
    """Elementwise Fermat-based extension inverse (lane-parallel)."""
    norm = gl.sub(gl.square(a.c0), gl.mul_by_u32(gl.square(a.c1), ext2.NON_RESIDUE))
    inv_norm = gl.inverse(norm)
    return GL2(gl.mul(a.c0, inv_norm), gl.neg(gl.mul(a.c1, inv_norm)))


def ext_mul_base(a: GL2, b: GL) -> GL2:
    return GL2(gl.mul(a.c0, b), gl.mul(a.c1, b))


def grand_product_exclusive(ratios: GL2) -> GL2:
    """z[0] = 1, z[i] = prod_{k<i} ratios[k].

    Hillis-Steele inclusive scan rolled into a lax.fori_loop (log n
    iterations of one ext mul + roll + mask) — an explicit associative_scan
    builds a log n-level unrolled graph that XLA:CPU compiles pathologically
    slowly."""
    n = ratios.c0.lo.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n

    def body(i, inc):
        shift = jnp.left_shift(jnp.int32(1), i)
        idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
        keep = idx < shift  # identity operand for the first `shift` lanes

        def roll_mask(arr, fill):
            rolled = jnp.roll(arr, shift, axis=0)
            return jnp.where(keep, fill, rolled)

        operand = GL2(
            GL(roll_mask(inc.c0.lo, jnp.uint32(1)), roll_mask(inc.c0.hi, 0)),
            GL(roll_mask(inc.c1.lo, 0), roll_mask(inc.c1.hi, 0)),
        )
        return ext2.mul(inc, operand)

    inclusive = jax.lax.fori_loop(0, log_n, body, ratios)
    one = ext2.ones(())

    def shift1(inc, one_val):
        return jnp.concatenate([one_val[None], inc[:-1]], axis=0)

    return GL2(
        GL(shift1(inclusive.c0.lo, one.c0.lo), shift1(inclusive.c0.hi, one.c0.hi)),
        GL(shift1(inclusive.c1.lo, one.c1.lo), shift1(inclusive.c1.hi, one.c1.hi)),
    )


def powers_of_ext(z, n: int) -> GL2:
    """[z^0 .. z^(n-1)] as GL2 (n,) via associative scan on device."""
    base = ext_const(z, (n,))
    # replace element 0 with 1, then inclusive scan gives z^0..z^(n-1)
    one = ext2.ones(())

    def put_first(arr, v):
        return arr.at[0].set(v)

    seeded = GL2(
        GL(put_first(base.c0.lo, one.c0.lo), put_first(base.c0.hi, one.c0.hi)),
        GL(put_first(base.c1.lo, one.c1.lo), put_first(base.c1.hi, one.c1.hi)),
    )
    return jax.lax.associative_scan(ext2.mul, seeded, axis=0)


def eval_monomials_at_ext(mono: GL, z_pows: GL2) -> list[tuple[int, int]]:
    """Evaluate base-coeff polys (n, k) at the ext point via Σ c_i·z^i.

    Returns host list of (c0, c1) ints, one per poly."""
    c0 = gl.mul(GL(z_pows.c0.lo[:, None], z_pows.c0.hi[:, None]), mono)
    c1 = gl.mul(GL(z_pows.c1.lo[:, None], z_pows.c1.hi[:, None]), mono)
    s0 = _sum_gl(c0, axis=0)
    s1 = _sum_gl(c1, axis=0)
    r0 = gl.to_u64(s0)
    r1 = gl.to_u64(s1)
    return [(int(a), int(b)) for a, b in zip(r0, r1)]


def _sum_gl(a: GL, axis: int) -> GL:
    """Modular sum along an axis via log-tree of gl.add."""
    n = a.shape[axis]
    while n > 1:
        half = n // 2
        lo_idx = [slice(None)] * a.ndim
        hi_idx = [slice(None)] * a.ndim
        lo_idx[axis] = slice(0, half)
        hi_idx[axis] = slice(half, 2 * half)
        rem_idx = [slice(None)] * a.ndim
        rem_idx[axis] = slice(2 * half, n)
        s = gl.add(a[tuple(lo_idx)], a[tuple(hi_idx)])
        if n % 2 == 1:
            rem = a[tuple(rem_idx)]
            pad_idx = [slice(None)] * a.ndim
            pad_idx[axis] = slice(0, 1)
            s = GL(
                jnp.concatenate([s.lo, rem.lo], axis=axis),
                jnp.concatenate([s.hi, rem.hi], axis=axis),
            )
            n = half + 1
        else:
            n = half
        a = s
    sq = [slice(None)] * a.ndim
    sq[axis] = 0
    return a[tuple(sq)]


def sum_ext(a: GL2, axis: int = 0) -> GL2:
    return GL2(_sum_gl(a.c0, axis), _sum_gl(a.c1, axis))


# ---------------------------------------------------------------------------
# Domain constants
# ---------------------------------------------------------------------------


def x_poly_lde_host(n: int, lde_factor: int) -> np.ndarray:
    """Values of the identity poly X over the LDE cosets, host u64,
    shape (lde, n) in the standard bitreversed layout."""
    log_n = n.bit_length() - 1
    omega = gl.domain_generator(log_n)
    rev = ntt.bitreverse_indices(log_n)
    base = npgl.powers(omega, n)[rev]  # ω^bitrev(i)
    cosets = ntt.lde_cosets(log_n, lde_factor)
    out = np.empty((lde_factor, n), np.uint64)
    for k, c in enumerate(cosets):
        out[k] = npgl.mul_scalar(base, c)
    return out


def vanishing_inverse_per_coset(n: int, lde_factor: int) -> np.ndarray:
    """(X^n - 1)^{-1} is constant per LDE coset; (lde,) host u64."""
    cosets = ntt.lde_cosets(n.bit_length() - 1, lde_factor)
    out = np.empty(lde_factor, np.uint64)
    for k, c in enumerate(cosets):
        v = (pow(c, n, npgl.ORDER) - 1) % npgl.ORDER
        out[k] = pow(v, npgl.ORDER - 2, npgl.ORDER)
    return out


def unnormalized_l1_lde_host(n: int, lde_factor: int) -> np.ndarray:
    """(X^n - 1)/(X - 1) over the LDE cosets, (lde, n) host u64
    (reference prover.rs unnormalized_l1_inverse)."""
    x = x_poly_lde_host(n, lde_factor)
    num = np.empty_like(x)
    cosets = ntt.lde_cosets(n.bit_length() - 1, lde_factor)
    for k, c in enumerate(cosets):
        num[k] = (pow(c, n, npgl.ORDER) - 1) % npgl.ORDER
    den = npgl.sub(x, np.uint64(1))
    return npgl.mul(num, npgl.batch_inv(den))
