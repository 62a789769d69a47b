"""Radix-2 NTT / iNTT / LDE over Goldilocks, TPU-native.

Reference behavior: src/fft/mod.rs — ``fft_natural_to_bitreversed`` (:398),
``ifft_natural_to_natural`` (:464), ``distribute_powers`` (:308), twiddle
precompute (:625). Semantics reproduced here:

    ntt_cols(x)[i, l]  = f_l(coset · ω^{bitrev(i)})   (DIF, natural input,
                                                       bitreversed output)
    intt_cols(y)       = inverse of the above (bitreversed evals → natural
                         monomial coefficients, coset un-shifted)

TPU design: the core primitive transforms **axis 0 of a 2D array** ``(n, B)``
where B is a batch of polynomial columns — the prover stores traces
row-major ``(rows, cols)``, so columns batch onto the TPU lane dimension with
no relayout, which replaces the reference's ``MixedGL`` SIMD interleaving
games entirely. Each butterfly stage is a reshape + elementwise GL ops that
XLA fuses; twiddles are per-stage device constants.

Stage structure (DIF): at stage k the array is viewed as
``(2^k, 2, half, B)`` with ``half = n >> (k+1)``; the butterfly is
``(u, v) -> (u + v, (u - v) * w)`` with ``w[j] = ω^{j · 2^k}``.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..field.goldilocks import GL, ORDER


def bitreverse_indices(log_n: int) -> np.ndarray:
    """Host-side bitreversal permutation (reference src/fft/mod.rs:41)."""
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev.astype(np.int64)


def bitreverse_gl(x: GL, axis: int = 0) -> GL:
    """Apply the bitreversal permutation along ``axis`` (device gather)."""
    n = x.shape[axis]
    perm = jnp.asarray(bitreverse_indices(int(n).bit_length() - 1))
    return GL(jnp.take(x.lo, perm, axis=axis), jnp.take(x.hi, perm, axis=axis))


@functools.lru_cache(maxsize=None)
def _powers_u64(base: int, count: int) -> np.ndarray:
    """Exact host table [base^0, …, base^(count-1)] mod p (doubling ladder)."""
    out = np.empty(count, dtype=np.uint64)
    if count == 0:
        return out
    out[0] = 1
    have = 1
    while have < count:
        step = pow(base, have, ORDER)
        take = min(have, count - have)
        # out[have:have+take] = out[:take] * step (exact via Python ints)
        chunk = [(int(v) * step) % ORDER for v in out[:take]]
        out[have:have + take] = np.array(chunk, dtype=np.uint64)
        have += take
    return out


def materialize_powers(base: int, count: int) -> GL:
    """Device GL array of base^i, i < count (reference utils.rs:31)."""
    return gl.from_u64(_powers_u64(base, count))


class NttPlan:
    """Precomputed twiddle tables for one domain size (device constants).

    Mirrors the role of ``Twiddles``/``precompute_twiddles_for_fft_wrapper``
    (src/fft/mod.rs:625) but stores one table per butterfly stage so the jitted
    stages index nothing.
    """

    def __init__(self, log_n: int):
        self.log_n = log_n
        n = 1 << log_n
        self.n = n
        omega = gl.domain_generator(log_n)
        omega_inv = gl.s_inv(omega)
        self.omega = omega
        self.n_inv = gl.s_inv(n)
        fwd_full = _powers_u64(omega, max(n // 2, 1))
        inv_full = _powers_u64(omega_inv, max(n // 2, 1))
        # stage k uses ω^{j·2^k} for j < n >> (k+1). Tables are HOST numpy:
        # lifting to device happens per use, so a plan cached from inside one
        # jax trace never leaks tracers into another (shard_map re-traces).
        self.fwd_twiddles_host = []
        self.inv_twiddles_host = []
        for k in range(log_n):
            half = n >> (k + 1)
            self.fwd_twiddles_host.append(np.ascontiguousarray(fwd_full[:: 1 << k][:half]))
            self.inv_twiddles_host.append(np.ascontiguousarray(inv_full[:: 1 << k][:half]))

    def fwd_twiddle(self, k: int) -> GL:
        return gl.from_u64(self.fwd_twiddles_host[k])

    def inv_twiddle(self, k: int) -> GL:
        return gl.from_u64(self.inv_twiddles_host[k])


@functools.lru_cache(maxsize=None)
def get_plan(log_n: int) -> NttPlan:
    return NttPlan(log_n)


def _butterfly_fwd(x: GL, tw: GL, k: int, n: int, batch: int) -> GL:
    half = n >> (k + 1)
    x = x.reshape(1 << k, 2, half, batch)
    u = x[:, 0]
    v = x[:, 1]
    s = gl.add(u, v)
    t = gl.mul(gl.sub(u, v), GL(tw.lo[None, :, None], tw.hi[None, :, None]))
    return gl.stack([s, t], axis=1).reshape(n, batch)


def _butterfly_inv(x: GL, tw: GL, k: int, n: int, batch: int) -> GL:
    half = n >> (k + 1)
    x = x.reshape(1 << k, 2, half, batch)
    s = x[:, 0]
    t = x[:, 1]
    tv = gl.mul(t, GL(tw.lo[None, :, None], tw.hi[None, :, None]))
    u = gl.add(s, tv)
    v = gl.sub(s, tv)
    return gl.stack([u, v], axis=1).reshape(n, batch)


def ntt_cols(x: GL, plan: NttPlan) -> GL:
    """Forward NTT along axis 0 of (n, B): natural coeffs → bitreversed evals."""
    n, batch = x.shape
    assert n == plan.n
    for k in range(plan.log_n):
        x = _butterfly_fwd(x, plan.fwd_twiddle(k), k, n, batch)
    return x


def intt_cols(y: GL, plan: NttPlan) -> GL:
    """Inverse NTT along axis 0 of (n, B): bitreversed evals → natural coeffs."""
    n, batch = y.shape
    assert n == plan.n
    for k in reversed(range(plan.log_n)):
        y = _butterfly_inv(y, plan.inv_twiddle(k), k, n, batch)
    n_inv = gl.full((1, 1), plan.n_inv)
    return gl.mul(y, gl.broadcast_to(n_inv, (n, batch)))


def distribute_powers(x: GL, base: int) -> GL:
    """x[i, :] *= base^i (reference src/fft/mod.rs:308)."""
    n = x.shape[0]
    powers = materialize_powers(base, n)
    return gl.mul(x, GL(powers.lo[:, None], powers.hi[:, None]))


def coset_ntt_cols(x: GL, coset: int, plan: NttPlan) -> GL:
    """Evals of f on the coset ``coset · <ω>`` in bitreversed order."""
    if coset != 1:
        x = distribute_powers(x, coset)
    return ntt_cols(x, plan)


def coset_intt_cols(y: GL, coset: int, plan: NttPlan) -> GL:
    """Inverse of :func:`coset_ntt_cols`."""
    x = intt_cols(y, plan)
    if coset != 1:
        x = distribute_powers(x, gl.s_inv(coset))
    return x


def lde_cosets(log_n: int, lde_factor: int) -> list[int]:
    """The lde_factor coset shifts g·ω_lde^k used by the reference's LDE
    (transform_monomials_to_lde, src/cs/implementations/utils.rs:311):
    coset k evaluates f on (g · ω_{n·lde}^{bitrev_lde(k)}) · <ω_n>.

    We enumerate cosets in **bitreversed order of k** so that the
    concatenation [coset_0 evals | coset_1 evals | …] with per-coset
    bitreversed ordering equals the bitreversed enumeration of the full
    degree-(n·lde) domain evaluation of f on g·<ω_{n·lde}>."""
    full_log = log_n + (lde_factor.bit_length() - 1)
    omega_big = gl.domain_generator(full_log)
    g = gl.MULTIPLICATIVE_GENERATOR
    log_lde = lde_factor.bit_length() - 1
    rev = bitreverse_indices(log_lde) if log_lde > 0 else np.array([0])
    return [gl.s_mul(g, gl.s_pow(omega_big, int(rev[k]))) for k in range(lde_factor)]


def lde_from_monomials(coeffs: GL, log_n: int, lde_factor: int) -> GL:
    """LDE: monomial coefficients (n, B) → (lde_factor, n, B) bitreversed
    coset evals. Output axis-0 index k is the bitreversed-coset enumeration
    (see :func:`lde_cosets`), matching the reference's storage convention
    (GenericLdeStorage, src/cs/implementations/polynomial/lde.rs:106)."""
    plan = get_plan(log_n)
    outs = [coset_ntt_cols(coeffs, c, plan) for c in lde_cosets(log_n, lde_factor)]
    return gl.stack(outs, axis=0)


def monomials_from_lde_coset0(evals: GL, log_n: int, lde_factor: int) -> GL:
    """Recover monomials from the first stored coset's evals (n, B)."""
    plan = get_plan(log_n)
    coset = lde_cosets(log_n, lde_factor)[0]
    return coset_intt_cols(evals, coset, plan)


def use_mxu() -> bool:
    """Route four-step passes of size 128/256 to the MXU matmul stage
    (mxu_ntt) on TPU backends. Opt out with BOOJUM_MXU_NTT=0."""
    import os

    import jax
    if os.environ.get("BOOJUM_MXU_NTT") == "0":
        return False
    return jax.default_backend() not in ("cpu",)


def _pass_ntt(xv: GL, log_r: int, inverse: bool = False) -> GL:
    """One four-step pass: transform axis 0 of (2^log_r, M). Dispatches to
    the MXU matmul stage (128/256), recursive four-step (large), or the VPU
    butterfly plan."""
    if use_mxu() and log_r in (7, 8):
        from .mxu_ntt import ntt_cols_matmul
        return ntt_cols_matmul(xv, inverse=inverse)
    if use_mxu() and log_r > 8:
        return (intt_fourstep_cols if inverse else ntt_fourstep_cols)(xv)
    plan = get_plan(log_r)
    return intt_cols(xv, plan) if inverse else ntt_cols(xv, plan)


def _fourstep_split(log_n: int) -> int:
    """log_n1 choice: balanced by default; under MXU prefer radix-256
    stages (recursion handles the rest)."""
    if use_mxu() and log_n > 16:
        return 8
    return (log_n + 1) // 2


def ntt_fourstep_cols(x: GL, log_n1: int = None) -> GL:
    """Forward NTT (natural -> bitreversed) of one LARGE (n, B) batch via the
    four-step decomposition — both passes are wide column-batched NTTs, so a
    2^24-point transform runs at full lane utilization instead of the (n, 1)
    degenerate layout (and compiles two ~half-depth programs instead of one
    24-stage graph). On TPU the 128/256-point passes run as MXU int8 matmul
    stages (mxu_ntt) — the reference's one optimized kernel
    (src/fft/mod.rs:852 MixedGL NTT) maps to the systolic array here.

    Same derivation as the Pallas kernel (pallas_ntt.ntt_fourstep): with
    j = j1·n2 + j2, k = k1 + n1·k2 and both passes emitting bitreversed
    rows, the row-major (p1, p2) flatten IS the full bitreversed output.
    """
    n, b = x.shape
    log_n = n.bit_length() - 1
    if log_n1 is None:
        log_n1 = _fourstep_split(log_n)
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2

    from .pallas_ntt import _fourstep_twiddles_host
    tw_lo, tw_hi = _fourstep_twiddles_host(log_n1, log_n2)

    # TPU layout rule (round-5 profiling): elementwise math must stay 2-D
    # lane-major — a (r, m, b) elementwise view with a narrow trailing dim
    # runs ~100x off the VPU roofline (measured 1.9-2.4 s for ONE 2^24
    # cross-twiddle mul at b=8), and `jnp.repeat` materializes through the
    # same bad layout. Lanes are therefore BATCH-MAJOR (c, j2): the cross
    # twiddle of lane l is column l % n2 of the (n1, n2) table, so it fuses
    # into the MXU stage kernel via a BlockSpec index map (no expansion at
    # all; _pass_tw_fwd), and the non-kernel fallback expands with
    # `jnp.tile` (pure block concat). Transposes are data movement (fast).
    if b == 1:
        xv = x.reshape(n1, n2)
    else:
        x3 = x.reshape(n1, n2, b)
        xv = GL(jnp.swapaxes(x3.lo, 1, 2).reshape(n1, b * n2),
                jnp.swapaxes(x3.hi, 1, 2).reshape(n1, b * n2))
    s1 = _pass_tw_fwd(xv, log_n1, tw_lo, tw_hi)  # rows p1, lanes (c, j2)
    if b == 1:
        s2 = _pass_ntt(GL(s1.lo.T, s1.hi.T), log_n2)
        return GL(s2.lo.T.reshape(n, 1), s2.hi.T.reshape(n, 1))
    s1t = GL(
        jnp.transpose(s1.lo.reshape(n1, b, n2), (2, 1, 0))
        .reshape(n2, b * n1),
        jnp.transpose(s1.hi.reshape(n1, b, n2), (2, 1, 0))
        .reshape(n2, b * n1))
    s2 = _pass_ntt(s1t, log_n2)  # rows p2, lanes (c, p1)
    return GL(
        jnp.transpose(s2.lo.reshape(n2, b, n1), (2, 0, 1)).reshape(n, b),
        jnp.transpose(s2.hi.reshape(n2, b, n1), (2, 0, 1)).reshape(n, b))


def _pass_tw_fwd(xv: GL, log_r: int, tw_lo, tw_hi) -> GL:
    """Forward pass + cross twiddle: stage(xv)[r, l] * tw[r, l % n2].

    Fused into the MXU stage kernel when the pass is a direct Pallas radix
    (saves the twiddle's HBM round trip + expansion); jnp.tile fallback
    otherwise (CPU / small radixes) — identical canonical outputs."""
    if use_mxu() and log_r in (7, 8):
        from .mxu_ntt import ntt_cols_matmul
        return ntt_cols_matmul(xv, tw=(jnp.asarray(tw_lo),
                                       jnp.asarray(tw_hi)))
    s = _pass_ntt(xv, log_r)
    reps = s.shape[1] // tw_lo.shape[1]
    return gl.mul(s, GL(jnp.tile(jnp.asarray(tw_lo), (1, reps)),
                        jnp.tile(jnp.asarray(tw_hi), (1, reps))))


def _pass_tw_inv(s1: GL, log_r: int, wi_lo, wi_hi) -> GL:
    """Inverse cross twiddle + inverse pass: istage(s1 * wi)."""
    if use_mxu() and log_r in (7, 8):
        from .mxu_ntt import ntt_cols_matmul
        return ntt_cols_matmul(s1, inverse=True,
                               tw=(jnp.asarray(wi_lo), jnp.asarray(wi_hi)),
                               tw_pre=True)
    reps = s1.shape[1] // wi_lo.shape[1]
    s1 = gl.mul(s1, GL(jnp.tile(jnp.asarray(wi_lo), (1, reps)),
                       jnp.tile(jnp.asarray(wi_hi), (1, reps))))
    return _pass_ntt(s1, log_r, inverse=True)


def _rep_lanes(a, b):
    """(r, m) -> (r, m*b): each lane repeated b times (2-D throughout)."""
    return a if b == 1 else jnp.repeat(a, b, axis=1)


def intt_fourstep_cols(y: GL, log_n1: int = None) -> GL:
    """Inverse of :func:`ntt_fourstep_cols` (bitreversed evals -> natural
    coeffs) — inverse passes in reverse order, dividing the cross twiddles:
    iNTT_{n2} over p2, · w[p1,j2]^{-1}, iNTT_{n1} over p1."""
    n, b = y.shape
    log_n = n.bit_length() - 1
    if log_n1 is None:
        log_n1 = _fourstep_split(log_n)
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2

    from .pallas_ntt import _fourstep_twiddles_host
    from ..utils import npgl
    tw_lo, tw_hi = _fourstep_twiddles_host(log_n1, log_n2)
    tw = (tw_lo.astype(np.uint64) | (tw_hi.astype(np.uint64) << np.uint64(32)))
    tw_inv = npgl.batch_inv(tw.reshape(-1)).reshape(n1, n2)
    wil = jnp.asarray((tw_inv & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    wih = jnp.asarray((tw_inv >> np.uint64(32)).astype(np.uint32))

    # batch-major lane order throughout (see ntt_fourstep_cols layout rule)
    if b == 1:
        yv = y.reshape(n1, n2)  # (p1, p2)
        s1t = _pass_ntt(GL(yv.lo.T, yv.hi.T), log_n2, inverse=True)
        x = _pass_tw_inv(GL(s1t.lo.T, s1t.hi.T), log_n1, wil, wih)
        return x.reshape(n, 1)
    y3 = y.reshape(n1, n2, b)  # (p1, p2, c)
    s2t = GL(
        jnp.transpose(y3.lo, (1, 2, 0)).reshape(n2, b * n1),
        jnp.transpose(y3.hi, (1, 2, 0)).reshape(n2, b * n1))
    s1t = _pass_ntt(s2t, log_n2, inverse=True)  # rows j2, lanes (c, p1)
    s1 = GL(
        jnp.transpose(s1t.lo.reshape(n2, b, n1), (2, 1, 0))
        .reshape(n1, b * n2),
        jnp.transpose(s1t.hi.reshape(n2, b, n1), (2, 1, 0))
        .reshape(n1, b * n2))  # rows p1, lanes (c, j2)
    x = _pass_tw_inv(s1, log_n1, wil, wih)  # rows j1, lanes (c, j2)
    x3 = GL(jnp.transpose(x.lo.reshape(n1, b, n2), (0, 2, 1)),
            jnp.transpose(x.hi.reshape(n1, b, n2), (0, 2, 1)))
    return x3.reshape(n, b)


def coset_intt_fourstep_cols(y: GL, coset: int) -> GL:
    """coset_intt_cols via the four-step inverse (for large single polys)."""
    x = intt_fourstep_cols(y)
    if coset != 1:
        x = distribute_powers(x, gl.s_inv(coset))
    return x
