"""Pallas TPU NTT kernels.

The jnp NTT (ntt.py) materializes every butterfly stage through HBM
(~2·log n passes over the array), leaving ~50-70x headroom against HBM
bandwidth. These kernels fuse ALL stages of a small NTT in VMEM — one HBM
read + one write per transform — and large sizes decompose four-step style
(n = n1·n2: column NTTs, twiddle scale, row NTTs; both passes use the same
VMEM-resident kernel).

Kernel shape: a (n, 128) u32-limb column block per grid step (n ≤ 4096:
4096·128·2·4B = 4 MB of VMEM); butterflies are reshape + elementwise GL ops
on VMEM arrays; per-stage twiddles ride along as one concatenated
[stage0 n/2 | stage1 n/4 | …] table whose slices are static.

Semantics identical to ntt.ntt_cols / intt_cols (natural -> bitreversed DIF
forward; bitreversed -> natural inverse), verified against them in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import goldilocks as gl
from ..field.goldilocks import GL, ORDER
from ..utils import npgl
from . import ntt as jntt

LANES = 128


def _stage_tables_host(log_n: int, inverse: bool) -> np.ndarray:
    """Concatenated per-stage twiddles, shape (n-1,) u64 (+1 pad slot)."""
    n = 1 << log_n
    omega = gl.domain_generator(log_n)
    if inverse:
        omega = pow(omega, ORDER - 2, ORDER)
    full = npgl.powers(omega, max(n // 2, 1))
    parts = []
    for k in range(log_n):
        half = n >> (k + 1)
        parts.append(np.ascontiguousarray(full[:: 1 << k][:half]))
    out = np.concatenate(parts) if parts else np.zeros(0, np.uint64)
    return np.concatenate([out, np.zeros(1, np.uint64)])  # pad to n


def _kernel_body(log_n: int, inverse: bool, n_inv: int,
                 x_lo_ref, x_hi_ref, tw_lo_ref, tw_hi_ref,
                 o_lo_ref, o_hi_ref):
    n = 1 << log_n
    tw_lo = tw_lo_ref[:]
    tw_hi = tw_hi_ref[:]

    stages = list(range(log_n)) if not inverse else list(reversed(range(log_n)))
    offsets = []
    o = 0
    for k in range(log_n):
        offsets.append(o)
        o += n >> (k + 1)

    # write through the output refs between stages — bounds Mosaic's scoped
    # VMEM liveness to one stage's temporaries instead of the whole unroll
    o_lo_ref[:] = x_lo_ref[:]
    o_hi_ref[:] = x_hi_ref[:]

    for k in stages:
        half = n >> (k + 1)
        m = 1 << k
        o = offsets[k]
        w = GL(tw_lo[:, o:o + half], tw_hi[:, o:o + half])
        x = GL(o_lo_ref[:], o_hi_ref[:])
        xr = x.reshape(m, 2, half, LANES)
        wb = GL(w.lo.reshape(1, half, 1), w.hi.reshape(1, half, 1))
        if not inverse:
            u = xr[:, 0]
            v = xr[:, 1]
            s = gl.add(u, v)
            t = gl.mul(gl.sub(u, v), wb)
            x = gl.stack([s, t], axis=1).reshape(n, LANES)
        else:
            s = xr[:, 0]
            t = xr[:, 1]
            tv = gl.mul(t, wb)
            x = gl.stack([gl.add(s, tv), gl.sub(s, tv)], axis=1).reshape(n, LANES)
        o_lo_ref[:] = x.lo
        o_hi_ref[:] = x.hi
    if inverse:
        x = GL(o_lo_ref[:], o_hi_ref[:])
        x = gl.mul(x, GL(jnp.full((1, 1), n_inv & 0xFFFFFFFF, jnp.uint32),
                         jnp.full((1, 1), n_inv >> 32, jnp.uint32)))
        o_lo_ref[:] = x.lo
        o_hi_ref[:] = x.hi


@functools.lru_cache(maxsize=None)
def _build_kernel(log_n: int, inverse: bool, interpret: bool = False):
    n = 1 << log_n
    n_inv = pow(n, ORDER - 2, ORDER)
    body = functools.partial(_kernel_body, log_n, inverse, n_inv)

    def call(x_lo, x_hi, tw_lo, tw_hi):
        batch_tiles = x_lo.shape[1] // LANES
        return pl.pallas_call(
            body,
            grid=(batch_tiles,),
            in_specs=[
                pl.BlockSpec((n, LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((n, LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(x_lo.shape, jnp.uint32),
                jax.ShapeDtypeStruct(x_hi.shape, jnp.uint32),
            ],
            interpret=interpret,
        )(x_lo, x_hi, tw_lo, tw_hi)

    return call


@functools.lru_cache(maxsize=None)
def _twiddles_dev_host(log_n: int, inverse: bool):
    t = _stage_tables_host(log_n, inverse)
    lo = (t & 0xFFFFFFFF).astype(np.uint32)[None, :]
    hi = (t >> 32).astype(np.uint32)[None, :]
    return lo, hi


def ntt_small(x: GL, log_n: int, inverse: bool = False,
              interpret: bool = None) -> GL:
    """NTT along axis 0 of (n, B) with n = 2^log_n ≤ 4096; B padded to a
    lane multiple. Forward: natural -> bitreversed. Inverse: bitreversed ->
    natural (with 1/n scaling)."""
    n, b = x.shape
    assert n == 1 << log_n
    pad = (-b) % LANES
    lo, hi = x.lo, x.hi
    if pad:
        lo = jnp.pad(lo, ((0, 0), (0, pad)))
        hi = jnp.pad(hi, ((0, 0), (0, pad)))
    if interpret is None:
        import jax as _jax
        interpret = _jax.default_backend() == "cpu"
    tw_lo, tw_hi = _twiddles_dev_host(log_n, inverse)
    out_lo, out_hi = _build_kernel(log_n, inverse, interpret)(lo, hi,
                                                   jnp.asarray(tw_lo),
                                                   jnp.asarray(tw_hi))
    if pad:
        out_lo = out_lo[:, :b]
        out_hi = out_hi[:, :b]
    return GL(out_lo, out_hi)


# ---------------------------------------------------------------------------
# Four-step decomposition for n1·n2 sizes (up to 2^24)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _fourstep_twiddles_host(log_n1: int, log_n2: int):
    """w[p1, j2] = ω_n^{bitrev_{n1}(p1)·j2} — cross twiddles between the
    passes (the first pass outputs rows in bitreversed-k1 order)."""
    n1, n2 = 1 << log_n1, 1 << log_n2
    omega = gl.domain_generator(log_n1 + log_n2)
    rev = jntt.bitreverse_indices(log_n1)
    rows = []
    for p1 in range(n1):
        rows.append(npgl.powers(pow(omega, int(rev[p1]), ORDER), n2))
    w = np.stack(rows)  # (n1, n2)
    return ((w & 0xFFFFFFFF).astype(np.uint32), (w >> 32).astype(np.uint32))


MAX_SMALL_LOG = 9  # (512, 128) u32 blocks: ~1.3 MB live VMEM incl. temps


def ntt_any(x: GL, log_n: int) -> GL:
    """Forward NTT natural -> bitreversed for any 2^log_n, recursing through
    the four-step decomposition until passes fit the VMEM kernel."""
    if log_n <= MAX_SMALL_LOG:
        return ntt_small(x, log_n)
    log_n1 = min(MAX_SMALL_LOG, log_n - 1)
    if log_n - log_n1 > MAX_SMALL_LOG:
        log_n1 = log_n // 2
    return ntt_fourstep(x, log_n, log_n1)


def ntt_fourstep(x: GL, log_n: int, log_n1: int = None) -> GL:
    """Forward NTT (natural -> bitreversed) of (n, B) via two VMEM-kernel
    passes over n = n1·n2.

    Derivation: with j = j1·n2 + j2 and k = k1 + n1·k2,
      ω^{jk} = ω_{n1}^{j1·k1} · ω_n^{j2·k1} · ω_{n2}^{j2·k2},
    so   A[k1, j2]  = NTT_{n1} over j1,
         B[k1, k2]  = NTT_{n2} over j2 of (A[k1, j2] · ω_n^{j2·k1}).
    With both passes emitting bitreversed rows (p1 ↦ bitrev k1,
    p2 ↦ bitrev k2), the full-size bitreversed output is exactly the
    row-major flatten of B'[p1, p2] (bitrev_n of p1·n2+p2 = k1 + n1·k2).
    """
    n, b = x.shape
    assert n == 1 << log_n
    if log_n1 is None:
        log_n1 = (log_n + 1) // 2
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2

    xv = x.reshape(n1, n2, b)  # axis 0 = j1 (slow index of j)
    # pass 1: NTT_{n1} over j1, batched over (n2·b)
    s1 = ntt_any(xv.reshape(n1, n2 * b), log_n1).reshape(n1, n2, b)
    # cross twiddles
    tw_lo, tw_hi = _fourstep_twiddles_host(log_n1, log_n2)
    w = GL(jnp.asarray(tw_lo)[:, :, None], jnp.asarray(tw_hi)[:, :, None])
    s1 = gl.mul(s1, w)
    # pass 2: NTT_{n2} over j2: transpose j2 to axis 0
    s1t = GL(jnp.swapaxes(s1.lo, 0, 1), jnp.swapaxes(s1.hi, 0, 1))  # (n2,n1,b)
    s2 = ntt_any(s1t.reshape(n2, n1 * b), log_n2).reshape(n2, n1, b)
    # B'[p1, p2] row-major = the bitreversed full output
    out = GL(jnp.swapaxes(s2.lo, 0, 1).reshape(n, b),
             jnp.swapaxes(s2.hi, 0, 1).reshape(n, b))
    return out
