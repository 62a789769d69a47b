"""Pallas TPU kernel for the batched Poseidon2 permutation.

Reference per-ISA analogue: src/implementations/poseidon2/state_avx512.rs
(the hand-vectorized permutation the CPU build ships per architecture).

Why a kernel at all: the jnp `_permutation_stacked` path is semantically
identical but XLA materializes the (12, B) state between rounds — at
B = 2^19 that is ~30 round-trips of ~50 MB through HBM, measured ~94 ms per
call on a v5e. The Pallas kernel tiles the batch over the lane dimension and
keeps the state in VMEM for all 30 rounds: one HBM read + one write per
element. The field math is THE SAME CODE (`_permutation_stacked` from
poseidon2.py traced inside the kernel), so bit-identity with the jnp path is
structural, and tests assert it.

Used automatically by the Merkle/tree layer on TPU backends; the jnp path
remains the semantics-defining reference and the CPU/test implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field.goldilocks import GL
from .poseidon2 import _permutation_stacked

# (12, TILE) u32 x 4 buffers (in lo/hi + out lo/hi) plus round scratch:
# 12*2048*4B = 96 KB per buffer — comfortably inside ~16 MB VMEM.
TILE = 2048


def _kernel(rc_lo_ref, rc_hi_ref, shifts_ref, lo_ref, hi_ref,
            out_lo_ref, out_hi_ref):
    """Same round structure as poseidon2._permutation_stacked (the shared
    _sbox7 / _external_mds_stacked / _internal_matrix_stacked building
    blocks ARE that implementation), with round constants read from VMEM
    refs via dynamic ref indexing — lax.dynamic_slice on captured values
    has no Pallas TPU lowering."""
    from ..field import goldilocks as gl
    from .poseidon2 import (_R_F_HALF, _R_P, _external_mds_stacked,
                            _internal_matrix_stacked, _sbox7)

    shifts = shifts_ref[:]

    def full_round(r, st):
        # static slices — dynamic VMEM lane-dim indexing has no TC lowering
        c = GL(rc_lo_ref[:, r:r + 1], rc_hi_ref[:, r:r + 1])
        st = gl.add(st, c)  # (12, T) + (12, 1) broadcast
        st = _sbox7(st)
        return _external_mds_stacked(st)

    def partial_round(r, st):
        c = GL(rc_lo_ref[0, r:r + 1], rc_hi_ref[0, r:r + 1])
        row0 = _sbox7(gl.add(st[0], c))
        # concatenate instead of .at[0].set — scatter has no TC lowering
        st = GL(jnp.concatenate([row0.lo[None], st.lo[1:]], axis=0),
                jnp.concatenate([row0.hi[None], st.hi[1:]], axis=0))
        return _internal_matrix_stacked(st, shifts)

    st = GL(lo_ref[:], hi_ref[:])
    st = _external_mds_stacked(st)
    for r in range(_R_F_HALF):  # unrolled: constants at static offsets
        st = full_round(r, st)
    for r in range(_R_F_HALF, _R_F_HALF + _R_P):
        st = partial_round(r, st)
    for r in range(_R_F_HALF + _R_P, 2 * _R_F_HALF + _R_P):
        st = full_round(r, st)
    out_lo_ref[:] = st.lo
    out_hi_ref[:] = st.hi


@functools.lru_cache(maxsize=None)
def _tables_host():
    # NUMPY constants (not jnp): this runs under an outer jit trace when the
    # tree builder traces the kernel — jnp values here would be tracers and
    # poison the lru_cache
    from .poseidon2 import _DIAG_SHIFTS, _RC
    rc = np.asarray(_RC, np.uint64).reshape(30, 12).T  # (12, 30)
    rc_lo = (rc & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    rc_hi = (rc >> np.uint64(32)).astype(np.uint32)
    shifts = np.asarray([1 << s for s in _DIAG_SHIFTS], np.uint32)
    return (rc_lo, rc_hi, shifts)


@functools.lru_cache(maxsize=None)
def _perm_pallas_jit(b_padded: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (b_padded // TILE,)
    spec = pl.BlockSpec((12, TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    # constants replicated to every grid step
    rc_spec = pl.BlockSpec((12, 30), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    sh_spec = pl.BlockSpec((12,), lambda i: (0,),
                           memory_space=pltpu.VMEM)

    def f(lo, hi):
        rc_lo, rc_hi, shifts = _tables_host()
        return pl.pallas_call(
            _kernel,
            out_shape=(jax.ShapeDtypeStruct((12, b_padded), jnp.uint32),
                       jax.ShapeDtypeStruct((12, b_padded), jnp.uint32)),
            grid=grid,
            in_specs=[rc_spec, rc_spec, sh_spec, spec, spec],
            out_specs=(spec, spec),
            interpret=interpret,
        )(rc_lo, rc_hi, shifts, lo, hi)

    return jax.jit(f)


def permutation_stacked_pallas(st: GL, interpret: bool = False) -> GL:
    """Poseidon2 permutation on stacked (12, B) state via the Pallas kernel.
    B is padded up to a TILE multiple (pad lanes hash garbage, dropped)."""
    b = st.lo.shape[1]
    b_padded = -(-b // TILE) * TILE
    lo, hi = st.lo, st.hi
    if b_padded != b:
        lo = jnp.pad(lo, ((0, 0), (0, b_padded - b)))
        hi = jnp.pad(hi, ((0, 0), (0, b_padded - b)))
    out_lo, out_hi = _perm_pallas_jit(b_padded, interpret)(lo, hi)
    if b_padded != b:
        out_lo = out_lo[:, :b]
        out_hi = out_hi[:, :b]
    return GL(out_lo, out_hi)


def use_pallas() -> bool:
    """Opt-in (BOOJUM_PALLAS_POSEIDON=1) and TPU-only. Measured on a v5e:
    the kernel is bit-identical and ~15% faster than the jnp path per call
    (89 ms vs 103 ms per 2^19-lane permutation — the op is compute-bound on
    VPU integer multiplies, not HBM bandwidth, so keeping state in VMEM buys
    little), but every pallas_call site inside a traced tree builder costs a
    separate Mosaic kernel compile (minutes each on a small host), which
    made cold proves pathological. The jnp path therefore stays the default
    tree hash; the kernel remains available for flat few-shape call sites."""
    import os
    if os.environ.get("BOOJUM_PALLAS_POSEIDON") != "1":
        return False
    return jax.default_backend() not in ("cpu",)


def permutation_stacked_fast(st: GL) -> GL:
    """Dispatch: Pallas kernel on TPU, jnp reference elsewhere. Both are the
    same field math; proofs are byte-identical either way."""
    if use_pallas():
        return permutation_stacked_pallas(st)
    return _permutation_stacked(st)
