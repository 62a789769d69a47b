"""Pallas TPU kernel for the batched Poseidon2 permutation.

Reference per-ISA analogue: src/implementations/poseidon2/state_avx512.rs
(the hand-vectorized permutation the CPU build ships per architecture).

Design (round 3, measured on a v5e):
- the batch of 12-element states is laid out as a (96, C) u32 slab — state
  element i occupies sublane rows 8i..8i+8, so EVERY per-element op is a
  perfectly (8,128)-tiled static slice (a (12, B) layout pads sublanes 12->16
  and was ~4.5x off the VPU roofline);
- field ops run on lazy (any-u64) representatives (gl.add_lazy/mul_lazy,
  ~half the op count of canonical ops) with ONE canonicalization at the end —
  bit-identical outputs, asserted against the jnp reference path in tests;
- rounds are rolled into lax.fori_loop with round constants read as SMEM
  scalars: compiles in ~17 s (vs ~150 s unrolled) and runs FASTER
  (52 M perm/s vs 46 M; the jnp XLA path does 8 M perm/s — it cannot keep
  the state out of HBM between rounds);
- all callers share ONE kernel shape: batches are chunked/padded to
  FIXED_BATCH states, so exactly one Mosaic compile serves every tree layer
  and FRI oracle in a prove (cold-start matters: each extra shape is ~17 s).

The jnp `_permutation_stacked` path remains the semantics-defining reference
implementation and the CPU/test implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..field.goldilocks import GL
from .poseidon2 import _DIAG_SHIFTS, _R_F_HALF, _R_P, _RC, _permutation_stacked, _sbox7

TILE = 1024  # lanes per grid step: state slab (96, 1024) u32 x2 = 768 KB VMEM
FIXED_BATCH = 1 << 16  # states per kernel call (bp = 8192 lanes, grid 8)
PALLAS_MIN_BATCH = 1 << 14  # below this the jnp path wins (pad waste)


def _kernel(rc_lo_ref, rc_hi_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    """Rolled Poseidon2 rounds on the (96, C) slab; constants from SMEM."""
    add = gl.add_lazy
    C = lo_ref.shape[1]

    def mds(el):
        # per 4-element block: M4 addition chain; then block-circulant
        # [[2,1,1],[1,2,1],[1,1,2]] (suggested_mds.rs addition chain)
        blocks = []
        for b in range(3):
            x0, x1, x2, x3 = el[4 * b:4 * b + 4]
            t0 = add(x0, x1)
            t1 = add(x2, x3)
            t2 = add(add(x1, x1), t1)
            t3 = add(add(x3, x3), t0)
            t4 = add(add(add(t1, t1), add(t1, t1)), t3)
            t5 = add(add(add(t0, t0), add(t0, t0)), t2)
            blocks.append((add(t3, t5), t5, add(t2, t4), t4))
        total = [add(add(blocks[0][j], blocks[1][j]), blocks[2][j])
                 for j in range(4)]
        return [add(blocks[b][j], total[j]) for b in range(3)
                for j in range(4)]

    def bc(scalar):
        return jnp.full((8, C), scalar, jnp.uint32)

    def full_round(r, carry):
        el = [GL(carry[2 * i], carry[2 * i + 1]) for i in range(12)]
        el = [add(e, GL(bc(rc_lo_ref[r, i]), bc(rc_hi_ref[r, i])))
              for i, e in enumerate(el)]
        el = [_sbox7(e) for e in el]
        el = mds(el)
        return tuple(x for e in el for x in (e.lo, e.hi))

    def partial_round(r, carry):
        el = [GL(carry[2 * i], carry[2 * i + 1]) for i in range(12)]
        c = GL(bc(rc_lo_ref[r, 0]), bc(rc_hi_ref[r, 0]))
        el = [_sbox7(add(el[0], c))] + el[1:]
        total = el[0]
        for e in el[1:]:
            total = add(total, e)
        el = [add(gl.mul_pow2_lazy(el[i], _DIAG_SHIFTS[i]), total)
              for i in range(12)]
        return tuple(x for e in el for x in (e.lo, e.hi))

    el = [GL(lo_ref[8 * i:8 * i + 8], hi_ref[8 * i:8 * i + 8])
          for i in range(12)]
    el = mds(el)
    carry = tuple(x for e in el for x in (e.lo, e.hi))
    carry = jax.lax.fori_loop(0, _R_F_HALF, full_round, carry)
    carry = jax.lax.fori_loop(_R_F_HALF, _R_F_HALF + _R_P,
                              partial_round, carry)
    carry = jax.lax.fori_loop(_R_F_HALF + _R_P, 2 * _R_F_HALF + _R_P,
                              full_round, carry)
    for i in range(12):
        e = gl.canonicalize(GL(carry[2 * i], carry[2 * i + 1]))
        out_lo_ref[8 * i:8 * i + 8] = e.lo
        out_hi_ref[8 * i:8 * i + 8] = e.hi


@functools.lru_cache(maxsize=None)
def _rc_smem():
    rc = np.asarray(_RC, np.uint64).reshape(30, 12)
    return ((rc & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (rc >> np.uint64(32)).astype(np.uint32))


@functools.lru_cache(maxsize=None)
def _perm_pallas_jit(bp: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (bp // TILE,)
    spec = pl.BlockSpec((96, TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    rc_spec = pl.BlockSpec((30, 12), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)

    def f(lo, hi):
        rc_lo, rc_hi = _rc_smem()
        return pl.pallas_call(
            _kernel,
            out_shape=(jax.ShapeDtypeStruct((96, bp), jnp.uint32),
                       jax.ShapeDtypeStruct((96, bp), jnp.uint32)),
            grid=grid,
            in_specs=[rc_spec, rc_spec, spec, spec],
            out_specs=(spec, spec),
            interpret=interpret,
        )(rc_lo, rc_hi, lo, hi)

    return jax.jit(f)


def _perm_slab_fixed(lo, hi, interpret):
    """One kernel call on a (12, FIXED_BATCH) state batch."""
    bp = FIXED_BATCH // 8
    lo = lo.reshape(96, bp)
    hi = hi.reshape(96, bp)
    out_lo, out_hi = _perm_pallas_jit(bp, interpret)(lo, hi)
    return out_lo.reshape(12, FIXED_BATCH), out_hi.reshape(12, FIXED_BATCH)


def permutation_stacked_pallas(st: GL, interpret: bool = False) -> GL:
    """Poseidon2 permutation on stacked (12, B) state via the slab kernel.

    B is chunked/padded to FIXED_BATCH states so every call in the process
    shares ONE compiled kernel. The (12, B) -> (96, B/8) reshape is
    elementwise-consistent (each state element's row splits into 8 sublane
    rows), so results are bit-identical to the jnp path (tested)."""
    b = st.lo.shape[1]
    if b <= FIXED_BATCH:
        lo, hi = st.lo, st.hi
        if b < FIXED_BATCH:
            lo = jnp.pad(lo, ((0, 0), (0, FIXED_BATCH - b)))
            hi = jnp.pad(hi, ((0, 0), (0, FIXED_BATCH - b)))
        out_lo, out_hi = _perm_slab_fixed(lo, hi, interpret)
        return GL(out_lo[:, :b], out_hi[:, :b])
    los, his = [], []
    for start in range(0, b, FIXED_BATCH):
        chunk = GL(st.lo[:, start:start + FIXED_BATCH],
                   st.hi[:, start:start + FIXED_BATCH])
        out = permutation_stacked_pallas(chunk, interpret)
        los.append(out.lo)
        his.append(out.hi)
    return GL(jnp.concatenate(los, axis=1), jnp.concatenate(his, axis=1))


def use_pallas() -> bool:
    """Default ON for TPU backends (opt out with BOOJUM_PALLAS_POSEIDON=0).

    Measured on the v5e (round 3, true dispatch-drained timing): 52 M perm/s
    vs 8 M perm/s for the jnp path — the XLA graph cannot keep the state out
    of HBM between the 30 rounds, the VMEM-resident kernel can."""
    import os
    if os.environ.get("BOOJUM_PALLAS_POSEIDON") == "0":
        return False
    return jax.default_backend() not in ("cpu",)


def permutation_stacked_fast(st: GL) -> GL:
    """Dispatch: Pallas kernel on TPU (large batches), jnp elsewhere. Both
    are the same field math; proofs are byte-identical.

    Small batches (Merkle tail layers, 1-lane transcript states) use the
    UNROLLED jnp permutation: at tiny widths each rolled fori_loop round is
    its own device kernel launch (~0.1 ms), which made every tree's tail
    layers cost ~30 launches per level (round-5 profiling)."""
    if use_pallas() and st.lo.shape[1] >= PALLAS_MIN_BATCH:
        return permutation_stacked_pallas(st)
    if st.lo.shape[1] <= 4096 and jax.default_backend() != "cpu":
        # accelerator only, partially unrolled: at tiny widths each rolled
        # round is its own ~0.1 ms kernel launch; FULL unrolling at every
        # tail layer ballooned the fused commit program to ~30 MB of MLIR
        # and OOM-killed the compile server, so unroll=11 (3 launches/perm)
        # is the balance point
        return _permutation_stacked(st, unroll=11)
    return _permutation_stacked(st)
