"""Classic Poseidon permutation over Goldilocks, width 12 (Plonky2-compatible).

Reference behavior: src/implementations/poseidon_goldilocks_naive.rs — the
non-optimized but semantics-defining path (full/partial rounds at :123-147,
MDS circulant of powers of two, constants shared with Poseidon2). Used by the
``GoldilocksPoisedonTranscript`` (reference transcript.rs:131-139) and as an
alternative tree hasher.

TPU design mirrors :mod:`poseidon2`: batch is a list of 12 GL arrays; the MDS
circulant rows are power-of-two scalings (exps <= 16), so each output element
is a sum of 12 ``mul_by_u32`` terms — still pure VPU elementwise work.
"""

from __future__ import annotations

from ..field import goldilocks as gl
from ..field.goldilocks import GL, ORDER
from . import _poseidon_constants as C
from .poseidon2 import _sbox7, _s_sbox7  # same x^7 S-box

STATE_WIDTH = C.STATE_WIDTH
RATE = C.RATE
CAPACITY = C.CAPACITY

_RC = C.ALL_ROUND_CONSTANTS
_R_F_HALF = C.HALF_NUM_FULL_ROUNDS
_R_P = C.NUM_PARTIAL_ROUNDS
_EXPS = C.MDS_MATRIX_EXPS

# MDS[row][col] = 2^EXPS[(12 - row + col) % 12]
_MDS_POW = [[1 << _EXPS[(12 - r + c) % 12] for c in range(12)] for r in range(12)]


def mds(state: list[GL]) -> list[GL]:
    out = []
    for r in range(12):
        acc = None
        for c in range(12):
            term = gl.mul_by_u32(state[c], _MDS_POW[r][c])
            acc = term if acc is None else gl.add(acc, term)
        out.append(acc)
    return out


def _add_rc(state: list[GL], r: int) -> list[GL]:
    shape = state[0].shape
    return [gl.add(s, gl.full(shape, _RC[r * 12 + i])) for i, s in enumerate(state)]


def permutation(state: list[GL]) -> list[GL]:
    assert len(state) == STATE_WIDTH
    r = 0
    for _ in range(_R_F_HALF):
        state = _add_rc(state, r)
        state = [_sbox7(s) for s in state]
        state = mds(state)
        r += 1
    for _ in range(_R_P):
        state = _add_rc(state, r)
        state = [_sbox7(state[0])] + state[1:]
        state = mds(state)
        r += 1
    for _ in range(_R_F_HALF):
        state = _add_rc(state, r)
        state = [_sbox7(s) for s in state]
        state = mds(state)
        r += 1
    return state


def permutation_gl(state: GL) -> GL:
    out = permutation([state[i] for i in range(STATE_WIDTH)])
    return gl.stack(out, axis=0)


def _permutation_rolled_gl(st: GL, unroll: int = 1) -> GL:
    """Rolled stacked permutation on (12, B): rounds ride lax.fori_loop with
    constants indexed per round, MDS rows are lazy shift-reduce sums (the
    circulant entries are powers of two). ~10x smaller traced graph than the
    unrolled form (which compiles pathologically on XLA:CPU when embedded in
    outer scans, e.g. the device transcript); bit-identical output."""
    import jax
    import jax.numpy as jnp

    from .poseidon2 import _rc_tables

    rc_lo, rc_hi = _rc_tables()
    rc_lo_t, rc_hi_t = rc_lo.T, rc_hi.T  # (12, 30)

    def mds_lazy(el):
        out = []
        for r in range(12):
            acc = None
            for c in range(12):
                t = gl.mul_pow2_lazy(el[c], _EXPS[(12 - r + c) % 12])
                acc = t if acc is None else gl.add_lazy(acc, t)
            out.append(acc)
        return out

    def add_rc(r, st):
        return gl.add_lazy(
            st, GL(jax.lax.dynamic_slice_in_dim(rc_lo_t, r, 1, 1),
                   jax.lax.dynamic_slice_in_dim(rc_hi_t, r, 1, 1)))

    def full_round(r, st):
        st = add_rc(r, st)
        st = _sbox7(st)
        return gl.stack(mds_lazy([st[i] for i in range(12)]), axis=0)

    def partial_round(r, st):
        st = add_rc(r, st)
        row0 = _sbox7(st[0])
        el = [row0] + [st[i] for i in range(1, 12)]
        return gl.stack(mds_lazy(el), axis=0)

    st = jax.lax.fori_loop(0, _R_F_HALF, full_round, st, unroll=unroll)
    st = jax.lax.fori_loop(_R_F_HALF, _R_F_HALF + _R_P, partial_round, st,
                           unroll=unroll)
    st = jax.lax.fori_loop(_R_F_HALF + _R_P, 2 * _R_F_HALF + _R_P,
                           full_round, st, unroll=unroll)
    return gl.canonicalize(st)


# ----------------------------------------------------------------------------
# Exact scalar twin
# ----------------------------------------------------------------------------


def _s_mds(state):
    return [sum(state[c] * _MDS_POW[r][c] for c in range(12)) % ORDER for r in range(12)]


def s_permutation(state: list[int]) -> list[int]:
    assert len(state) == STATE_WIDTH
    r = 0
    for _ in range(_R_F_HALF):
        state = [(s + _RC[r * 12 + i]) % ORDER for i, s in enumerate(state)]
        state = [_s_sbox7(s) for s in state]
        state = _s_mds(state)
        r += 1
    for _ in range(_R_P):
        state = [(s + _RC[r * 12 + i]) % ORDER for i, s in enumerate(state)]
        state = [_s_sbox7(state[0])] + state[1:]
        state = _s_mds(state)
        r += 1
    for _ in range(_R_F_HALF):
        state = [(s + _RC[r * 12 + i]) % ORDER for i, s in enumerate(state)]
        state = [_s_sbox7(s) for s in state]
        state = _s_mds(state)
        r += 1
    return state
