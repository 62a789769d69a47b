"""Poseidon2 permutation over Goldilocks, width 12, TPU-native.

Reference behavior: src/implementations/poseidon2/state_generic_impl.rs
(permutation structure at :221-233, partial round at :203, internal matrix
:171-200) and src/implementations/suggested_mds.rs (external MDS as the
Poseidon2-paper addition chain). Parameters from
src/implementations/poseidon2/params.rs (shared with Plonky2's Poseidon).

TPU design: the batch of states is a GL tensor of shape ``(12, B)`` — the
state-width axis is unrolled in Python (12 is static), B rides the TPU
lane dimension. All matrix multiplies are short add/double chains, so a
permutation is pure VPU work with no gathers. The same code traces for B=1
(transcript use goes through the exact scalar twin below instead, which needs
no device roundtrips).

Round structure (counter shared across phases, constants indexed by it):
  external MDS -> 4 full rounds -> 22 partial rounds -> 4 full rounds
  full round r:    state += RC[r], sbox^7 each, external MDS
  partial round r: state[0] += RC[r][0], sbox^7 on state[0], internal matrix
"""

from __future__ import annotations

from ..field import goldilocks as gl
from ..field.goldilocks import GL, ORDER
from . import _poseidon_constants as C

STATE_WIDTH = C.STATE_WIDTH
RATE = C.RATE
CAPACITY = C.CAPACITY

_RC = C.ALL_ROUND_CONSTANTS  # 30 rounds x 12
_R_F_HALF = C.HALF_NUM_FULL_ROUNDS
_R_P = C.NUM_PARTIAL_ROUNDS
_DIAG_SHIFTS = C.INNER_DIAGONAL_SHIFTS


# ----------------------------------------------------------------------------
# Batched jnp implementation: state is a list of 12 GL arrays (any shape)
# ----------------------------------------------------------------------------


def _sbox7(x: GL) -> GL:
    x2 = gl.square(x)
    x3 = gl.mul(x, x2)
    x4 = gl.square(x2)
    return gl.mul(x3, x4)


def _block_mul4(x0, x1, x2, x3):
    """M4 multiply via the Poseidon2-paper addition chain (suggested_mds.rs)."""
    t0 = gl.add(x0, x1)
    t1 = gl.add(x2, x3)
    t2 = gl.add(gl.double(x1), t1)
    t3 = gl.add(gl.double(x3), t0)
    t4 = gl.add(gl.double(gl.double(t1)), t3)
    t5 = gl.add(gl.double(gl.double(t0)), t2)
    t6 = gl.add(t3, t5)
    t7 = gl.add(t2, t4)
    return t6, t5, t7, t4


def external_mds(state: list[GL]) -> list[GL]:
    """Block-circulant [[2B,B,B],[B,2B,B],[B,B,2B]] with B = M4."""
    b0 = _block_mul4(*state[0:4])
    b1 = _block_mul4(*state[4:8])
    b2 = _block_mul4(*state[8:12])
    out = []
    for i in range(4):
        out.append(gl.add(gl.add(gl.double(b0[i]), b1[i]), b2[i]))
    for i in range(4):
        out.append(gl.add(gl.add(b0[i], gl.double(b1[i])), b2[i]))
    for i in range(4):
        out.append(gl.add(gl.add(b0[i], b1[i]), gl.double(b2[i])))
    return out


def internal_matrix(state: list[GL]) -> list[GL]:
    """state[i] = state[i] * 2^shift[i] + sum(state)  (diag = 2^shift + 1)."""
    total = state[0]
    for s in state[1:]:
        total = gl.add(total, s)
    out = []
    for i, s in enumerate(state):
        scaled = gl.mul_by_u32(s, 1 << _DIAG_SHIFTS[i]) if _DIAG_SHIFTS[i] else s
        out.append(gl.add(scaled, total))
    return out


def _add_round_constants(state: list[GL], r: int) -> list[GL]:
    shape = state[0].shape
    return [gl.add(s, gl.full(shape, _RC[r * 12 + i])) for i, s in enumerate(state)]


def _full_round(state: list[GL], r: int) -> list[GL]:
    state = _add_round_constants(state, r)
    state = [_sbox7(s) for s in state]
    return external_mds(state)


def _partial_round(state: list[GL], r: int) -> list[GL]:
    state = list(state)
    state[0] = gl.add(state[0], gl.full(state[0].shape, _RC[r * 12]))
    state[0] = _sbox7(state[0])
    return internal_matrix(state)


def permutation(state: list[GL]) -> list[GL]:
    """Poseidon2 permutation on a batch: 12 GL arrays of identical shape."""
    assert len(state) == STATE_WIDTH
    state = external_mds(state)
    r = 0
    for _ in range(_R_F_HALF):
        state = _full_round(state, r)
        r += 1
    for _ in range(_R_P):
        state = _partial_round(state, r)
        r += 1
    for _ in range(_R_F_HALF):
        state = _full_round(state, r)
        r += 1
    return state


def permutation_gl(state: GL) -> GL:
    """Permutation on a stacked GL array of shape (12, ...)."""
    out = permutation([state[i] for i in range(STATE_WIDTH)])
    return gl.stack(out, axis=0)


# ----------------------------------------------------------------------------
# Exact scalar twin (Python ints) — used by the host transcript and tests
# ----------------------------------------------------------------------------


def _s_sbox7(x: int) -> int:
    x2 = x * x % ORDER
    x3 = x2 * x % ORDER
    x4 = x2 * x2 % ORDER
    return x3 * x4 % ORDER


def _s_block_mul4(x0, x1, x2, x3):
    t0 = (x0 + x1) % ORDER
    t1 = (x2 + x3) % ORDER
    t2 = (2 * x1 + t1) % ORDER
    t3 = (2 * x3 + t0) % ORDER
    t4 = (4 * t1 + t3) % ORDER
    t5 = (4 * t0 + t2) % ORDER
    t6 = (t3 + t5) % ORDER
    t7 = (t2 + t4) % ORDER
    return t6, t5, t7, t4


def s_external_mds(state):
    b = [_s_block_mul4(*state[0:4]), _s_block_mul4(*state[4:8]), _s_block_mul4(*state[8:12])]
    out = [0] * 12
    for blk in range(3):
        for i in range(4):
            out[blk * 4 + i] = (b[blk][i] + b[0][i] + b[1][i] + b[2][i]) % ORDER
    return out


def s_internal_matrix(state):
    total = sum(state) % ORDER
    return [(s * (1 << _DIAG_SHIFTS[i]) + total) % ORDER for i, s in enumerate(state)]


def s_permutation(state: list[int]) -> list[int]:
    """Exact Poseidon2 permutation on one 12-element state of Python ints."""
    assert len(state) == STATE_WIDTH
    state = s_external_mds(state)
    r = 0
    for _ in range(_R_F_HALF):
        state = [(s + _RC[r * 12 + i]) % ORDER for i, s in enumerate(state)]
        state = [_s_sbox7(s) for s in state]
        state = s_external_mds(state)
        r += 1
    for _ in range(_R_P):
        state = list(state)
        state[0] = _s_sbox7((state[0] + _RC[r * 12]) % ORDER)
        state = s_internal_matrix(state)
        r += 1
    for _ in range(_R_F_HALF):
        state = [(s + _RC[r * 12 + i]) % ORDER for i, s in enumerate(state)]
        state = [_s_sbox7(s) for s in state]
        state = s_external_mds(state)
        r += 1
    return state
