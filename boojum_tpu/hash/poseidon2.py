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
    """x^7 on lazy representatives (outputs any-u64; congruent mod p).
    Safe for canonical callers too — gl.add/gl.mul accept any u64 input."""
    x2 = gl.square_lazy(x)
    x3 = gl.mul_lazy(x, x2)
    x4 = gl.square_lazy(x2)
    return gl.mul_lazy(x3, x4)


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


def _permutation_unrolled(state: list[GL]) -> list[GL]:
    """Fully unrolled form (reference semantics; used by tests)."""
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


def _rc_tables():
    import numpy as np
    rc = np.asarray(_RC, np.uint64).reshape(30, 12)
    lo = (rc & 0xFFFFFFFF).astype(np.uint32)
    hi = (rc >> np.uint64(32)).astype(np.uint32)
    import jax.numpy as jnp
    return jnp.asarray(lo), jnp.asarray(hi)


def _permutation_rolled(state: list[GL]) -> list[GL]:
    """Poseidon2 permutation on a batch of 12 GL arrays.

    Rolled into lax.fori_loops over rounds (constants indexed per round) so
    the traced graph is ~3 round bodies instead of 30 — fast to compile under
    jit, identical results to the unrolled reference semantics."""
    import jax
    import jax.numpy as jnp

    assert len(state) == STATE_WIDTH
    rc_lo, rc_hi = _rc_tables()
    st = gl.stack(state, axis=0)  # (12, ...)

    def full_round(r, st):
        cs = [GL(rc_lo[r, i], rc_hi[r, i]) for i in range(12)]
        s = [gl.add(st[i], GL(jnp.broadcast_to(cs[i].lo, st.lo.shape[1:]),
                              jnp.broadcast_to(cs[i].hi, st.hi.shape[1:])))
             for i in range(12)]
        s = [_sbox7(x) for x in s]
        s = external_mds(s)
        return gl.stack(s, axis=0)

    def partial_round(r, st):
        c0 = GL(jnp.broadcast_to(rc_lo[r, 0], st.lo.shape[1:]),
                jnp.broadcast_to(rc_hi[r, 0], st.hi.shape[1:]))
        s = [st[i] for i in range(12)]
        s[0] = _sbox7(gl.add(s[0], c0))
        s = internal_matrix(s)
        return gl.stack(s, axis=0)

    st = gl.stack(external_mds([state[i] for i in range(12)]), axis=0)
    st = jax.lax.fori_loop(0, _R_F_HALF, full_round, st)
    st = jax.lax.fori_loop(_R_F_HALF, _R_F_HALF + _R_P, partial_round, st)
    st = jax.lax.fori_loop(_R_F_HALF + _R_P, 2 * _R_F_HALF + _R_P, full_round, st)
    return [st[i] for i in range(12)]


def _external_mds_stacked(st: GL) -> GL:
    """External MDS on stacked state (12, B) keeping ops on whole blocks:
    view as (3, 4, B); block M4 multiply via the addition chain, then the
    block-circulant [[2,1,1],[1,2,1],[1,1,2]] combination.

    Lazy-domain: inputs/outputs are any-u64 representatives
    (gl.add_lazy keeps mod-p congruence at ~half the op count)."""
    _add = gl.add_lazy
    _dbl = lambda x: gl.add_lazy(x, x)  # noqa: E731
    b = st.reshape(3, 4, -1)
    x0, x1, x2, x3 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    t0 = _add(x0, x1)
    t1 = _add(x2, x3)
    t2 = _add(_dbl(x1), t1)
    t3 = _add(_dbl(x3), t0)
    t4 = _add(_dbl(_dbl(t1)), t3)
    t5 = _add(_dbl(_dbl(t0)), t2)
    t6 = _add(t3, t5)
    t7 = _add(t2, t4)
    blocks = gl.stack([t6, t5, t7, t4], axis=1)  # (3, 4, B)
    total = _add(_add(blocks[0], blocks[1]), blocks[2])  # (4, B)
    # circulant [[2,1,1],[1,2,1],[1,1,2]]: out_i = b_i + (b_0 + b_1 + b_2)
    out = _add(blocks, GL(jnp_bcast(total.lo, blocks.lo.shape),
                          jnp_bcast(total.hi, blocks.hi.shape)))
    return out.reshape(12, -1)


def jnp_bcast(a, shape):
    import jax.numpy as jnp
    return jnp.broadcast_to(a[None], shape)


def _internal_matrix_stacked(st: GL, shifts=None) -> GL:
    """Internal (partial-round) matrix on lazy representatives: diag entry
    2^s + 1 applied as a static shift-reduce (gl.mul_pow2_lazy — ~5x cheaper
    than the general mul the diagonal was previously paying), plus the
    broadcast row sum. ``shifts`` is accepted for call compatibility but the
    static _DIAG_SHIFTS are what get applied."""
    import jax.numpy as jnp

    del shifts
    # log-tree sum along axis 0 (lazy adds)
    _add = gl.add_lazy
    total = _add(_add(_add(st[0], st[1]), _add(st[2], st[3])),
                 _add(_add(st[4], st[5]),
                      _add(_add(st[6], st[7]),
                           _add(_add(st[8], st[9]),
                                _add(st[10], st[11])))))
    rows = [gl.mul_pow2_lazy(st[i], _DIAG_SHIFTS[i]) for i in range(12)]
    scaled = gl.stack(rows, axis=0)
    return _add(scaled, GL(jnp.broadcast_to(total.lo[None], scaled.lo.shape),
                           jnp.broadcast_to(total.hi[None], scaled.hi.shape)))


def _permutation_stacked(st: GL, tables=None, unroll: int = 1) -> GL:
    """Rolled, stacked-state permutation: minimal traced graph (~3 small
    round bodies), sbox vectorized over the whole (12, B) state.

    tables: optional (rc_lo_T (12,30), rc_hi_T (12,30), diag_shifts (12,))
    passed explicitly — required when tracing inside a Pallas kernel, where
    captured constants must be kernel inputs."""
    import jax
    import jax.numpy as jnp

    if tables is None:
        rc_lo, rc_hi = _rc_tables()
        rc_lo = rc_lo.T  # (12, 30) for per-round column gather
        rc_hi = rc_hi.T
        shifts = None
    else:
        rc_lo, rc_hi, shifts = tables

    def full_round(r, st):
        st = gl.add_lazy(st, GL(jax.lax.dynamic_slice_in_dim(rc_lo, r, 1, 1),
                                jax.lax.dynamic_slice_in_dim(rc_hi, r, 1, 1)))
        st = _sbox7(st)
        return _external_mds_stacked(st)

    def partial_round(r, st):
        c = GL(jax.lax.dynamic_slice_in_dim(rc_lo[0], r, 1),
               jax.lax.dynamic_slice_in_dim(rc_hi[0], r, 1))
        row0 = _sbox7(gl.add_lazy(st[0], c))
        st = GL(st.lo.at[0].set(row0.lo), st.hi.at[0].set(row0.hi))
        return _internal_matrix_stacked(st, shifts)

    # the whole permutation runs on lazy (any-u64) representatives; one
    # canonicalization at the end restores the exact reference output
    st = _external_mds_stacked(st)
    st = jax.lax.fori_loop(0, _R_F_HALF, full_round, st, unroll=unroll)
    st = jax.lax.fori_loop(_R_F_HALF, _R_F_HALF + _R_P, partial_round, st,
                           unroll=unroll)
    st = jax.lax.fori_loop(_R_F_HALF + _R_P, 2 * _R_F_HALF + _R_P, full_round,
                           st, unroll=unroll)
    return gl.canonicalize(st)


# fixed-batch jitted permutation: ONE compiled shape serves all callers
FIXED_BATCH = 8192
_perm_fixed = None


def _get_perm_fixed():
    global _perm_fixed
    if _perm_fixed is None:
        import jax
        _perm_fixed = jax.jit(_permutation_stacked)
    return _perm_fixed


def permutation_gl(state: GL) -> GL:
    """Permutation on stacked GL (12, B): pads/chunks B to the fixed batch so
    exactly one XLA compilation is ever needed (XLA:CPU compile of wide
    carry-chain graphs is pathologically slow; fixing the shape sidesteps it
    and on TPU gives one cached program)."""
    import jax.numpy as jnp

    b = state.lo.shape[1]
    perm = _get_perm_fixed()
    if b == FIXED_BATCH:
        return perm(state)
    if b < FIXED_BATCH:
        pad = FIXED_BATCH - b
        padded = GL(jnp.pad(state.lo, ((0, 0), (0, pad))),
                    jnp.pad(state.hi, ((0, 0), (0, pad))))
        out = perm(padded)
        return GL(out.lo[:, :b], out.hi[:, :b])
    outs = []
    for start in range(0, b, FIXED_BATCH):
        chunk = GL(state.lo[:, start:start + FIXED_BATCH],
                   state.hi[:, start:start + FIXED_BATCH])
        outs.append(permutation_gl(chunk))
    return GL(jnp.concatenate([o.lo for o in outs], axis=1),
              jnp.concatenate([o.hi for o in outs], axis=1))


def permutation(state: list[GL]) -> list[GL]:
    """Batched permutation on 12 GL arrays of identical shape."""
    shape = state[0].shape
    st = gl.stack(state, axis=0).reshape(12, -1)
    out = permutation_gl(st)
    out = out.reshape(12, *shape) if shape else out.reshape(12)
    return [out[i] for i in range(STATE_WIDTH)]


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
