"""Algebraic sponges over Goldilocks: scalar twin + batched TPU leaf hashing.

Reference behavior: src/algebraic_props/sponge.rs (GenericAlgebraicSponge,
absorb/finalize at :224-345) and src/algebraic_props/round_function.rs
(AbsorptionMode absorb/pad). Width 12, rate 8, capacity 4; commitment =
state[..N] (reference poseidon_goldilocks.rs:474-483).

The batched path hashes N independent leaves at once: the sponge state is a
list of 12 GL arrays of shape (N,) (or any common shape) and every absorb
round runs the Poseidon2/Poseidon permutation over the whole batch — this is
what replaces the reference's per-thread leaf loops in Merkle construction
(src/cs/oracle/merkle_tree.rs:78-176).
"""

from __future__ import annotations

from ..field import goldilocks as gl
from ..field.goldilocks import GL
from . import poseidon, poseidon2

RATE = 8
CAPACITY = 4
STATE_WIDTH = 12

OVERWRITE = "overwrite"
ADDITION = "addition"


# ----------------------------------------------------------------------------
# Scalar sponge (Python ints) — transcript and small-input hashing
# ----------------------------------------------------------------------------


class ScalarSponge:
    """Exact twin of GenericAlgebraicSponge for one state of Python ints."""

    def __init__(self, permutation=poseidon2.s_permutation, mode=OVERWRITE):
        self.perm = permutation
        self.mode = mode
        self.state = [0] * STATE_WIDTH
        self.buffer = [0] * RATE
        self.filled = 0

    def _absorb_buffer(self, count):
        for i in range(count):
            if self.mode == OVERWRITE:
                self.state[i] = self.buffer[i]
            else:
                self.state[i] = (self.state[i] + self.buffer[i]) % gl.ORDER
        if count < RATE:
            # pad: overwrite zeroes the tail, addition leaves it
            if self.mode == OVERWRITE:
                for i in range(count, RATE):
                    self.state[i] = 0
        self.state = self.perm(self.state)

    def absorb_single(self, value: int):
        self.buffer[self.filled] = value % gl.ORDER
        self.filled += 1
        if self.filled == RATE:
            self._absorb_buffer(RATE)
            self.filled = 0

    def absorb(self, values):
        for v in values:
            self.absorb_single(v)

    def run_round_function(self):
        assert self.filled == 0
        self.state = self.perm(self.state)

    def finalize(self, n: int = CAPACITY):
        """Non-destructive finalize (the reference consumes a copy)."""
        state = list(self.state)
        if self.filled > 0:
            for i in range(self.filled):
                if self.mode == OVERWRITE:
                    state[i] = self.buffer[i]
                else:
                    state[i] = (state[i] + self.buffer[i]) % gl.ORDER
            if self.mode == OVERWRITE:
                for i in range(self.filled, RATE):
                    state[i] = 0
            state = self.perm(state)
        return state[:n]

    def finalize_reset(self, n: int = CAPACITY):
        out = self.finalize(n)
        self.state = [0] * STATE_WIDTH
        self.filled = 0
        return out


def scalar_hash_into_leaf(values, permutation=poseidon2.s_permutation, mode=OVERWRITE):
    sp = ScalarSponge(permutation, mode)
    for v in values:
        sp.absorb_single(v)
    return sp.finalize(CAPACITY)


def scalar_hash_into_node(left, right, permutation=poseidon2.s_permutation, mode=OVERWRITE):
    sp = ScalarSponge(permutation, mode)
    sp.absorb(list(left) + list(right))
    return sp.finalize(CAPACITY)


# ----------------------------------------------------------------------------
# Batched leaf / node hashing (jnp) — the Merkle-tree hot path
# ----------------------------------------------------------------------------


def _batched_perm(name):
    return poseidon2.permutation if name == "poseidon2" else poseidon.permutation


def hash_leaves(columns: GL, permutation: str = "poseidon2", mode: str = OVERWRITE) -> GL:
    """Hash N leaves of ``num_els`` field elements each, vectorized.

    ``columns``: GL of shape (num_els, N) — column j of the trace contributes
    row j; leaf i is columns[:, i]. Returns GL (CAPACITY, N).
    Semantics mirror hash_into_leaf = absorb_single xN + finalize
    (reference src/cs/oracle/mod.rs:115-176).
    """
    perm = _batched_perm(permutation)
    num_els, n = columns.shape
    shape = (n,)
    state = [gl.zeros(shape) for _ in range(STATE_WIDTH)]
    full_chunks, rem = divmod(num_els, RATE)
    pos = 0
    for _ in range(full_chunks):
        for i in range(RATE):
            src = columns[pos + i]
            state[i] = src if mode == OVERWRITE else gl.add(state[i], src)
        state = perm(state)
        pos += RATE
    if rem > 0:
        for i in range(rem):
            src = columns[pos + i]
            state[i] = src if mode == OVERWRITE else gl.add(state[i], src)
        if mode == OVERWRITE:
            for i in range(rem, RATE):
                state[i] = gl.zeros(shape)
        state = perm(state)
    return gl.stack(state[:CAPACITY], axis=0)


def hash_nodes(left: GL, right: GL, permutation: str = "poseidon2",
               mode: str = OVERWRITE) -> GL:
    """Hash N (left, right) node pairs: left/right are GL (CAPACITY, N).

    = absorb 8 elements (exactly one rate) + finalize with empty buffer
    (reference hash_into_node, src/cs/oracle/mod.rs:163-170).
    """
    perm = _batched_perm(permutation)
    n = left.shape[1]
    state = [None] * STATE_WIDTH
    for i in range(CAPACITY):
        state[i] = left[i]
        state[CAPACITY + i] = right[i]
    for i in range(RATE, STATE_WIDTH):
        state[i] = gl.zeros((n,))
    if mode == ADDITION:
        # addition into a zero state == overwrite; kept for clarity
        pass
    state = perm(state)
    return gl.stack(state[:CAPACITY], axis=0)
