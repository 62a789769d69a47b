"""Hash-layer tests: batched jnp permutations vs exact scalar twins, sponge
semantics, Merkle tree construction/verification, keccak vectors.

Mirrors reference tests in src/implementations/poseidon2/state_generic_impl.rs
(generic vs naive cross-checks) and oracle tests.
"""

import hashlib

import numpy as np
import pytest

from boojum_tpu.field import goldilocks as gl
from boojum_tpu.hash import merkle, poseidon, poseidon2, sponge
from boojum_tpu.hash.keccak import keccak256
from boojum_tpu import transcript as tr

P = gl.ORDER
RNG = np.random.default_rng(0xA5)


def rand_states(n):
    return RNG.integers(0, P, size=(12, n), dtype=np.uint64)


def test_poseidon2_batched_vs_scalar():
    states = rand_states(16)
    batched = poseidon2.permutation([gl.from_u64(states[i]) for i in range(12)])
    got = np.stack([gl.to_u64(b) for b in batched])
    for j in range(16):
        want = poseidon2.s_permutation([int(states[i, j]) for i in range(12)])
        assert [int(got[i, j]) for i in range(12)] == want


def test_poseidon_batched_vs_scalar():
    states = rand_states(8)
    batched = poseidon.permutation([gl.from_u64(states[i]) for i in range(12)])
    got = np.stack([gl.to_u64(b) for b in batched])
    for j in range(8):
        want = poseidon.s_permutation([int(states[i, j]) for i in range(12)])
        assert [int(got[i, j]) for i in range(12)] == want


def test_poseidon2_external_mds_is_block_circulant_matrix():
    # multiply a unit vector through and compare against the explicit matrix
    from boojum_tpu.hash._poseidon_constants import EXTERNAL_MDS_BLOCK
    M = [[0] * 12 for _ in range(12)]
    for br in range(3):
        for bc in range(3):
            for r in range(4):
                for c in range(4):
                    v = EXTERNAL_MDS_BLOCK[r][c] * (2 if br == bc else 1)
                    M[br * 4 + r][bc * 4 + c] = v
    state = [RNG.integers(0, P, dtype=np.uint64).item() for _ in range(12)]
    got = poseidon2.s_external_mds(list(state))
    want = [sum(M[r][c] * state[c] for c in range(12)) % P for r in range(12)]
    assert got == want


def test_poseidon2_internal_matrix():
    from boojum_tpu.hash._poseidon_constants import INNER_DIAGONAL_SHIFTS
    state = [RNG.integers(0, P, dtype=np.uint64).item() for _ in range(12)]
    got = poseidon2.s_internal_matrix(list(state))
    tot = sum(state)
    want = [((1 << INNER_DIAGONAL_SHIFTS[i]) * state[i] + tot) % P for i in range(12)]
    assert got == want


def test_batched_leaf_hash_vs_scalar():
    for num_els in [3, 8, 11, 16, 24]:
        cols = RNG.integers(0, P, size=(num_els, 6), dtype=np.uint64)
        got = sponge.hash_leaves(gl.from_u64(cols))
        got_np = np.stack([gl.to_u64(got[i]) for i in range(4)])
        for j in range(6):
            want = sponge.scalar_hash_into_leaf([int(cols[i, j]) for i in range(num_els)])
            assert [int(got_np[i, j]) for i in range(4)] == want, num_els


def test_batched_node_hash_vs_scalar():
    l = RNG.integers(0, P, size=(4, 5), dtype=np.uint64)
    r = RNG.integers(0, P, size=(4, 5), dtype=np.uint64)
    got = sponge.hash_nodes(gl.from_u64(l), gl.from_u64(r))
    got_np = np.stack([gl.to_u64(got[i]) for i in range(4)])
    for j in range(5):
        want = sponge.scalar_hash_into_node([int(l[i, j]) for i in range(4)],
                                            [int(r[i, j]) for i in range(4)])
        assert [int(got_np[i, j]) for i in range(4)] == want


def test_algebraic_merkle_roundtrip():
    cols = RNG.integers(0, P, size=(7, 64), dtype=np.uint64)
    tree = merkle.AlgebraicMerkleTree.from_leaf_columns(gl.from_u64(cols), cap_size=4)
    cap = tree.get_cap()
    assert len(cap) == 4
    for idx in [0, 1, 31, 63]:
        leaf, path = tree.get_proof(idx)
        assert merkle.AlgebraicMerkleTree.verify_proof_over_cap(path, cap, leaf, idx)
        bad = (leaf[0] ^ 1,) + leaf[1:]
        assert not merkle.AlgebraicMerkleTree.verify_proof_over_cap(path, cap, bad, idx)
    # leaf hash matches scalar sponge
    want = sponge.scalar_hash_into_leaf([int(cols[i, 5]) for i in range(7)])
    leaf5, _ = tree.get_proof(5)
    assert list(leaf5) == want


def test_bytes_merkle_roundtrip():
    cols = RNG.integers(0, P, size=(3, 32), dtype=np.uint64)
    tree = merkle.BytesMerkleTree.from_leaf_columns_u64(cols, cap_size=2, algo="blake2s")
    cap = tree.get_cap()
    for idx in [0, 17, 31]:
        leaf, path = tree.get_proof(idx)
        assert merkle.BytesMerkleTree.verify_proof_over_cap(path, cap, leaf, idx)
    want = hashlib.blake2s(
        b"".join(int(cols[i, 9]).to_bytes(8, "little") for i in range(3)),
        digest_size=32).digest()
    leaf9, _ = tree.get_proof(9)
    assert leaf9 == want


def test_keccak256_vectors():
    # well-known Keccak-256 (legacy padding) vectors
    assert keccak256(b"").hex() == \
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    assert keccak256(b"abc").hex() == \
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    # cross rate boundary
    assert len(keccak256(b"x" * 200)) == 32


def test_algebraic_transcript_basic():
    t = tr.AlgebraicTranscript("poseidon")
    t.witness_field_elements([1, 2, 3])
    c1 = t.get_challenge()
    c2 = t.get_challenge()
    assert 0 <= c1 < P and 0 <= c2 < P and (c1, c2) != (0, 0)
    # deterministic
    t2 = tr.AlgebraicTranscript("poseidon")
    t2.witness_field_elements([1, 2, 3])
    assert t2.get_challenge() == c1 and t2.get_challenge() == c2
    # absorbing different data changes challenges
    t3 = tr.AlgebraicTranscript("poseidon")
    t3.witness_field_elements([1, 2, 4])
    assert t3.get_challenge() != c1


def test_algebraic_transcript_matches_manual_sponge():
    # 3 elements + rescue-prime pad [1, 0, 0, 0, 0] = one absorb chunk
    t = tr.AlgebraicTranscript("poseidon2")
    t.witness_field_elements([5, 6, 7])
    c = t.get_challenge()
    state = [0] * 12
    state[:8] = [5, 6, 7, 1, 0, 0, 0, 0]
    state = poseidon2.s_permutation(state)
    assert c == state[0]


def test_blake2s_transcript():
    t = tr.Blake2sTranscript()
    t.witness_field_elements([42])
    c1 = t.get_challenge()
    manual = hashlib.blake2s((42).to_bytes(8, "little"), digest_size=32).digest()
    assert c1 == int.from_bytes(manual[:8], "little") % P
    # challenges continue from the digest buffer
    c2 = t.get_challenge()
    assert c2 == int.from_bytes(manual[8:16], "little") % P


@pytest.mark.slow
def test_pallas_poseidon2_matches_jnp_interpret():
    """The Pallas Poseidon2 slab kernel (TPU tree-hash path) is bit-identical
    to the jnp reference — interpreter mode so CPU CI covers it, including
    the pad-to-FIXED_BATCH path (also validated on the real chip by every
    device-prover byte-equality run)."""
    import jax
    import numpy as np

    from boojum_tpu.field import goldilocks as gl
    from boojum_tpu.hash.pallas_poseidon2 import permutation_stacked_pallas
    from boojum_tpu.hash.poseidon2 import _permutation_stacked

    rng = np.random.default_rng(11)
    b = 8192  # pads up to FIXED_BATCH inside the wrapper
    st = gl.from_u64(rng.integers(0, gl.ORDER, (12, b),
                                  dtype=np.uint64).reshape(-1)).reshape(12, b)
    ref = jax.jit(_permutation_stacked)(st)
    out = permutation_stacked_pallas(st, interpret=True)
    assert np.array_equal(np.asarray(ref.lo), np.asarray(out.lo))
    assert np.array_equal(np.asarray(ref.hi), np.asarray(out.hi))
