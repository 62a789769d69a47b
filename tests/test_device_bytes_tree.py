"""Device-resident byte-hash Merkle trees (Blake2s256 / Keccak-256).

Reference behavior: the byte tree hashers at src/cs/oracle/mod.rs:179,:247
and the reference's flagship bench config (sha256_bench_non_recursive.sh:
Blake2s transcript + tree). The device trees must be digest-identical to the
host BytesMerkleTree, and the device prover must emit byte-identical proofs
with byte hashers.
"""

import numpy as np
import pytest

from boojum_tpu.cs.setup import create_base_setup
from boojum_tpu.field import goldilocks as gl
from boojum_tpu.hash.merkle import BytesMerkleTree
from boojum_tpu.prover.prover import ProofConfig, create_setup_and_vk, prove
from boojum_tpu.verifier.verifier import verify

from tests.test_prove_verify import build_small_circuit

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("algo", ["blake2s", "keccak256"])
@pytest.mark.parametrize("k,m", [(3, 16), (11, 64)])
def test_device_bytes_tree_matches_host(algo, k, m):
    from boojum_tpu.prover.device_merkle import build_device_bytes_tree

    vals = RNG.integers(0, gl.ORDER, size=(k, m), dtype=np.uint64)
    host = BytesMerkleTree.from_leaf_columns_u64(vals, cap_size=4, algo=algo)
    dev = build_device_bytes_tree(gl.from_u64(vals), cap_size=4, algo=algo)
    assert dev.get_cap() == host.get_cap()
    for idx in (0, 1, m // 2, m - 1):
        h_leaf, h_path = host.get_proof(idx)
        d_leaf, d_path = dev.get_proof(idx)
        assert d_leaf == h_leaf
        assert d_path == h_path
    # verify a path against the cap with the host verifier
    leaf, path = dev.get_proof(2)
    assert BytesMerkleTree.verify_proof_over_cap(path, dev.get_cap(), leaf,
                                                 2, algo)


@pytest.mark.parametrize("algo", ["blake2s", "keccak256"])
def test_device_bytes_tree_depth_zero(algo):
    """Leaf layer == cap (small FRI oracles): empty path, own leaf still
    gathered."""
    from boojum_tpu.prover.device_merkle import build_device_bytes_tree

    vals = RNG.integers(0, gl.ORDER, size=(3, 4), dtype=np.uint64)
    host = BytesMerkleTree.from_leaf_columns_u64(vals, cap_size=4, algo=algo)
    dev = build_device_bytes_tree(gl.from_u64(vals), cap_size=4, algo=algo)
    assert dev.get_cap() == host.get_cap()
    leaf, path = dev.get_proof(1)
    h_leaf, h_path = host.get_proof(1)
    assert (leaf, path) == (h_leaf, h_path) and path == []


@pytest.mark.parametrize("algo", ["blake2s", "keccak256"])
def test_device_prover_byte_hasher_matches_host(algo):
    """Device prove with a byte tree hasher + byte transcript is
    BYTE-IDENTICAL to the host prover (the reference-flagship Blake2s
    configuration, sha256_bench_non_recursive.sh)."""
    from boojum_tpu.prover.device_prover import (DeviceProver,
                                                 create_device_setup)
    from boojum_tpu.prover.proof import proof_to_json

    cs = build_small_circuit(with_lookup=True, n_fma=12)
    assert cs.check_if_satisfied()
    sb = create_base_setup(cs)
    cfg = ProofConfig(fri_lde_factor=4, merkle_tree_cap_size=4)
    host_art = create_setup_and_vk(cs, sb, cfg, algo)
    host_proof = prove(cs, host_art, cfg, algo, algo)
    assert verify(host_art.vk, host_proof, algo, algo)

    dev_art = create_device_setup(cs, sb, cfg, algo)
    assert dev_art.vk.setup_merkle_tree_cap == host_art.vk.setup_merkle_tree_cap
    dp = DeviceProver(cs, dev_art, cfg)
    dev_proof = dp.prove(algo, algo)
    assert verify(dev_art.vk, dev_proof, algo, algo)
    assert proof_to_json(host_proof) == proof_to_json(dev_proof)
