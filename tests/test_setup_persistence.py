"""Committed-setup persistence (prover/serialization.py save/load_artifacts).

Reference behavior: src/cs/implementations/fast_serialization.rs:17,34 —
MemcopySerializable raw-bytes setup artifacts so a second prover process
skips setup construction and proves immediately.
"""

import numpy as np

from boojum_tpu.cs.setup import create_base_setup
from boojum_tpu.prover.prover import ProofConfig, create_setup_and_vk, prove
from boojum_tpu.prover.serialization import (
    create_device_setup_from_artifacts, load_artifacts, save_artifacts)
from boojum_tpu.verifier.verifier import verify

from tests.test_prove_verify import build_small_circuit


def test_artifacts_roundtrip_and_prove(tmp_path):
    cs = build_small_circuit(with_lookup=True, n_fma=8)
    sb = create_base_setup(cs)
    cfg = ProofConfig(fri_lde_factor=4, merkle_tree_cap_size=4)
    art = create_setup_and_vk(cs, sb, cfg, "poseidon2")
    path = str(tmp_path / "setup.npz")
    save_artifacts(path, sb, art.vk)

    sb2, vk2 = load_artifacts(path)
    assert np.array_equal(sb2.copy_permutation_polys,
                          sb.copy_permutation_polys)
    assert np.array_equal(sb2.constant_columns, sb.constant_columns)
    assert np.array_equal(sb2.lookup_tables_columns,
                          sb.lookup_tables_columns)
    assert sb2.selector_paths == sb.selector_paths
    assert vk2.setup_merkle_tree_cap == art.vk.setup_merkle_tree_cap

    # a "second process": recommit from the loaded artifacts and prove
    art2 = create_device_setup_from_artifacts(cs, path, cfg, "poseidon2")
    from boojum_tpu.prover.device_prover import DeviceProver
    proof = DeviceProver(cs, art2, cfg).prove("poseidon2", "poseidon2")
    assert verify(vk2, proof, "poseidon2", "poseidon2")
