"""Verifier hardening: pinned proof parameters + structural validation.

Reproduces the round-1 advisory findings:
- a proof generated at a lower security level must not verify against a VK
  set up for a higher one (proof.proof_config is attacker-controlled);
- structurally malformed proofs (truncated Merkle paths, wrong cap sizes)
  must return False, not raise (services verify untrusted proofs).
"""

import copy

import numpy as np
import pytest

from boojum_tpu.cs.setup import create_base_setup
from boojum_tpu.prover import ProofConfig, create_setup_and_vk, prove
from boojum_tpu.verifier import verify
from tests.test_prove_verify import build_small_circuit


@pytest.fixture(scope="module")
def strong_setup():
    cs = build_small_circuit(with_lookup=True)
    sb = create_base_setup(cs)
    cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=8,
                      security_level=100)
    art = create_setup_and_vk(cs, sb, cfg, "poseidon2")
    proof = prove(cs, art, cfg, "poseidon2", "poseidon2")
    return cs, art, cfg, proof


def test_low_security_proof_rejected_by_pinned_vk(strong_setup):
    """The advisory exploit: prove at security_level=4 (2 queries, no PoW),
    then present the proof to the VK that was set up for security 100."""
    cs, art, cfg, _ = strong_setup
    weak_cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=8,
                           security_level=4)
    weak_proof = prove(cs, art, weak_cfg, "poseidon2", "poseidon2")
    # the weak proof is self-consistent...
    assert len(weak_proof.queries_per_fri_repetition) < 10
    # ...but must NOT verify against the strong VK
    assert not verify(art.vk, weak_proof, "poseidon2", "poseidon2")


def test_expected_proof_config_pinning(strong_setup):
    cs, art, cfg, proof = strong_setup
    assert verify(art.vk, proof, "poseidon2", "poseidon2",
                  expected_proof_config=cfg)
    wrong = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=8,
                        security_level=80)
    assert not verify(art.vk, proof, "poseidon2", "poseidon2",
                      expected_proof_config=wrong)


def test_malformed_proofs_return_false_not_raise(strong_setup):
    cs, art, cfg, proof = strong_setup

    bad = copy.deepcopy(proof)
    bad.queries_per_fri_repetition[0].witness_query.proof = \
        bad.queries_per_fri_repetition[0].witness_query.proof[:-2]
    assert verify(art.vk, bad, "poseidon2", "poseidon2") is False

    bad = copy.deepcopy(proof)
    bad.witness_oracle_cap = bad.witness_oracle_cap[:-1]
    assert verify(art.vk, bad, "poseidon2", "poseidon2") is False

    bad = copy.deepcopy(proof)
    bad.queries_per_fri_repetition[0].fri_queries = \
        bad.queries_per_fri_repetition[0].fri_queries[:-1]
    assert verify(art.vk, bad, "poseidon2", "poseidon2") is False

    bad = copy.deepcopy(proof)
    bad.values_at_0 = bad.values_at_0[:-1]
    assert verify(art.vk, bad, "poseidon2", "poseidon2") is False

    bad = copy.deepcopy(proof)
    bad.values_at_z = bad.values_at_z[:-3]
    assert verify(art.vk, bad, "poseidon2", "poseidon2") is False

    bad = copy.deepcopy(proof)
    bad.queries_per_fri_repetition = []
    assert verify(art.vk, bad, "poseidon2", "poseidon2") is False

    bad = copy.deepcopy(proof)
    bad.final_fri_monomials = ([], [])
    assert verify(art.vk, bad, "poseidon2", "poseidon2") is False


def test_vk_serde_roundtrips_pinned_security(strong_setup):
    from boojum_tpu.prover import serialization as ser
    cs, art, cfg, proof = strong_setup
    vk2 = ser.vk_from_json(ser.vk_to_json(art.vk))
    assert vk2.fixed_parameters.security_level == 100
    assert verify(vk2, proof, "poseidon2", "poseidon2")
