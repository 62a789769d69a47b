"""SHA-256 gadget tests: circuit output vs hashlib, satisfiability, and a
small end-to-end proof (the flagship flow at reduced size).

Mirrors reference src/gadgets/sha256/mod.rs tests (test_sha256 at :163,
prove_sha256 at :296 — geometry 60 copy columns / 4 constant columns /
8 specialized lookup repetitions of width 4)."""

import hashlib

import numpy as np
import pytest

from boojum_tpu.cs import ConstraintSystem, CSConfig, CSGeometry, LookupParameters
from boojum_tpu.cs.gates import (ConstantsAllocatorGate, FmaGate, NopGate,
                                 ReductionGate)
from boojum_tpu.gadgets import sha256 as sha_mod
from boojum_tpu.gadgets.uints import allocate_u8_checked_batch

RNG = np.random.default_rng(42)

GEOMETRY = CSGeometry(num_columns_under_copy_permutation=60,
                      num_witness_columns=0, num_constant_columns=4,
                      max_allowed_constraint_degree=4)
LOOKUP = LookupParameters.specialized_with_table_id_as_constant(
    width=4, num_repetitions=8, share_table_id=True)


def build_sha256_circuit(input_bytes: bytes, max_trace_len=1 << 14):
    cs = ConstraintSystem(GEOMETRY, max_trace_len, CSConfig.dev())
    cs.allow_lookup(LOOKUP)
    cs.allow_gate(ConstantsAllocatorGate)
    cs.allow_gate(FmaGate)
    cs.allow_gate(ReductionGate, params=4)
    cs.allow_gate(NopGate)
    tids = sha_mod.add_sha256_tables(cs)
    in_vars = allocate_u8_checked_batch(
        cs, np.frombuffer(input_bytes, np.uint8).astype(np.uint64), tids)
    out_vars = sha_mod.sha256(cs, in_vars, tids)
    cs.input_variables = in_vars
    return cs, out_vars


def test_sha256_single_block():
    data = bytes(RNG.integers(0, 256, 20, dtype=np.uint8))
    cs, out = build_sha256_circuit(data)
    digest = bytes(int(cs.get_value(int(v))) for v in out)
    assert digest == hashlib.sha256(data).digest()
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()


def test_sha256_two_blocks():
    data = bytes(RNG.integers(0, 256, 100, dtype=np.uint8))
    cs, out = build_sha256_circuit(data)
    digest = bytes(int(cs.get_value(int(v))) for v in out)
    assert digest == hashlib.sha256(data).digest()
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()


@pytest.mark.slow
def test_sha256_prove_verify_small():
    from boojum_tpu.cs.setup import create_base_setup
    from boojum_tpu.prover import ProofConfig, create_setup_and_vk, prove
    from boojum_tpu.verifier import verify

    data = bytes(RNG.integers(0, 256, 16, dtype=np.uint8))
    cs, out = build_sha256_circuit(data)
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()
    setup_base = create_base_setup(cs)
    cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=16,
                      security_level=100, pow_bits=0)
    artifacts = create_setup_and_vk(cs, setup_base, cfg, "poseidon2")
    proof = prove(cs, artifacts, cfg, "poseidon", "poseidon2")
    assert verify(artifacts.vk, proof, "poseidon", "poseidon2")


@pytest.mark.slow
def test_witness_replay_new_input():
    """prove_from_witness_vec analogue: same circuit + setup, new input via
    witness replay (no re-synthesis); both proofs verify with the SAME VK."""
    from boojum_tpu.cs.setup import create_base_setup
    from boojum_tpu.prover import ProofConfig, create_setup_and_vk, prove
    from boojum_tpu.verifier import verify

    data_a = bytes(RNG.integers(0, 256, 20, dtype=np.uint8))
    data_b = bytes(RNG.integers(0, 256, 20, dtype=np.uint8))
    cs, out = build_sha256_circuit(data_a)
    cs.pad_and_shrink()
    cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=8)
    sb = create_base_setup(cs)
    art = create_setup_and_vk(cs, sb, cfg, "poseidon2")
    proof_a = prove(cs, art, cfg, "poseidon2", "poseidon2")
    assert verify(art.vk, proof_a, "poseidon2", "poseidon2")

    overrides = {int(v): b for v, b in zip(cs.input_variables, data_b)}
    cs.replay_witness(overrides)
    digest = bytes(int(cs.get_value(int(v))) for v in out)
    assert digest == hashlib.sha256(data_b).digest()
    assert cs.check_if_satisfied()
    proof_b = prove(cs, art, cfg, "poseidon2", "poseidon2")
    assert verify(art.vk, proof_b, "poseidon2", "poseidon2")
    assert proof_b.witness_oracle_cap != proof_a.witness_oracle_cap
