"""Blake2s circuit gadget vs hashlib (reference src/gadgets/blake2s tests)."""

import hashlib

import numpy as np
import pytest

from boojum_tpu.cs import ConstraintSystem, CSConfig, CSGeometry, LookupParameters
from boojum_tpu.cs.gates import ConstantsAllocatorGate, FmaGate, NopGate, ReductionGate
from boojum_tpu.gadgets import blake2s as b2s_mod
from boojum_tpu.gadgets import sha256 as sha_mod
from boojum_tpu.gadgets.uints import allocate_u8_checked_batch

RNG = np.random.default_rng(9)

GEOMETRY = CSGeometry(60, 0, 4, 4)
LOOKUP = LookupParameters.specialized_with_table_id_as_constant(
    width=4, num_repetitions=8, share_table_id=True)


def build(data: bytes, max_trace=1 << 15):
    cs = ConstraintSystem(GEOMETRY, max_trace, CSConfig.dev())
    cs.allow_lookup(LOOKUP)
    for g in (ConstantsAllocatorGate, FmaGate, NopGate):
        cs.allow_gate(g)
    cs.allow_gate(ReductionGate, params=4)
    tids = sha_mod.add_sha256_tables(cs)
    in_vars = allocate_u8_checked_batch(
        cs, np.frombuffer(data, np.uint8).astype(np.uint64), tids)
    out = b2s_mod.blake2s(cs, in_vars, tids)
    return cs, out


def test_blake2s_one_block():
    data = bytes(RNG.integers(0, 256, 30, dtype=np.uint8))
    cs, out = build(data)
    digest = bytes(int(cs.get_value(int(v))) for v in out)
    assert digest == hashlib.blake2s(data, digest_size=32).digest()
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()


def test_blake2s_two_blocks():
    data = bytes(RNG.integers(0, 256, 100, dtype=np.uint8))
    cs, out = build(data)
    digest = bytes(int(cs.get_value(int(v))) for v in out)
    assert digest == hashlib.blake2s(data, digest_size=32).digest()
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()


@pytest.mark.slow
def test_blake2s_prove_verify():
    from boojum_tpu.prover import ProofConfig, prove_one_shot, verify_circuit

    data = bytes(RNG.integers(0, 256, 40, dtype=np.uint8))
    cs, out = build(data)
    cs.pad_and_shrink()
    proof, vk = prove_one_shot(
        cs, ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=8),
        "blake2s", "blake2s")
    assert verify_circuit(vk, proof, "blake2s", "blake2s")
