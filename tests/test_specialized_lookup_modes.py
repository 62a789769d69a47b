"""Specialized-column lookup modes beyond the flagship's shared-constant-id:

- UseSpecializedColumnsWithTableIdAsConstant with share_table_id=False
  (one table-id constant column PER repetition, reference
  src/cs/mod.rs:242, place_constants_specialized in
  src/cs/implementations/lookup_placement.rs:200);
- UseSpecializedColumnsWithTableIdAsVariable (the formal id variable is the
  last column of each repetition, reference lookup_placement.rs:195, and a
  single shared placement tooling slot, lookup_placement.rs:157).

Each mode runs the full host prove->verify, device-prover byte-identity,
satisfiability mutation, and multiplicity-recount checks.
"""

import numpy as np
import pytest

from boojum_tpu.cs import (ConstraintSystem, CSConfig, CSGeometry,
                           LookupParameters, LookupTable)
from boojum_tpu.cs.gates import (ConstantsAllocatorGate, FmaGate, NopGate,
                                 PublicInputGate)
from boojum_tpu.cs.setup import create_base_setup
from boojum_tpu.prover import ProofConfig, create_setup_and_vk, prove
from boojum_tpu.verifier import verify, verifier
from boojum_tpu.utils import npgl

P = npgl.ORDER
RNG = np.random.default_rng(17)

GEOM = CSGeometry(num_columns_under_copy_permutation=16,
                  num_witness_columns=0, num_constant_columns=4,
                  max_allowed_constraint_degree=4)


def make_params(mode: str) -> LookupParameters:
    if mode == "const_noshare":
        return LookupParameters.specialized_with_table_id_as_constant(
            width=3, num_repetitions=2, share_table_id=False)
    if mode == "const_share":
        return LookupParameters.specialized_with_table_id_as_constant(
            width=3, num_repetitions=2, share_table_id=True)
    assert mode == "as_variable"
    return LookupParameters.specialized_with_table_id_as_variable(
        width=3, num_repetitions=2)


def build_circuit(mode: str, n_fma=16, n_lookups=23):
    cs = ConstraintSystem(GEOM, 1 << 10, CSConfig.dev())
    cs.allow_lookup(make_params(mode))
    for g in (ConstantsAllocatorGate, FmaGate, NopGate, PublicInputGate):
        cs.allow_gate(g)

    xor_rows = [(a, b, a ^ b) for a in range(8) for b in range(8)]
    tid_xor = cs.add_lookup_table(
        LookupTable("xor3", np.asarray(xor_rows, np.uint64), num_keys=2))
    and_rows = [(a, b, a & b) for a in range(8) for b in range(8)]
    tid_and = cs.add_lookup_table(
        LookupTable("and3", np.asarray(and_rows, np.uint64), num_keys=2))

    a = cs.alloc_variables_with_values(
        RNG.integers(0, P, n_fma, dtype=np.uint64))
    b = cs.alloc_variables_with_values(
        RNG.integers(0, P, n_fma, dtype=np.uint64))
    c = cs.alloc_variables_with_values(
        RNG.integers(0, P, n_fma, dtype=np.uint64))
    d = FmaGate.compute_fma_batch(cs, 3, (a, b), 5, c)

    ka = RNG.integers(0, 8, n_lookups, dtype=np.uint64)
    kb = RNG.integers(0, 8, n_lookups, dtype=np.uint64)
    la = cs.alloc_variables_with_values(ka)
    lb = cs.alloc_variables_with_values(kb)
    lx = cs.alloc_variables_with_values(ka ^ kb)
    cs.enforce_lookup_batch(tid_xor, np.stack([la, lb, lx]))
    ln = cs.alloc_variables_with_values(ka & kb)
    cs.enforce_lookup_batch(tid_and, np.stack([la, lb, ln]))

    PublicInputGate.place(cs, int(d[0]))
    cs.pad_and_shrink()
    return cs


MODES = ["const_noshare", "as_variable"]


@pytest.mark.parametrize("mode", MODES)
def test_specialized_mode_prove_verify(mode):
    cs = build_circuit(mode)
    assert cs.check_if_satisfied()
    sb = create_base_setup(cs)
    cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=4,
                      security_level=100, pow_bits=0)
    art = create_setup_and_vk(cs, sb, cfg, "poseidon2")
    proof = prove(cs, art, cfg, "poseidon2", "poseidon2")
    assert verify(art.vk, proof, "poseidon2", "poseidon2"), \
        verifier.LAST_FAILURE


@pytest.mark.parametrize("mode", MODES)
def test_specialized_mode_device_prover_matches_host(mode):
    from boojum_tpu.prover.device_prover import (DeviceProver,
                                                 create_device_setup)
    from boojum_tpu.prover.proof import proof_to_json

    cs = build_circuit(mode)
    sb = create_base_setup(cs)
    cfg = ProofConfig(fri_lde_factor=4, merkle_tree_cap_size=4)
    host_art = create_setup_and_vk(cs, sb, cfg, "poseidon2")
    host_proof = prove(cs, host_art, cfg, "poseidon2", "poseidon2")
    dev_art = create_device_setup(cs, sb, cfg, "poseidon2")
    dev_proof = DeviceProver(cs, dev_art, cfg).prove("poseidon2", "poseidon2")
    assert proof_to_json(host_proof) == proof_to_json(dev_proof)
    assert verify(dev_art.vk, dev_proof, "poseidon2", "poseidon2")


@pytest.mark.parametrize("mode", MODES)
def test_specialized_mode_bad_witness_fails(mode):
    from boojum_tpu.cs import places

    cs = build_circuit(mode)
    lp = cs.lookup_parameters
    pw = lp.specialized_columns_per_repetition()
    # corrupt a looked-up value (last key/value column of repetition 0)
    handle = cs.specialized_copy_data[lp.width - 1, 0]
    idx = int(places.index_of(np.asarray([handle]))[0])
    cs.resolver.values[idx] = (cs.resolver.values[idx] + 1) % P
    assert not cs.check_if_satisfied(verbose=False)
    assert pw == lp.width + (0 if lp.id_in_constant else 1)


@pytest.mark.parametrize("mode", MODES)
def test_specialized_mode_multiplicity_recount(mode):
    cs = build_circuit(mode)
    before = [m.copy() for m in cs.lookup_multiplicities]
    cs.recount_multiplicities()
    for b, a in zip(before, cs.lookup_multiplicities):
        np.testing.assert_array_equal(b, a)
    assert sum(int(m.sum()) for m in cs.lookup_multiplicities) > 0


def test_const_share_unchanged_by_refactor():
    """The flagship's shared-constant-id mode still proves/verifies after the
    per-repetition refactor."""
    cs = build_circuit("const_share")
    assert cs.check_if_satisfied()
    sb = create_base_setup(cs)
    cfg = ProofConfig(fri_lde_factor=4, merkle_tree_cap_size=4)
    art = create_setup_and_vk(cs, sb, cfg, "poseidon2")
    proof = prove(cs, art, cfg, "poseidon2", "poseidon2")
    assert verify(art.vk, proof, "poseidon2", "poseidon2"), \
        verifier.LAST_FAILURE
