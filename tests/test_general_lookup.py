"""General-purpose lookup modes (TableIdAsConstant / TableIdAsVariable).

Reference: lookup placement on general rows under LookupFormalGate
(src/cs/implementations/lookup_placement.rs:21), verifier relation
A·agg − sel (src/cs/implementations/verifier.rs:1366). Note the reference's
own PROVER hits todo!() for these modes (prover.rs:422) — only placement,
setup and the verifier formulas exist there; this framework implements the
full prove→verify pipeline for them.
"""

import numpy as np
import pytest

from boojum_tpu.cs import (ConstraintSystem, CSConfig, CSGeometry,
                           LookupParameters, LookupTable)
from boojum_tpu.cs.gates import (BooleanConstraintGate, ConstantsAllocatorGate,
                                 FmaGate, NopGate, PublicInputGate,
                                 ReductionGate)
from boojum_tpu.cs.setup import create_base_setup
from boojum_tpu.prover import ProofConfig, create_setup_and_vk, prove
from boojum_tpu.verifier import verify, verifier
from boojum_tpu.utils import npgl

P = npgl.ORDER
RNG = np.random.default_rng(5)

GEOM = CSGeometry(num_columns_under_copy_permutation=16, num_witness_columns=0,
                  num_constant_columns=4, max_allowed_constraint_degree=4)


def build_circuit(mode: str, n_fma=20):
    if mode == "as_constant":
        lookup = LookupParameters.table_id_as_constant(width=3)
    else:
        lookup = LookupParameters.table_id_as_variable(width=3)
    cs = ConstraintSystem(GEOM, 1 << 10, CSConfig.dev())
    cs.allow_lookup(lookup)
    cs.allow_gate(ConstantsAllocatorGate)
    cs.allow_gate(FmaGate)
    cs.allow_gate(ReductionGate, params=4)
    cs.allow_gate(BooleanConstraintGate)
    cs.allow_gate(PublicInputGate)
    cs.allow_gate(NopGate)

    xor_rows = [(a, b, a ^ b) for a in range(8) for b in range(8)]
    tid_xor = cs.add_lookup_table(
        LookupTable("xor3", np.asarray(xor_rows, np.uint64), num_keys=2))
    and_rows = [(a, b, a & b) for a in range(8) for b in range(8)]
    tid_and = cs.add_lookup_table(
        LookupTable("and3", np.asarray(and_rows, np.uint64), num_keys=2))

    a = cs.alloc_variables_with_values(RNG.integers(0, P, n_fma, dtype=np.uint64))
    b = cs.alloc_variables_with_values(RNG.integers(0, P, n_fma, dtype=np.uint64))
    c = cs.alloc_variables_with_values(RNG.integers(0, P, n_fma, dtype=np.uint64))
    d = FmaGate.compute_fma_batch(cs, 3, (a, b), 5, c)

    ka = RNG.integers(0, 8, 11, dtype=np.uint64)
    kb = RNG.integers(0, 8, 11, dtype=np.uint64)
    la = cs.alloc_variables_with_values(ka)
    lb = cs.alloc_variables_with_values(kb)
    lx = cs.alloc_variables_with_values(ka ^ kb)
    cs.enforce_lookup_batch(tid_xor, np.stack([la, lb, lx]))
    ln = cs.alloc_variables_with_values(ka & kb)
    cs.enforce_lookup_batch(tid_and, np.stack([la, lb, ln]))

    PublicInputGate.place(cs, int(d[0]))
    cs.pad_and_shrink()
    return cs


def run_roundtrip(cs):
    assert cs.check_if_satisfied()
    setup_base = create_base_setup(cs)
    cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=4,
                      security_level=100, pow_bits=0)
    artifacts = create_setup_and_vk(cs, setup_base, cfg, "poseidon2")
    proof = prove(cs, artifacts, cfg, "poseidon2", "poseidon2")
    ok = verify(artifacts.vk, proof, "poseidon2", "poseidon2")
    return proof, artifacts, ok


@pytest.mark.parametrize("mode", ["as_constant", "as_variable"])
def test_general_lookup_prove_verify(mode):
    cs = build_circuit(mode)
    proof, artifacts, ok = run_roundtrip(cs)
    assert ok, verifier.LAST_FAILURE


def test_general_lookup_bad_witness_fails_satisfiability():
    cs = build_circuit("as_constant")
    # corrupt a looked-up value after the fact: find a marker row chunk and
    # flip its value in the resolver
    marker_idx = cs.general_idx_by_name["lookup_formal"]
    app = np.asarray(cs.gates_application_sets)
    row = int(np.nonzero(app == marker_idx)[0][0])
    from boojum_tpu.cs import places
    handle = cs.copy_permutation_data[2, row]  # value column of chunk 0
    idx = int(places.index_of(np.asarray([handle]))[0])
    cs.resolver.values[idx] = (cs.resolver.values[idx] + 1) % P
    assert not cs.check_if_satisfied(verbose=False)


def test_general_lookup_multiplicity_recount_matches():
    cs = build_circuit("as_variable")
    before = [m.copy() for m in cs.lookup_multiplicities]
    cs.recount_multiplicities()
    for b, a in zip(before, cs.lookup_multiplicities):
        np.testing.assert_array_equal(b, a)
    assert sum(int(m.sum()) for m in cs.lookup_multiplicities) > 0
