"""Recursion-layer tests: in-circuit primitives and the recursive verifier
over a real inner proof (reference src/gadgets/recursion/ tests).

The inner proof uses the recursive-bench combination (classic-Poseidon
transcript + Poseidon2 tree, sha256/mod.rs:286) at reduced FRI parameters so
the outer circuit stays small in CI."""

import numpy as np
import pytest

from boojum_tpu.cs import ConstraintSystem, CSConfig, CSGeometry
from boojum_tpu.cs.gates import (BooleanConstraintGate, ConstantsAllocatorGate,
                                 FmaGate, NopGate, ReductionGate, SelectionGate,
                                 ZeroCheckGate)
from boojum_tpu.cs.gates.arith import FmaGateInExtension
from boojum_tpu.cs.setup import create_base_setup
from boojum_tpu.gadgets.num import CircuitExt2Ops, CircuitOps
from boojum_tpu.gadgets.poseidon2_circuit import allow_poseidon2_gates
from boojum_tpu.gadgets.recursion.primitives import allow_poseidon_gates
from boojum_tpu.gadgets.recursion.verifier import AllocatedProof, recursive_verify
from boojum_tpu.prover import ProofConfig, create_setup_and_vk, prove
from boojum_tpu.verifier import verify
from tests.test_prove_verify import build_small_circuit

RNG = np.random.default_rng(21)
P = (1 << 64) - (1 << 32) + 1


def make_outer_cs(max_trace=1 << 15):
    geom = CSGeometry(num_columns_under_copy_permutation=60,
                      num_witness_columns=0, num_constant_columns=8,
                      max_allowed_constraint_degree=4)
    cs = ConstraintSystem(geom, max_trace, CSConfig.dev())
    for g in (ConstantsAllocatorGate, FmaGate, NopGate, BooleanConstraintGate,
              SelectionGate, ZeroCheckGate, FmaGateInExtension):
        cs.allow_gate(g)
    cs.allow_gate(ReductionGate, params=4)
    allow_poseidon2_gates(cs)
    allow_poseidon_gates(cs)
    return cs


def test_circuit_ext_ops():
    from boojum_tpu.field import extension as ext2
    cs = make_outer_cs(1 << 10)
    eops = CircuitExt2Ops(cs)
    P = (1 << 64) - (1 << 32) + 1
    a = (int(RNG.integers(0, P, dtype=np.uint64)), int(RNG.integers(0, P, dtype=np.uint64)))
    b = (int(RNG.integers(0, P, dtype=np.uint64)), int(RNG.integers(0, P, dtype=np.uint64)))
    av = (cs.alloc_variable_with_value(a[0]), cs.alloc_variable_with_value(a[1]))
    bv = (cs.alloc_variable_with_value(b[0]), cs.alloc_variable_with_value(b[1]))
    m = eops.mul(av, bv)
    want = ext2.s2_mul(a, b)
    assert (cs.get_value(m[0]), cs.get_value(m[1])) == want
    inv = eops.inverse(av)
    assert ext2.s2_mul(a, (cs.get_value(inv[0]), cs.get_value(inv[1]))) == (1, 0)
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()


@pytest.mark.slow
def test_recursive_verifier_over_real_proof():
    # inner proof: small lookup circuit, reduced security for circuit size
    inner = build_small_circuit(with_lookup=True, n_fma=8)
    assert inner.check_if_satisfied()
    sb = create_base_setup(inner)
    cfg = ProofConfig(fri_lde_factor=4, merkle_tree_cap_size=4,
                      security_level=20, pow_bits=0)
    art = create_setup_and_vk(inner, sb, cfg, "poseidon2")
    proof = prove(inner, art, cfg, "poseidon", "poseidon2")
    assert verify(art.vk, proof, "poseidon", "poseidon2")

    outer = make_outer_cs(1 << 16)
    alloc = AllocatedProof.allocate(outer, proof)
    recursive_verify(outer, art.vk, alloc, cfg, "poseidon", "poseidon2")
    outer.pad_and_shrink()
    print("recursion circuit rows:", outer.final_trace_len)
    assert outer.check_if_satisfied()

    # a corrupted inner proof must make the outer circuit unsatisfiable
    import copy
    bad = copy.deepcopy(proof)
    v = list(bad.values_at_z[2])
    v[0] = (v[0] + 1) % ((1 << 64) - (1 << 32) + 1)
    bad.values_at_z[2] = tuple(v)
    outer2 = make_outer_cs(1 << 16)
    alloc2 = AllocatedProof.allocate(outer2, bad)
    recursive_verify(outer2, art.vk, alloc2, cfg, "poseidon", "poseidon2")
    outer2.pad_and_shrink()
    assert not outer2.check_if_satisfied(verbose=False)


@pytest.mark.slow
def test_recursive_verifier_with_flattened_poseidon2():
    """Same recursion flow, but every in-circuit Poseidon2 permutation is a
    single Poseidon2FlattenedGate instance (reference poseidon2.rs:442) —
    the recursion-circuit shrink that gate exists for."""
    inner = build_small_circuit(with_lookup=True, n_fma=8)
    sb = create_base_setup(inner)
    cfg = ProofConfig(fri_lde_factor=4, merkle_tree_cap_size=4,
                      security_level=20, pow_bits=0)
    art = create_setup_and_vk(inner, sb, cfg, "poseidon2")
    proof = prove(inner, art, cfg, "poseidon", "poseidon2")

    geom = CSGeometry(num_columns_under_copy_permutation=132,
                      num_witness_columns=0, num_constant_columns=8,
                      max_allowed_constraint_degree=8)
    outer = ConstraintSystem(geom, 1 << 16, CSConfig.dev())
    for g in (ConstantsAllocatorGate, FmaGate, NopGate, BooleanConstraintGate,
              SelectionGate, ZeroCheckGate, FmaGateInExtension):
        outer.allow_gate(g)
    outer.allow_gate(ReductionGate, params=4)
    allow_poseidon2_gates(outer, flattened=True)
    allow_poseidon_gates(outer, flattened=True)
    alloc = AllocatedProof.allocate(outer, proof)
    recursive_verify(outer, art.vk, alloc, cfg, "poseidon", "poseidon2")
    outer.pad_and_shrink()
    print("flattened recursion circuit rows:", outer.final_trace_len)
    assert outer.check_if_satisfied()


@pytest.mark.slow
def test_recursive_verifier_full_security_proof():
    """BASELINE config[1]: recursion over a FULL-security proof
    (security 100, lde 8, cap 16 — the flagship proof shape), flattened
    poseidon gates."""
    inner = build_small_circuit(with_lookup=True, n_fma=16)
    sb = create_base_setup(inner)
    cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=16)
    art = create_setup_and_vk(inner, sb, cfg, "poseidon2")
    proof = prove(inner, art, cfg, "poseidon", "poseidon2")
    assert verify(art.vk, proof, "poseidon", "poseidon2")

    geom = CSGeometry(num_columns_under_copy_permutation=132,
                      num_witness_columns=0, num_constant_columns=8,
                      max_allowed_constraint_degree=8)
    outer = ConstraintSystem(geom, 1 << 17, CSConfig.dev())
    for g in (ConstantsAllocatorGate, FmaGate, NopGate, BooleanConstraintGate,
              SelectionGate, ZeroCheckGate, FmaGateInExtension):
        outer.allow_gate(g)
    outer.allow_gate(ReductionGate, params=4)
    allow_poseidon2_gates(outer, flattened=True)
    allow_poseidon_gates(outer, flattened=True)
    import time
    t0 = time.time()
    alloc = AllocatedProof.allocate(outer, proof)
    recursive_verify(outer, art.vk, alloc, cfg, "poseidon", "poseidon2")
    outer.pad_and_shrink()
    print("full-security recursion rows:", outer.final_trace_len,
          "synthesis %.1fs" % (time.time() - t0))
    assert outer.check_if_satisfied()

    # close the loop: prove the OUTER circuit (a proof of proof-verification)
    outer_sb = create_base_setup(outer)
    outer_cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=16)
    outer_art = create_setup_and_vk(outer, outer_sb, outer_cfg, "poseidon2")
    outer_proof = prove(outer, outer_art, outer_cfg, "poseidon", "poseidon2")
    assert verify(outer_art.vk, outer_proof, "poseidon", "poseidon2")
    print("outer proof (proof-of-proof) verified")


@pytest.mark.slow
def test_recursive_verifier_with_pow_and_specialized_gate():
    """VERDICT round-1 item 5 done-criterion: recursive verification of a
    proof with pow_bits > 0 over an inner circuit that uses a specialized
    gate. Uses the algebraic poseidon2 PoW (prover/pow.py) — the reference
    cannot recursively verify ANY PoW (recursive_verifier.rs:1503 todo!())."""
    from boojum_tpu.cs.gates.arith import MatrixMulEvaluator
    from boojum_tpu.cs import LookupParameters
    from boojum_tpu.cs.cs import LookupTable
    from boojum_tpu.cs.gates import PublicInputGate

    P_ = (1 << 64) - (1 << 32) + 1
    M = [[1, 2], [3, 4]]
    geom = CSGeometry(num_columns_under_copy_permutation=16,
                      num_witness_columns=0, num_constant_columns=4,
                      max_allowed_constraint_degree=4)
    inner = ConstraintSystem(geom, 1 << 10, CSConfig.dev())
    lookup = LookupParameters.specialized_with_table_id_as_constant(
        width=3, num_repetitions=2, share_table_id=True)
    inner.allow_lookup(lookup)
    for g in (ConstantsAllocatorGate, FmaGate, NopGate, PublicInputGate):
        inner.allow_gate(g)
    ev = MatrixMulEvaluator((2, M))
    ev.name = "matmul2_spec"
    inner.allow_evaluator(ev, placement="specialized", specialized_reps=2)

    rows = [(a, b, a ^ b) for a in range(8) for b in range(8)]
    tid = inner.add_lookup_table(
        LookupTable("xor3", np.asarray(rows, np.uint64), num_keys=2))

    ins = RNG.integers(0, P_, (4, 2), dtype=np.uint64)
    in_vars = inner.alloc_variables_with_values(ins.reshape(-1)).reshape(4, 2)
    outs = np.array([
        [(int(M[0][0]) * int(a) + int(M[0][1]) * int(b)) % P_,
         (int(M[1][0]) * int(a) + int(M[1][1]) * int(b)) % P_]
        for a, b in ins], dtype=np.uint64)
    out_vars = inner.alloc_variables_with_values(outs.reshape(-1)).reshape(4, 2)
    inner.place_specialized_gate_batch(
        "matmul2_spec", np.concatenate([in_vars, out_vars], axis=1))
    a = inner.alloc_variables_with_values(RNG.integers(0, P_, 8, dtype=np.uint64))
    d = FmaGate.compute_fma_batch(inner, 3, (a, a), 5, a)
    la = inner.alloc_variables_with_values([1, 2, 3])
    lb = inner.alloc_variables_with_values([6, 2, 1])
    lo = inner.alloc_variables_with_values([7, 0, 2])
    inner.enforce_lookup_batch(tid, np.stack([la, lb, lo]))
    PublicInputGate.place(inner, int(d[0]))
    inner.pad_and_shrink()
    assert inner.check_if_satisfied()

    sb = create_base_setup(inner)
    cfg = ProofConfig(fri_lde_factor=4, merkle_tree_cap_size=4,
                      security_level=20, pow_bits=8, pow_hash="poseidon2")
    art = create_setup_and_vk(inner, sb, cfg, "poseidon2")
    proof = prove(inner, art, cfg, "poseidon", "poseidon2")
    assert proof.pow_challenge != 0 or proof.proof_config.pow_bits == 8
    assert verify(art.vk, proof, "poseidon", "poseidon2")

    outer = make_outer_cs(1 << 16)
    alloc = AllocatedProof.allocate(outer, proof)
    recursive_verify(outer, art.vk, alloc, cfg, "poseidon", "poseidon2")
    outer.pad_and_shrink()
    print("pow+specialized recursion rows:", outer.final_trace_len)
    assert outer.check_if_satisfied()

    # corrupting the nonce must make the outer circuit unsatisfiable
    import copy
    bad = copy.deepcopy(proof)
    bad.pow_challenge ^= 1
    outer2 = make_outer_cs(1 << 16)
    alloc2 = AllocatedProof.allocate(outer2, bad)
    recursive_verify(outer2, art.vk, alloc2, cfg, "poseidon", "poseidon2")
    outer2.pad_and_shrink()
    assert not outer2.check_if_satisfied(verbose=False)


@pytest.mark.slow
def test_allocated_vk_one_circuit_many_vks():
    """AllocatedVerificationKey (reference allocated_vk.rs): the inner VK's
    setup cap is allocated as witness, so ONE outer circuit serves every
    inner VK with the same fixed parameters. Asserted structurally: two
    outer circuits built over different inner circuits (different VKs, same
    shape) have IDENTICAL setup polynomials — i.e. the same circuit."""
    from boojum_tpu.gadgets.recursion.verifier import AllocatedVerificationKey

    def make_inner(seed):
        rng = np.random.default_rng(seed)
        P_ = (1 << 64) - (1 << 32) + 1
        geom = CSGeometry(num_columns_under_copy_permutation=16,
                          num_witness_columns=0, num_constant_columns=4,
                          max_allowed_constraint_degree=4)
        inner = ConstraintSystem(geom, 1 << 9, CSConfig.dev())
        for g in (ConstantsAllocatorGate, FmaGate, NopGate):
            inner.allow_gate(g)
        a = inner.alloc_variables_with_values(
            rng.integers(0, P_, 8, dtype=np.uint64))
        # different constant per seed -> different setup -> different VK
        FmaGate.compute_fma_batch(inner, 3 + seed, (a, a), 5, a)
        inner.pad_and_shrink()
        sb = create_base_setup(inner)
        cfg = ProofConfig(fri_lde_factor=4, merkle_tree_cap_size=4,
                          security_level=20, pow_bits=0)
        art = create_setup_and_vk(inner, sb, cfg, "poseidon2")
        proof = prove(inner, art, cfg, "poseidon", "poseidon2")
        assert verify(art.vk, proof, "poseidon", "poseidon2")
        return art.vk, proof, cfg

    def make_outer(vk, proof, cfg):
        outer = make_outer_cs(1 << 16)
        avk = AllocatedVerificationKey.allocate(outer, vk)
        alloc = AllocatedProof.allocate(outer, proof)
        recursive_verify(outer, vk, alloc, cfg, "poseidon", "poseidon2",
                         allocated_vk=avk)
        outer.pad_and_shrink()
        return outer

    vk1, proof1, cfg = make_inner(0)
    vk2, proof2, _ = make_inner(1)
    assert vk1.setup_merkle_tree_cap != vk2.setup_merkle_tree_cap

    outer1 = make_outer(vk1, proof1, cfg)
    assert outer1.check_if_satisfied()
    outer2 = make_outer(vk2, proof2, cfg)
    assert outer2.check_if_satisfied()

    # the two outer circuits are THE SAME circuit: identical setup polys
    sb1 = create_base_setup(outer1)
    sb2 = create_base_setup(outer2)
    assert sb1.constant_columns.shape == sb2.constant_columns.shape
    assert np.array_equal(sb1.constant_columns, sb2.constant_columns)
    assert np.array_equal(sb1.copy_permutation_polys,
                          sb2.copy_permutation_polys)

    # corrupting the allocated cap must break verification
    outer3 = make_outer_cs(1 << 16)
    import dataclasses
    bad_vk = dataclasses.replace(
        vk1, setup_merkle_tree_cap=[
            tuple((int(x) + (1 if i == 0 and j == 0 else 0)) % P
                  for j, x in enumerate(el))
            for i, el in enumerate(vk1.setup_merkle_tree_cap)])
    avk3 = AllocatedVerificationKey.allocate(outer3, bad_vk)
    alloc3 = AllocatedProof.allocate(outer3, proof1)
    recursive_verify(outer3, vk1, alloc3, cfg, "poseidon", "poseidon2",
                     allocated_vk=avk3)
    outer3.pad_and_shrink()
    assert not outer3.check_if_satisfied(verbose=False)
