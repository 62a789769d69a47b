"""End-to-end prove → verify tests on small circuits.

Mirrors the reference's CS-level integration tests
(src/cs/implementations/cs.rs:1049-1692): build a small circuit with the dev
config, check satisfiability, create setup + VK, prove, verify, and check
that corrupted proofs fail.
"""

import numpy as np
import pytest

from boojum_tpu.cs import ConstraintSystem, CSConfig, CSGeometry, LookupParameters, LookupTable
from boojum_tpu.cs.gates import (
    BooleanConstraintGate, ConstantsAllocatorGate, FmaGate, NopGate,
    PublicInputGate, ReductionGate, SelectionGate,
)
from boojum_tpu.cs.setup import create_base_setup
from boojum_tpu.prover import ProofConfig, create_setup_and_vk, prove
from boojum_tpu.verifier import verify
from boojum_tpu.utils import npgl

P = npgl.ORDER
RNG = np.random.default_rng(11)

GEOM = CSGeometry(num_columns_under_copy_permutation=16, num_witness_columns=0,
                  num_constant_columns=4, max_allowed_constraint_degree=4)


def build_small_circuit(with_lookup=False, with_public=True, n_fma=30):
    lookup = LookupParameters.specialized_with_table_id_as_constant(
        width=3, num_repetitions=2, share_table_id=True) if with_lookup else None
    cs = ConstraintSystem(GEOM, 1 << 10, CSConfig.dev())
    if lookup:
        cs.allow_lookup(lookup)
    cs.allow_gate(ConstantsAllocatorGate)
    cs.allow_gate(FmaGate)
    cs.allow_gate(ReductionGate, params=4)
    cs.allow_gate(BooleanConstraintGate)
    cs.allow_gate(SelectionGate)
    cs.allow_gate(PublicInputGate)
    cs.allow_gate(NopGate)

    if lookup:
        rows = [(a, b, a ^ b) for a in range(8) for b in range(8)]
        table = LookupTable("xor3", np.asarray(rows, np.uint64), num_keys=2)
        tid = cs.add_lookup_table(table)

    a = cs.alloc_variables_with_values(RNG.integers(0, P, n_fma, dtype=np.uint64))
    b = cs.alloc_variables_with_values(RNG.integers(0, P, n_fma, dtype=np.uint64))
    c = cs.alloc_variables_with_values(RNG.integers(0, P, n_fma, dtype=np.uint64))
    d = FmaGate.compute_fma_batch(cs, 3, (a, b), 5, c)
    e = ReductionGate.reduce_terms_batch(
        cs, [1, 2, 3, 4], np.stack([a[:8], b[:8], c[:8], d[:8]]))
    k = ConstantsAllocatorGate.allocate_constant(cs, 1234)
    bits = BooleanConstraintGate.allocate_batch(cs, [1, 0, 1, 1])
    sel = SelectionGate.select_batch(cs, a[:4], b[:4], bits)

    if lookup:
        la = cs.alloc_variables_with_values([1, 2, 3, 7, 5])
        lb = cs.alloc_variables_with_values([6, 2, 1, 7, 0])
        lo = cs.alloc_variables_with_values([1 ^ 6, 0, 3 ^ 1, 0, 5])
        cs.enforce_lookup_batch(tid, np.stack([la, lb, lo]))

    if with_public:
        PublicInputGate.place(cs, int(d[0]))
        PublicInputGate.place(cs, int(e[0]))

    cs.pad_and_shrink()
    return cs


def run_roundtrip(cs, transcript_kind="poseidon2", hasher="poseidon2",
                  fri_lde=8, pow_bits=0, pow_hash="blake2s"):
    assert cs.check_if_satisfied()
    setup_base = create_base_setup(cs)
    cfg = ProofConfig(fri_lde_factor=fri_lde, merkle_tree_cap_size=4,
                      security_level=100, pow_bits=pow_bits,
                      pow_hash=pow_hash)
    artifacts = create_setup_and_vk(cs, setup_base, cfg, hasher)
    proof = prove(cs, artifacts, cfg, transcript_kind, hasher)
    ok = verify(artifacts.vk, proof, transcript_kind, hasher)
    return proof, artifacts, ok


def test_prove_verify_no_lookup():
    cs = build_small_circuit(with_lookup=False)
    proof, artifacts, ok = run_roundtrip(cs)
    assert ok


def test_prove_verify_with_lookup():
    cs = build_small_circuit(with_lookup=True)
    proof, artifacts, ok = run_roundtrip(cs)
    assert ok


def test_prove_verify_blake2s():
    cs = build_small_circuit(with_lookup=True)
    proof, artifacts, ok = run_roundtrip(
        cs, transcript_kind="blake2s", hasher="blake2s")
    assert ok


def test_prove_verify_with_pow():
    cs = build_small_circuit(with_lookup=False, n_fma=5)
    proof, artifacts, ok = run_roundtrip(cs, pow_bits=8)
    assert ok
    assert proof.pow_challenge != 0 or True  # nonce may be 0 legitimately


def test_prove_verify_with_algebraic_pow():
    """Poseidon2 PoW (pow.py): grind + verify end-to-end, and a wrong nonce
    is rejected."""
    import copy

    cs = build_small_circuit(with_lookup=False, n_fma=5)
    proof, artifacts, ok = run_roundtrip(cs, pow_bits=8,
                                         pow_hash="poseidon2")
    assert ok
    bad = copy.deepcopy(proof)
    bad.pow_challenge ^= 1
    assert not verify(artifacts.vk, bad, "poseidon2", "poseidon2")


def test_constants_as_constraint_gate():
    """ConstantsAllocationAsConstraintGate (reference
    constants_allocator_as_explicit_constraint.rs): constants pinned by
    explicit degree-1 terms, no constant columns; dedup tool shared with
    ConstantsAllocatorGate; serde round-trips the parametrized evaluator."""
    from boojum_tpu.cs.gates import ConstantsAllocationAsConstraintGate
    from boojum_tpu.prover.serialization import vk_from_json, vk_to_json

    def build():
        cs2 = ConstraintSystem(GEOM, 1 << 10, CSConfig.dev())
        cs2.allow_gate(ConstantsAllocatorGate)
        cs2.allow_gate(FmaGate)
        cs2.allow_gate(NopGate)
        vs = ConstantsAllocationAsConstraintGate.add(cs2, (7, 1 << 16))
        assert [cs2.get_value(int(v)) for v in vs] == \
            [0, 1, P - 1, 7, 1 << 16]
        # dedup tool shared: allocate_constant(7) reuses the gate's variable
        assert ConstantsAllocatorGate.allocate_constant(cs2, 7) == int(vs[3])
        a = cs2.alloc_variables_with_values([3, 4])
        FmaGate.compute_fma_batch(cs2, 2, (a, a), 1, vs[3:4].repeat(2))
        cs2.pad_and_shrink()
        return cs2

    cs2 = build()
    proof, artifacts, ok = run_roundtrip(cs2, fri_lde=4)
    assert ok
    # parametrized evaluator survives VK serde
    vk2 = vk_from_json(vk_to_json(artifacts.vk))
    assert verify(vk2, proof, "poseidon2", "poseidon2")

    # a corrupted pinned constant makes the circuit unsatisfiable
    cs3 = build()
    cs3.resolver.set_value(cs3.static_tools["constant_to_variable"][7], 8)
    assert not cs3.check_if_satisfied(verbose=False)


def test_poseidon2_pow_unit():
    from boojum_tpu.prover import pow as pow_mod
    ch = [123, 456, 789, 1011]
    nonce = pow_mod.poseidon2_pow(ch, 10, batch=2048)
    assert pow_mod.verify_poseidon2_pow(ch, 10, nonce)
    assert not pow_mod.verify_poseidon2_pow(ch, 10, nonce + 1)
    # grind/verify agree with the scalar twin digest definition
    assert pow_mod._poseidon2_digest(ch, nonce) < (1 << (64 - 10))


def test_corrupted_proof_fails():
    cs = build_small_circuit(with_lookup=True)
    proof, artifacts, ok = run_roundtrip(cs)
    assert ok
    import copy
    # corrupt a claimed evaluation
    p2 = copy.deepcopy(proof)
    v = list(p2.values_at_z[3])
    v[0] = (v[0] + 1) % P
    p2.values_at_z[3] = tuple(v)
    assert not verify(artifacts.vk, p2, "poseidon2", "poseidon2")
    # corrupt a query leaf
    p3 = copy.deepcopy(proof)
    p3.queries_per_fri_repetition[0].witness_query.leaf_elements[0] ^= 1
    assert not verify(artifacts.vk, p3, "poseidon2", "poseidon2")
    # corrupt public input
    p4 = copy.deepcopy(proof)
    if p4.public_inputs:
        p4.public_inputs[0] = (p4.public_inputs[0] + 1) % P
        assert not verify(artifacts.vk, p4, "poseidon2", "poseidon2")
    # corrupt final FRI monomials
    p5 = copy.deepcopy(proof)
    m0 = list(p5.final_fri_monomials[0])
    m0[0] = (m0[0] + 1) % P
    p5.final_fri_monomials = (m0, p5.final_fri_monomials[1])
    assert not verify(artifacts.vk, p5, "poseidon2", "poseidon2")


def test_unsatisfied_circuit_asserts():
    cs = build_small_circuit(with_lookup=False, n_fma=5)
    # corrupt witness after synthesis
    cs.resolver.values[10] = (int(cs.resolver.values[10]) + 1) % P
    assert not cs.check_if_satisfied(verbose=False)
    setup_base = create_base_setup(cs)
    cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=4)
    artifacts = create_setup_and_vk(cs, setup_base, cfg, "poseidon2")
    with pytest.raises(AssertionError):
        prove(cs, artifacts, cfg, "poseidon2", "poseidon2")


def test_serialization_roundtrip(tmp_path):
    from boojum_tpu.prover.proof import proof_to_json
    from boojum_tpu.prover.serialization import (
        load_setup_base, proof_from_json, save_setup_base, vk_from_json,
        vk_to_json)
    from boojum_tpu.cs.setup import create_base_setup

    cs = build_small_circuit(with_lookup=True, n_fma=8)
    proof, artifacts, ok = run_roundtrip(cs, fri_lde=4)
    assert ok
    # proof json roundtrip re-verifies
    p2 = proof_from_json(proof_to_json(proof))
    assert verify(artifacts.vk, p2, "poseidon2", "poseidon2")
    # vk json roundtrip verifies the same proof
    vk2 = vk_from_json(vk_to_json(artifacts.vk))
    assert verify(vk2, p2, "poseidon2", "poseidon2")
    # setup base npz roundtrip
    path = str(tmp_path / "setup.npz")
    save_setup_base(path, artifacts.setup_base)
    sb2 = load_setup_base(path)
    assert np.array_equal(sb2.copy_permutation_polys,
                          artifacts.setup_base.copy_permutation_polys)
    assert sb2.selector_paths == [list(p) for p in
                                  artifacts.setup_base.selector_paths]


def test_device_prover_matches_host():
    """The device-resident prover must emit a BIT-IDENTICAL proof."""
    from boojum_tpu.prover.device_prover import DeviceProver, create_device_setup
    from boojum_tpu.prover.proof import proof_to_json

    cs = build_small_circuit(with_lookup=True, n_fma=12)
    assert cs.check_if_satisfied()
    sb = create_base_setup(cs)
    cfg = ProofConfig(fri_lde_factor=4, merkle_tree_cap_size=4)
    host_art = create_setup_and_vk(cs, sb, cfg, "poseidon2")
    host_proof = prove(cs, host_art, cfg, "poseidon2", "poseidon2")
    dev_art = create_device_setup(cs, sb, cfg, "poseidon2")
    dp = DeviceProver(cs, dev_art, cfg)
    dev_proof = dp.prove("poseidon2", "poseidon2")
    assert verify(dev_art.vk, dev_proof, "poseidon2", "poseidon2")
    assert proof_to_json(host_proof) == proof_to_json(dev_proof)


@pytest.mark.slow
@pytest.mark.skipif(
    not __import__("os").environ.get("BOOJUM_RUN_CPU_FUSED"),
    reason="XLA:CPU compile of the fused carry-chain programs regressed "
           "from minutes to >50min on this box (killed, never completed). "
           "The same byte-identity is pinned ON-CHIP every round: "
           "scripts/tpu_smoke.py proves mega-fused == rolled on the real "
           "TPU, and test_device_prover_matches_host pins rolled == host. "
           "Set BOOJUM_RUN_CPU_FUSED=1 to attempt this anyway.")
def test_fused_quotient_matches_rolled():
    """The fused single-dispatch quotient path (DeviceProver(fuse=True), the
    TPU default) is byte-identical to the rolled path (the CPU default).
    Slow: XLA:CPU compile of the fused carry-chain programs takes minutes."""
    from boojum_tpu.prover.device_prover import DeviceProver, create_device_setup
    from boojum_tpu.prover.proof import proof_to_json

    cs = build_small_circuit(with_lookup=True, n_fma=12)
    sb = create_base_setup(cs)
    cfg = ProofConfig(fri_lde_factor=4, merkle_tree_cap_size=4)
    dev_art = create_device_setup(cs, sb, cfg, "poseidon2")
    rolled = DeviceProver(cs, dev_art, cfg, fuse=False).prove(
        "poseidon2", "poseidon2")
    fused = DeviceProver(cs, dev_art, cfg, fuse=True).prove(
        "poseidon2", "poseidon2")
    assert proof_to_json(rolled) == proof_to_json(fused)
    assert verify(dev_art.vk, fused, "poseidon2", "poseidon2")


def test_prove_one_shot_convenience():
    from boojum_tpu.prover import ProofConfig, prove_one_shot, verify_circuit

    cs = build_small_circuit()
    proof, vk = prove_one_shot(
        cs, ProofConfig(fri_lde_factor=16, merkle_tree_cap_size=4),
        "poseidon2", "poseidon2")
    assert verify_circuit(vk, proof, "poseidon2", "poseidon2")


def test_witness_columns_end_to_end():
    """Geometry with real witness (non-copiable) columns: zero-check keeps
    its inversion hint in a witness column; full prove->verify + mutation."""
    from boojum_tpu.cs import (ConstraintSystem, CSConfig, CSGeometry)
    from boojum_tpu.cs.gates import (BooleanConstraintGate,
                                     ConstantsAllocatorGate, FmaGate, NopGate,
                                     PublicInputGate, ZeroCheckGate)
    from boojum_tpu.prover import ProofConfig, prove_one_shot, verify_circuit

    geom = CSGeometry(num_columns_under_copy_permutation=8,
                      num_witness_columns=4, num_constant_columns=4,
                      max_allowed_constraint_degree=4)
    cs = ConstraintSystem(geom, 128, CSConfig.dev())
    for g in (ConstantsAllocatorGate, FmaGate, NopGate, BooleanConstraintGate,
              PublicInputGate):
        cs.allow_gate(g)
    cs.allow_gate(ZeroCheckGate, params=True)  # use_witness_column
    vals = [0, 5, 0, 9, 1]
    inp = cs.alloc_variables_with_values(vals)
    flags = ZeroCheckGate.is_zero_batch_with_witness(cs, inp)
    assert [int(x) for x in cs.get_values(flags)] == [1, 0, 1, 0, 0]
    PublicInputGate.place(cs, int(flags[0]))
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()
    proof, vk = prove_one_shot(
        cs, ProofConfig(fri_lde_factor=16, merkle_tree_cap_size=4))
    assert verify_circuit(vk, proof)
    cs.resolver.values[int(flags[1])] = 1
    assert not cs.check_if_satisfied(verbose=False)


def test_checked_in_fixture_proof_verifies():
    """Format-stability guard (reference ships proof.json/vk.json at repo
    root): the checked-in fixture proof must keep verifying."""
    import os

    from boojum_tpu.prover import serialization as ser
    from boojum_tpu.prover.serialization import proof_from_json
    from boojum_tpu.verifier import verify

    fdir = os.path.join(os.path.dirname(__file__), "fixtures")
    vk = ser.vk_from_json(open(os.path.join(fdir, "vk.json")).read())
    proof = proof_from_json(open(os.path.join(fdir, "proof.json")).read())
    assert verify(vk, proof, "poseidon2", "poseidon2")


@pytest.mark.slow
@pytest.mark.skipif(
    not __import__("os").environ.get("BOOJUM_RUN_CPU_FUSED"),
    reason="needs the fused per-phase quotient programs, whose XLA:CPU "
           "compile regressed to >20min on this box. The device-transcript "
           "byte-identity is pinned ON-CHIP every round: scripts/"
           "tpu_smoke.py compares a device-transcript mega prove against a "
           "host-transcript rolled prove byte-for-byte on the real TPU. "
           "Set BOOJUM_RUN_CPU_FUSED=1 to run here anyway.")
def test_device_transcript_byte_identical():
    """The device-resident transcript path (challenges derived on device,
    one mid-prove handoff sync, batched final fetch) emits a BIT-IDENTICAL
    proof to the host-transcript path on the same fused prover. Slow: fused
    XLA:CPU compiles (also validated on the real chip)."""
    from boojum_tpu.prover.device_prover import DeviceProver, create_device_setup
    from boojum_tpu.prover.proof import proof_to_json

    cs = build_small_circuit(with_lookup=True, n_fma=12)
    sb = create_base_setup(cs)
    cfg = ProofConfig(fri_lde_factor=4, merkle_tree_cap_size=4)
    dev_art = create_device_setup(cs, sb, cfg, "poseidon2")
    dp = DeviceProver(cs, dev_art, cfg, fuse=True)
    host_proof = dp.prove("poseidon", "poseidon2", device_transcript=False)
    dev_proof = dp.prove("poseidon", "poseidon2", device_transcript=True)
    assert verify(dev_art.vk, dev_proof, "poseidon", "poseidon2")
    assert proof_to_json(host_proof) == proof_to_json(dev_proof)
