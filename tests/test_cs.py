"""CS-core tests: npgl host field ops, resolver, gate placement, the
satisfiability oracle, lookups.

Mirrors reference CS integration tests (src/cs/implementations/cs.rs:1049-)."""

import numpy as np
import pytest

from boojum_tpu.cs import ConstraintSystem, CSConfig, CSGeometry, LookupParameters, LookupTable
from boojum_tpu.cs.gates import (
    BooleanConstraintGate, ConstantsAllocatorGate, FmaGate, NopGate,
    PublicInputGate, ReductionGate, SelectionGate, ZeroCheckGate,
)
from boojum_tpu.utils import npgl

P = npgl.ORDER
RNG = np.random.default_rng(3)


def test_npgl_ops():
    a = RNG.integers(0, P, 1000, dtype=np.uint64)
    b = RNG.integers(0, P, 1000, dtype=np.uint64)
    a[:4] = [0, 1, P - 1, 0xFFFFFFFF]
    b[:4] = [P - 1, P - 1, P - 1, 0xFFFFFFFF]
    assert np.array_equal(npgl.add(a, b),
                          np.array([(int(x) + int(y)) % P for x, y in zip(a, b)], np.uint64))
    assert np.array_equal(npgl.sub(a, b),
                          np.array([(int(x) - int(y)) % P for x, y in zip(a, b)], np.uint64))
    assert np.array_equal(npgl.mul(a, b),
                          np.array([(int(x) * int(y)) % P for x, y in zip(a, b)], np.uint64))
    inv = npgl.batch_inv(a[a != 0][:50])
    for x, y in zip(a[a != 0][:50], inv):
        assert int(x) * int(y) % P == 1
    pw = npgl.powers(7, 20)
    assert [int(x) for x in pw] == [pow(7, i, P) for i in range(20)]


GEOM = CSGeometry(num_columns_under_copy_permutation=16, num_witness_columns=0,
                  num_constant_columns=4, max_allowed_constraint_degree=4)


def make_cs(max_trace=128, lookup=None):
    cs = ConstraintSystem(GEOM, max_trace, CSConfig.dev())
    if lookup:
        cs.allow_lookup(lookup)
    cs.allow_gate(ConstantsAllocatorGate)
    cs.allow_gate(FmaGate)
    cs.allow_gate(ReductionGate, params=4)
    cs.allow_gate(BooleanConstraintGate)
    cs.allow_gate(SelectionGate)
    cs.allow_gate(ZeroCheckGate)
    cs.allow_gate(PublicInputGate)
    cs.allow_gate(NopGate)
    return cs


def test_fma_placement_and_satisfiability():
    cs = make_cs()
    a = cs.alloc_variables_with_values(RNG.integers(0, P, 10, dtype=np.uint64))
    b = cs.alloc_variables_with_values(RNG.integers(0, P, 10, dtype=np.uint64))
    c = cs.alloc_variables_with_values(RNG.integers(0, P, 10, dtype=np.uint64))
    d = FmaGate.compute_fma_batch(cs, 3, (a, b), 5, c)
    # witness values correct
    av, bv, cv, dv = (cs.get_values(x) for x in (a, b, c, d))
    for i in range(10):
        assert int(dv[i]) == (3 * int(av[i]) * int(bv[i]) + 5 * int(cv[i])) % P
    # capacity: 16 copy cols / width 4 = 4 instances/row -> 10 instances = 3 rows
    assert cs.next_available_row == 3
    cs.pad_and_shrink()
    assert cs.final_trace_len == 4
    assert cs.check_if_satisfied()


def test_fma_row_sharing_by_params():
    cs = make_cs()
    vals = RNG.integers(0, P, 2, dtype=np.uint64)
    x = cs.alloc_variables_with_values(vals)
    # same params share rows across separate calls
    FmaGate.compute_fma(cs, 1, (int(x[0]), int(x[0])), 0, int(x[0]))
    FmaGate.compute_fma(cs, 1, (int(x[1]), int(x[1])), 0, int(x[1]))
    assert cs.next_available_row == 1
    # different params -> new row
    FmaGate.compute_fma(cs, 2, (int(x[0]), int(x[0])), 0, int(x[0]))
    assert cs.next_available_row == 2
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()


def test_constant_allocator_dedup():
    cs = make_cs()
    v1 = ConstantsAllocatorGate.allocate_constant(cs, 42)
    v2 = ConstantsAllocatorGate.allocate_constant(cs, 42)
    v3 = ConstantsAllocatorGate.allocate_constant(cs, 43)
    assert v1 == v2 and v1 != v3
    assert cs.get_value(v3) == 43
    # capacity = min(4 const cols, 16 copy cols) = 4 per row
    assert cs.next_available_row == 1
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()


def test_reduction_and_boolean_and_select():
    cs = make_cs()
    terms = cs.alloc_variables_with_values([2, 3, 5, 7])
    r = ReductionGate.reduce_terms(cs, [1, 10, 100, 1000], list(terms))
    assert cs.get_value(r) == 2 + 30 + 500 + 7000
    bits = BooleanConstraintGate.allocate_batch(cs, [0, 1, 1, 0])
    sel = SelectionGate.select_batch(cs, terms, terms[::-1].copy(), bits)
    got = cs.get_values(sel)
    assert [int(x) for x in got] == [7, 3, 5, 2]
    zc_in = cs.alloc_variables_with_values([0, 5, 0, 9])
    flags = ZeroCheckGate.is_zero_batch(cs, zc_in)
    assert [int(x) for x in cs.get_values(flags)] == [1, 0, 1, 0]
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()


def test_satisfiability_catches_bad_witness():
    cs = make_cs()
    a = cs.alloc_variables_with_values([3])
    b = cs.alloc_variables_with_values([4])
    c = cs.alloc_variables_with_values([0])
    d = FmaGate.compute_fma_batch(cs, 1, (a, b), 0, c)
    # corrupt the witness
    cs.resolver.values[int(d[0])] = 99
    cs.pad_and_shrink()
    assert not cs.check_if_satisfied(verbose=False)


def test_lookup_specialized():
    lookup = LookupParameters.specialized_with_table_id_as_constant(
        width=3, num_repetitions=2, share_table_id=True)
    cs = make_cs(lookup=lookup)
    # xor table over 2 bits: (a, b, a^b)
    rows = [(a, b, a ^ b) for a in range(4) for b in range(4)]
    table = LookupTable("xor2", np.asarray(rows, np.uint64), num_keys=2)
    tid = cs.add_lookup_table(table)
    a = cs.alloc_variables_with_values([1, 2, 3, 0, 1])
    b = cs.alloc_variables_with_values([3, 1, 3, 2, 1])
    out_vals = [1 ^ 3, 2 ^ 1, 3 ^ 3, 0 ^ 2, 1 ^ 1]
    out = cs.alloc_variables_with_values(out_vals)
    cs.enforce_lookup_batch(tid, np.stack([a, b, out]))
    # 5 lookups at 2 repetitions/row = 3 rows
    assert cs.lookup_next_row == 3
    # multiplicities counted
    assert int(cs.lookup_multiplicities[0].sum()) == 5
    cs.pad_and_shrink()
    assert cs.final_trace_len == 16  # table len 16 dominates
    assert cs.check_if_satisfied()
    # wrong value in lookup -> unsatisfied
    cs2 = make_cs(lookup=lookup)
    tid2 = cs2.add_lookup_table(LookupTable("xor2", np.asarray(rows, np.uint64), 2))
    a2 = cs2.alloc_variables_with_values([1])
    b2 = cs2.alloc_variables_with_values([3])
    bad = cs2.alloc_variables_with_values([0])  # 1^3 = 2, not 0
    cs2.enforce_lookup_batch(tid2, np.stack([a2, b2, bad]))
    cs2.pad_and_shrink()
    assert not cs2.check_if_satisfied(verbose=False)


def test_public_input():
    cs = make_cs()
    v = cs.alloc_variables_with_values([77])
    PublicInputGate.place(cs, int(v[0]))
    assert cs.public_inputs == [(0, 0)]
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()


def test_resolver_playback():
    cs = make_cs()
    a = cs.alloc_variables_with_values(RNG.integers(0, P, 5, dtype=np.uint64))
    b = cs.alloc_variables_with_values(RNG.integers(0, P, 5, dtype=np.uint64))
    c = cs.alloc_variables_with_values(np.zeros(5, np.uint64))
    d = FmaGate.compute_fma_batch(cs, 7, (a, b), 0, c)
    replayed = cs.resolver.playback(cs.resolver.record)
    assert np.array_equal(replayed.get_values(d), cs.get_values(d))


def test_paranoia_mode():
    """CSConfig.paranoid() (reference cr_paranoia_mode,
    src/dag/resolvers/mt/mod.rs:172): resolutions reading an unresolved
    input raise immediately with the offending places; a clean circuit
    passes all checks including the pad-time placement-coverage sweep."""
    # clean circuit: paranoia is silent
    cs = ConstraintSystem(GEOM, 128, CSConfig.paranoid())
    cs.allow_gate(ConstantsAllocatorGate)
    cs.allow_gate(FmaGate)
    cs.allow_gate(NopGate)
    a = cs.alloc_variables_with_values(RNG.integers(0, P, 4, dtype=np.uint64))
    d = FmaGate.compute_fma_batch(cs, 3, (a, a), 5, a)
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()

    # reading an unresolved input raises with the offending place
    cs2 = ConstraintSystem(GEOM, 128, CSConfig.paranoid())
    cs2.allow_gate(FmaGate)
    cs2.allow_gate(NopGate)
    dangling = cs2.alloc_variables(4)  # never given values
    with pytest.raises(AssertionError, match="unresolved"):
        FmaGate.compute_fma_batch(cs2, 3, (dangling, dangling), 5, dangling)

    # the default config accepts the same program (reads zeros)
    cs3 = ConstraintSystem(GEOM, 128, CSConfig.dev())
    cs3.allow_gate(FmaGate)
    cs3.allow_gate(NopGate)
    dangling = cs3.alloc_variables(4)
    FmaGate.compute_fma_batch(cs3, 3, (dangling, dangling), 5, dangling)


def test_u32_gates_prove_verify():
    from boojum_tpu.cs.gates import U32AddGate, U32SubGate
    from boojum_tpu.cs.setup import create_base_setup
    from boojum_tpu.prover import ProofConfig, create_setup_and_vk, prove
    from boojum_tpu.verifier import verify

    cs = make_cs(max_trace=256)
    cs.allow_gate(U32AddGate)
    cs.allow_gate(U32SubGate)
    a_vals = RNG.integers(0, 1 << 32, 20, dtype=np.uint64)
    b_vals = RNG.integers(0, 1 << 32, 20, dtype=np.uint64)
    a = cs.alloc_variables_with_values(a_vals)
    b = cs.alloc_variables_with_values(b_vals)
    c, cout = U32AddGate.add_batch(cs, a, b)
    for i in range(20):
        s = int(a_vals[i]) + int(b_vals[i])
        assert int(cs.get_value(int(c[i]))) == s & 0xFFFFFFFF
        assert int(cs.get_value(int(cout[i]))) == s >> 32
    d, bout = U32SubGate.sub_batch(cs, a, b)
    for i in range(20):
        s = int(a_vals[i]) - int(b_vals[i])
        assert int(cs.get_value(int(d[i]))) == s % (1 << 32)
        assert int(cs.get_value(int(bout[i]))) == (1 if s < 0 else 0)
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()
    setup_base = create_base_setup(cs)
    cfg = ProofConfig(fri_lde_factor=4, merkle_tree_cap_size=4)
    artifacts = create_setup_and_vk(cs, setup_base, cfg, "poseidon2")
    proof = prove(cs, artifacts, cfg, "poseidon2", "poseidon2")
    assert verify(artifacts.vk, proof, "poseidon2", "poseidon2")


def test_fma_ext_gate():
    from boojum_tpu.cs.gates import FmaGateInExtension
    from boojum_tpu.field import extension as ext2

    cs = make_cs(max_trace=128)
    cs.allow_gate(FmaGateInExtension)
    a = (RNG.integers(0, P, 5, dtype=np.uint64), RNG.integers(0, P, 5, dtype=np.uint64))
    b = (RNG.integers(0, P, 5, dtype=np.uint64), RNG.integers(0, P, 5, dtype=np.uint64))
    c = (RNG.integers(0, P, 5, dtype=np.uint64), RNG.integers(0, P, 5, dtype=np.uint64))
    av = (cs.alloc_variables_with_values(a[0]), cs.alloc_variables_with_values(a[1]))
    bv = (cs.alloc_variables_with_values(b[0]), cs.alloc_variables_with_values(b[1]))
    cv = (cs.alloc_variables_with_values(c[0]), cs.alloc_variables_with_values(c[1]))
    q = (3, 5)
    l = (7, 11)
    d0, d1 = FmaGateInExtension.compute_fma_ext_batch(cs, q, (av, bv), l, cv)
    for i in range(5):
        ai = (int(a[0][i]), int(a[1][i]))
        bi = (int(b[0][i]), int(b[1][i]))
        ci = (int(c[0][i]), int(c[1][i]))
        want = ext2.s2_add(ext2.s2_mul(ext2.s2_mul(q, ai), bi), ext2.s2_mul(l, ci))
        got = (int(cs.get_value(int(d0[i]))), int(cs.get_value(int(d1[i]))))
        assert got == want, i
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()


def test_new_arith_gates():
    """SimpleNonlinearity, U32TriAddCarryAsChunk, U8x4FMA: satisfiability +
    witness semantics + mutation rejection."""
    from boojum_tpu.cs.gates import (SimpleNonlinearityGate,
                                     U32TriAddCarryAsChunkGate, U8x4FMAGate)

    P = (1 << 64) - (1 << 32) + 1
    rng = np.random.default_rng(17)
    cs = ConstraintSystem(
        CSGeometry(num_columns_under_copy_permutation=32,
                   num_witness_columns=0, num_constant_columns=4,
                   max_allowed_constraint_degree=8),
        256, CSConfig.dev())
    cs.allow_gate(ConstantsAllocatorGate)
    cs.allow_gate(NopGate)
    cs.allow_gate(SimpleNonlinearityGate, params=7)
    cs.allow_gate(U32TriAddCarryAsChunkGate)
    cs.allow_gate(U8x4FMAGate)

    # nonlinearity: y = (x + 3)^7
    xs_vals = rng.integers(0, P, 5, dtype=np.uint64)
    xs = cs.alloc_variables_with_values(xs_vals)
    ys = SimpleNonlinearityGate.apply_nonlinearity_batch(cs, xs, 3, 7)
    for xv, yh in zip(xs_vals, ys):
        assert cs.get_value(yh) == pow((int(xv) + 3) % P, 7, P)

    # tri-add: bytes of a + b + c
    def alloc_bytes(words):
        limbs = np.stack([(words >> np.uint64(8 * i)) & np.uint64(0xFF)
                          for i in range(4)], axis=1)
        return cs.alloc_variables_with_values(limbs.reshape(-1)).reshape(-1, 4)

    aw = rng.integers(0, 1 << 32, 6, dtype=np.uint64)
    bw = rng.integers(0, 1 << 32, 6, dtype=np.uint64)
    cw = rng.integers(0, 1 << 32, 6, dtype=np.uint64)
    out4, carry = U32TriAddCarryAsChunkGate.add_batch(
        cs, alloc_bytes(aw), alloc_bytes(bw), alloc_bytes(cw))
    for i in range(6):
        tot = int(aw[i]) + int(bw[i]) + int(cw[i])
        got = sum(cs.get_value(out4[i, j]) << (8 * j) for j in range(4))
        assert got == tot & 0xFFFFFFFF
        assert cs.get_value(carry[i]) == tot >> 32

    # u8x4 fma: a*b + c + cin = low + 2^32 high
    cin_w = rng.integers(0, 1 << 32, 6, dtype=np.uint64)
    low4, high4, pc2 = U8x4FMAGate.perform_fma_batch(
        cs, alloc_bytes(aw), alloc_bytes(bw), alloc_bytes(cw),
        alloc_bytes(cin_w))
    for i in range(6):
        res = int(aw[i]) * int(bw[i]) + int(cw[i]) + int(cin_w[i])
        lo = sum(cs.get_value(low4[i, j]) << (8 * j) for j in range(4))
        hi = sum(cs.get_value(high4[i, j]) << (8 * j) for j in range(4))
        assert lo == res & 0xFFFFFFFF and hi == res >> 32

    cs.pad_and_shrink()
    assert cs.check_if_satisfied()

    # mutation: corrupt one low byte
    cs.resolver.values[low4[0, 0]] = (cs.get_value(low4[0, 0]) + 1) % P
    assert not cs.check_if_satisfied(verbose=False)


def test_poseidon2_flattened_gate():
    """One-instance-per-permutation gate vs the exact scalar permutation,
    plus prove->verify and mutation rejection."""
    from boojum_tpu.cs.gates import Poseidon2FlattenedGate
    from boojum_tpu.hash.poseidon2 import s_permutation
    from boojum_tpu.prover import ProofConfig, prove_one_shot, verify_circuit

    rng = np.random.default_rng(23)
    cs = ConstraintSystem(
        CSGeometry(num_columns_under_copy_permutation=130,
                   num_witness_columns=0, num_constant_columns=4,
                   max_allowed_constraint_degree=8),
        64, CSConfig.dev())
    cs.allow_gate(ConstantsAllocatorGate)
    cs.allow_gate(NopGate)
    cs.allow_gate(Poseidon2FlattenedGate)
    states = rng.integers(0, P, (3, 12), dtype=np.uint64)
    in_vars = cs.alloc_variables_with_values(states.reshape(-1)).reshape(3, 12)
    out_vars = Poseidon2FlattenedGate.compute_round_function_batch(cs, in_vars)
    for i in range(3):
        want = s_permutation([int(x) for x in states[i]])
        got = [cs.get_value(int(v)) for v in out_vars[i]]
        assert got == want
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()
    proof, vk = prove_one_shot(
        cs, ProofConfig(fri_lde_factor=16, merkle_tree_cap_size=4))
    assert verify_circuit(vk, proof)
    cs.resolver.values[int(out_vars[0, 0])] ^= 1
    assert not cs.check_if_satisfied(verbose=False)


def test_specialized_gate_placement_end_to_end():
    """UniqueOnRow specialized gate (reference keccak-style configs): a
    MatrixMultiplication gate tiles dedicated columns on every row, no
    selectors; host prove->verify + device prover byte-equality."""
    from boojum_tpu.cs.gates.arith import MatrixMultiplicationGate, MatrixMulEvaluator
    from boojum_tpu.cs.setup import create_base_setup
    from boojum_tpu.prover import ProofConfig, create_setup_and_vk, prove
    from boojum_tpu.prover.device_prover import DeviceProver, create_device_setup
    from boojum_tpu.verifier import verify

    rng = np.random.default_rng(41)
    M = [[1, 2], [3, 4]]

    def build():
        cs = ConstraintSystem(CSGeometry(16, 0, 4, 4), 64, CSConfig.dev())
        cs.allow_gate(ConstantsAllocatorGate)
        cs.allow_gate(FmaGate)
        cs.allow_gate(NopGate)
        ev = MatrixMulEvaluator((2, M))
        ev.name = "matmul2_spec"
        cs.allow_evaluator(ev, placement="specialized", specialized_reps=2)

        n_inst = 5
        ins = rng.integers(0, P, (n_inst, 2), dtype=np.uint64)
        in_vars = cs.alloc_variables_with_values(ins.reshape(-1)).reshape(n_inst, 2)
        out_vals = np.array([
            [(int(M[0][0]) * int(a) + int(M[0][1]) * int(b)) % P,
             (int(M[1][0]) * int(a) + int(M[1][1]) * int(b)) % P]
            for a, b in ins], dtype=np.uint64)
        out_vars = cs.alloc_variables_with_values(out_vals.reshape(-1)).reshape(n_inst, 2)
        cs.place_specialized_gate_batch(
            "matmul2_spec", np.concatenate([in_vars, out_vars], axis=1))
        # also some general-purpose rows
        a = cs.alloc_variables_with_values(rng.integers(0, P, 6, dtype=np.uint64))
        FmaGate.compute_fma_batch(cs, 3, (a, a), 1, a)
        cs.pad_and_shrink()
        return cs

    cs = build()
    assert cs.check_if_satisfied()
    cfg = ProofConfig(fri_lde_factor=16, merkle_tree_cap_size=4)
    sb = create_base_setup(cs)
    art = create_setup_and_vk(cs, sb, cfg, "poseidon2")
    proof = prove(cs, art, cfg, "poseidon2", "poseidon2")
    assert verify(art.vk, proof, "poseidon2", "poseidon2")

    # device prover must produce the identical proof
    dart = create_device_setup(cs, sb, cfg, "poseidon2")
    dp = DeviceProver(cs, dart, cfg)
    dproof = dp.prove("poseidon2", "poseidon2")
    import dataclasses
    assert dataclasses.asdict(dproof) == dataclasses.asdict(proof)

    # corrupt a specialized-gate output -> unsatisfied
    cs2 = build()
    lookup_cols = 0
    col = cs2.gate_spec_data[2, 0]  # first instance's first output handle
    cs2.resolver.values[int(col) & ((1 << 48) - 1)] ^= 1
    assert not cs2.check_if_satisfied(verbose=False)


def test_poseidon_flattened_gate():
    """Classic-Poseidon flattened gate vs the exact scalar permutation."""
    from boojum_tpu.cs.gates import PoseidonFlattenedGate
    from boojum_tpu.hash.poseidon import s_permutation
    from boojum_tpu.prover import ProofConfig, prove_one_shot, verify_circuit

    rng = np.random.default_rng(29)
    cs = ConstraintSystem(CSGeometry(130, 0, 4, 8), 64, CSConfig.dev())
    cs.allow_gate(ConstantsAllocatorGate)
    cs.allow_gate(NopGate)
    cs.allow_gate(PoseidonFlattenedGate)
    states = rng.integers(0, P, (2, 12), dtype=np.uint64)
    in_vars = cs.alloc_variables_with_values(states.reshape(-1)).reshape(2, 12)
    out_vars = PoseidonFlattenedGate.compute_round_function_batch(cs, in_vars)
    for i in range(2):
        want = s_permutation([int(x) for x in states[i]])
        got = [cs.get_value(int(v)) for v in out_vars[i]]
        assert got == want
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()
    proof, vk = prove_one_shot(
        cs, ProofConfig(fri_lde_factor=16, merkle_tree_cap_size=4))
    assert verify_circuit(vk, proof)
    cs.resolver.values[int(out_vars[1, 5])] ^= 1
    assert not cs.check_if_satisfied(verbose=False)


def test_bounded_allocators():
    """Bounded boolean/constant allocators cap instances per row (reference
    bounded_*_allocator.rs); e2e prove->verify."""
    from boojum_tpu.cs.gates.simple import (BoundedBooleanEvaluator,
                                            BoundedConstantsAllocatorEvaluator)
    from boojum_tpu.prover import ProofConfig, prove_one_shot, verify_circuit

    cs = make_cs(max_trace=64)
    cs.allow_evaluator(BoundedBooleanEvaluator(3))
    bits = np.asarray([1, 0, 1, 1, 0, 1, 0], np.uint64)
    vs = cs.alloc_variables_with_values(bits)
    cs.place_general_gate_batch("boolean_bounded_3", None, [], vs[:, None])
    # 7 instances at 3/row -> 3 rows
    assert cs.next_available_row == 3
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()
    proof, vk = prove_one_shot(
        cs, ProofConfig(fri_lde_factor=16, merkle_tree_cap_size=4))
    assert verify_circuit(vk, proof)
    cs.resolver.values[int(vs[0])] = 5
    assert not cs.check_if_satisfied(verbose=False)
