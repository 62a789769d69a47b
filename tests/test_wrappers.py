"""Typed wrapper + queue gadget tests (reference src/gadgets/num, boolean,
u8/u16/u32, queue)."""

import numpy as np

from boojum_tpu.cs import ConstraintSystem, CSConfig, CSGeometry, LookupParameters
from boojum_tpu.cs.gates import (BooleanConstraintGate, ConstantsAllocatorGate,
                                 FmaGate, NopGate, ReductionGate, SelectionGate,
                                 ZeroCheckGate, U32AddGate, U32SubGate)
from boojum_tpu.gadgets import sha256 as sha_mod
from boojum_tpu.gadgets.poseidon2_circuit import allow_poseidon2_gates
from boojum_tpu.gadgets.queue import CircuitQueue
from boojum_tpu.gadgets.wrappers import Boolean, Num, UInt8, UInt16, UInt32, UInt64

RNG = np.random.default_rng(31)


def make_cs(with_tables=True, max_trace=1 << 14):
    geom = CSGeometry(60, 0, 4, 4)
    cs = ConstraintSystem(geom, max_trace, CSConfig.dev())
    if with_tables:
        cs.allow_lookup(LookupParameters.specialized_with_table_id_as_constant(
            width=4, num_repetitions=8, share_table_id=True))
    for g in (ConstantsAllocatorGate, FmaGate, NopGate, BooleanConstraintGate,
              SelectionGate, ZeroCheckGate, U32AddGate, U32SubGate):
        cs.allow_gate(g)
    cs.allow_gate(ReductionGate, params=4)
    allow_poseidon2_gates(cs)
    tids = sha_mod.add_sha256_tables(cs) if with_tables else None
    return cs, tids


def test_num_boolean():
    cs, _ = make_cs(with_tables=False, max_trace=1 << 10)
    P = (1 << 64) - (1 << 32) + 1
    a = Num.allocate(cs, 123456789)
    b = Num.allocate(cs, 987654321)
    assert a.add(b).get_witness() == (123456789 + 987654321) % P
    assert a.mul(b).get_witness() == (123456789 * 987654321) % P
    assert a.sub(b).get_witness() == (123456789 - 987654321) % P
    assert not a.equals(b).get_witness()
    assert a.equals(a).get_witness()
    t = Boolean.allocate(cs, True)
    f = Boolean.allocate(cs, False)
    assert t.and_(f).get_witness() is False
    assert t.or_(f).get_witness() is True
    assert f.not_().get_witness() is True
    assert a.select(t, b).get_witness() == 123456789
    assert a.select(f, b).get_witness() == 987654321
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()


def test_uints():
    cs, tids = make_cs()
    v8 = UInt8.allocate_checked(cs, 0xAB, tids)
    v16 = UInt16.allocate_checked(cs, 0xBEEF, tids)
    v32 = UInt32.allocate_checked(cs, 0xDEADBEEF, tids)
    v64 = UInt64.allocate_checked(cs, 0x0123456789ABCDEF, tids)
    assert v8.get_witness() == 0xAB
    assert v16.get_witness() == 0xBEEF
    assert v32.get_witness() == 0xDEADBEEF
    assert v64.get_witness() == 0x0123456789ABCDEF
    a = UInt32.allocate_checked(cs, 0xFFFFFFF0, tids)
    b = UInt32.allocate_checked(cs, 0x20, tids)
    c, carry = a.add(b)
    assert c.get_witness() == (0xFFFFFFF0 + 0x20) % (1 << 32)
    assert carry.get_witness() is True
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()


def test_uint_range_check_catches_bad_value():
    cs, tids = make_cs()
    v = UInt8.allocate_checked(cs, 0x12, tids)
    # corrupt the witness beyond 8 bits
    cs.resolver.values[v.variable] = 0x1234
    cs.pad_and_shrink()
    assert not cs.check_if_satisfied(verbose=False)


def test_circuit_queue():
    cs, _ = make_cs(with_tables=False)
    q = CircuitQueue(cs, element_width=4)
    P = (1 << 64) - (1 << 32) + 1
    items = [[int(x) for x in RNG.integers(0, P, 4, dtype=np.uint64)]
             for _ in range(5)]
    for it in items:
        q.push([cs.alloc_variable_with_value(v) for v in it])
    popped = []
    while q.length:
        popped.append([cs.get_value(v) for v in q.pop()])
    assert popped == items
    q.enforce_consistency()
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()


def test_multilimb_uints():
    from boojum_tpu.gadgets.wrappers import UInt160, UInt256, UInt512

    cs, tids = make_cs()
    a_val = 0xDEADBEEF_12345678_9ABCDEF0_13579BDF_2468ACE0
    b_val = 0x1111111F_FFFFFFFF_00000001_FFFFFFFF_FFFFFFFF
    a = UInt160.allocate_checked(cs, a_val, tids)
    b = UInt160.allocate_checked(cs, b_val, tids)
    s, ovf = a.add(b)
    assert s.get_witness() == (a_val + b_val) % (1 << 160)
    assert ovf.get_witness() is ((a_val + b_val) >> 160 > 0)
    d, brw = a.sub(b)
    assert d.get_witness() == (a_val - b_val) % (1 << 160)
    assert brw.get_witness() is (a_val < b_val)
    t = Boolean.allocate(cs, True)
    assert a.select(t, b).get_witness() == a_val
    assert a.select(t.not_(), b).get_witness() == b_val
    assert not a.is_zero().get_witness()
    z = UInt256.allocate_checked(cs, 0, tids)
    assert z.is_zero().get_witness()
    w = UInt512.allocate_checked(cs, (1 << 511) | 7, tids)
    assert w.get_witness() == (1 << 511) | 7
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()


def test_full_state_circuit_queue():
    from boojum_tpu.gadgets.queue import FullStateCircuitQueue

    cs, _ = make_cs(with_tables=False)
    q = FullStateCircuitQueue(cs, element_width=8)
    P = (1 << 64) - (1 << 32) + 1
    items = [[int(x) for x in RNG.integers(0, P, 8, dtype=np.uint64)]
             for _ in range(3)]
    for it in items:
        q.push([cs.alloc_variable_with_value(v) for v in it])
    popped = []
    while q.length:
        popped.append([cs.get_value(v) for v in q.pop()])
    assert popped == items
    q.enforce_consistency()
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()


def test_sponge_optimizer_queues():
    """Three optimized queues interleaved through one SpongeOptimizer:
    chains must equal plain FullStateCircuitQueue chains; satisfiable."""
    from boojum_tpu.cs import ConstraintSystem, CSConfig, CSGeometry
    from boojum_tpu.cs.gates import (ConstantsAllocatorGate, FmaGate, NopGate,
                                     ReductionGate)
    from boojum_tpu.gadgets.poseidon2_circuit import allow_poseidon2_gates
    from boojum_tpu.gadgets.queue import (FullStateCircuitQueue,
                                          OptimizedCircuitQueue,
                                          SpongeOptimizer)

    P = (1 << 64) - (1 << 32) + 1
    cs = ConstraintSystem(CSGeometry(132, 0, 4, 8), 1 << 10, CSConfig.dev())
    for g in (ConstantsAllocatorGate, FmaGate, NopGate):
        cs.allow_gate(g)
    cs.allow_gate(ReductionGate, params=4)
    allow_poseidon2_gates(cs, flattened=True)

    opt = SpongeOptimizer(cs)
    queues = [OptimizedCircuitQueue(cs, opt) for _ in range(3)]
    plain = [FullStateCircuitQueue(cs) for _ in range(3)]
    items = [[int(x) for x in RNG.integers(0, P, 8, dtype=np.uint64)]
             for _ in range(6)]
    for cycle in range(2):
        for qi in range(3):
            it = items[cycle * 3 + qi]
            vs = [cs.alloc_variable_with_value(v) for v in it]
            queues[qi].push(vs)
            plain[qi].push(vs)
        opt.flush()
    for qi in range(3):
        got = [cs.get_value(v) for v in queues[qi].tail]
        want = [cs.get_value(v) for v in plain[qi].tail]
        assert got == want
    for cycle in range(2):
        for qi in range(3):
            queues[qi].pop()
        opt.flush()
    for q in queues:
        q.enforce_consistency()
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()
