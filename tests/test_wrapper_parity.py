"""Reference-parity surface of the typed wrappers (src/gadgets/num/mod.rs,
boolean/mod.rs, u32/mod.rs, u64): linear combinations, dot products, fma,
conditional swaps/enforces, bit spreads, u32 fma_with_carry / division /
byte views, u64 limb ops — each checked for witness correctness AND
satisfiability (plus targeted unsatisfiability for the enforcing ops)."""

import numpy as np
import pytest

from boojum_tpu.cs import (ConstraintSystem, CSConfig, CSGeometry,
                           LookupParameters)
from boojum_tpu.cs.gates import (BooleanConstraintGate, ConditionalSwapGate,
                                 ConstantsAllocatorGate, DotProductGate,
                                 FmaGate, NopGate, ReductionGate,
                                 SelectionGate, ZeroCheckGate)
from boojum_tpu.cs.gates.arith import U8x4FMAGate, U32AddGate, U32SubGate
from boojum_tpu.gadgets import tables
from boojum_tpu.gadgets.wrappers import (Boolean, Num, UInt8, UInt16, UInt32,
                                         UInt64)

P = (1 << 64) - (1 << 32) + 1
RNG = np.random.default_rng(23)


def make_cs(max_trace_log=13):
    geom = CSGeometry(num_columns_under_copy_permutation=32,
                      num_witness_columns=0, num_constant_columns=4,
                      max_allowed_constraint_degree=4)
    cs = ConstraintSystem(geom, 1 << max_trace_log, CSConfig.dev())
    cs.allow_lookup(LookupParameters.specialized_with_table_id_as_constant(
        width=3, num_repetitions=4, share_table_id=True))
    for g in (ConstantsAllocatorGate, FmaGate, BooleanConstraintGate,
              SelectionGate, U32AddGate, U32SubGate, U8x4FMAGate,
              ConditionalSwapGate, NopGate):
        cs.allow_gate(g)
    cs.allow_gate(ReductionGate, params=4)
    cs.allow_gate(DotProductGate, params=4)
    cs.allow_gate(ZeroCheckGate, params=False)
    tids = {"range8": cs.add_lookup_table(
        tables.create_range_check_table(8, width=3))}
    return cs, tids


def finish_ok(cs):
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()


def finish_bad(cs):
    cs.pad_and_shrink()
    assert not cs.check_if_satisfied(verbose=False)


def test_num_linear_combination_and_dot_product():
    cs, _ = make_cs()
    vals = [int(x) for x in RNG.integers(0, P, 7, dtype=np.uint64)]
    coeffs = [int(x) for x in RNG.integers(0, P, 7, dtype=np.uint64)]
    nums = [Num.allocate(cs, v) for v in vals]
    lc = Num.linear_combination(cs, list(zip(coeffs, nums)))
    assert lc.get_witness() == sum(c * v for c, v in zip(coeffs, vals)) % P
    Num.enforce_zero_for_linear_combination(
        cs, list(zip(coeffs, nums)) + [(P - lc.get_witness(),
                                        Num.constant(cs, 1))])
    b = [Num.allocate(cs, v) for v in vals]
    dp = Num.dot_product(cs, nums, b)
    assert dp.get_witness() == sum(v * v for v in vals) % P
    finish_ok(cs)


def test_num_fma_inverse_swap_mask():
    cs, _ = make_cs()
    a = Num.allocate(cs, 0xDEAD)
    b = Num.allocate(cs, 0xBEEF)
    c = Num.allocate(cs, 0x1234)
    r = Num.fma(cs, a, b, 3, c, 5)
    assert r.get_witness() == (3 * 0xDEAD * 0xBEEF + 5 * 0x1234) % P
    inv = a.inverse_unchecked()
    assert inv.get_witness() == pow(0xDEAD, P - 2, P)
    t = Boolean.allocate(cs, True)
    f = Boolean.allocate(cs, False)
    x, y = Num.conditionally_swap(t, a, b)
    assert (x.get_witness(), y.get_witness()) == (0xBEEF, 0xDEAD)
    x, y = Num.conditionally_swap(f, a, b)
    assert (x.get_witness(), y.get_witness()) == (0xDEAD, 0xBEEF)
    assert a.mask(t).get_witness() == 0xDEAD
    assert a.mask(f).get_witness() == 0
    assert a.mask_negated(f).get_witness() == 0xDEAD
    a.enforce_equal(Num.allocate(cs, 0xDEAD))
    a.conditionally_enforce_equal(f, b)     # flag off: no constraint bite
    a.conditionally_enforce_equal(t, Num.allocate(cs, 0xDEAD))
    bits = Num.allocate(cs, 0b101101).spread_into_bits(6)
    assert [bit.get_witness() for bit in bits] == [1, 0, 1, 1, 0, 1]
    finish_ok(cs)


def test_num_conditional_enforce_bites():
    cs, _ = make_cs()
    a = Num.allocate(cs, 1)
    b = Num.allocate(cs, 2)
    t = Boolean.allocate(cs, True)
    a.conditionally_enforce_equal(t, b)
    finish_bad(cs)


def test_boolean_parity_ops():
    cs, _ = make_cs()
    t = Boolean.allocate(cs, True)
    f = Boolean.allocate(cs, False)
    assert t.xor(f).get_witness() is True
    assert t.xor(t).get_witness() is False
    assert t.equals(t).get_witness() is True
    assert t.equals(f).get_witness() is False
    assert Boolean.multi_and(cs, [t, t, t]).get_witness() is True
    assert Boolean.multi_and(cs, [t, f, t]).get_witness() is False
    assert Boolean.multi_or(cs, [f, f, t]).get_witness() is True
    assert Boolean.multi_or(cs, [f, f, f]).get_witness() is False
    assert t.mask(f).get_witness() is False
    assert t.mask_negated(f).get_witness() is True
    assert t.select(f, f).get_witness() is False
    assert Boolean.constant(cs, True).get_witness() is True
    v = cs.alloc_variable_with_value(1)
    assert Boolean.from_variable_checked(cs, v).get_witness() is True
    t.enforce_equal(Boolean.allocate(cs, True))
    t.conditionally_enforce_true(t)
    f.conditionally_enforce_false(t)
    f.conditionally_enforce_true(f)   # flag off
    finish_ok(cs)


def test_boolean_conditional_enforce_bites():
    cs, _ = make_cs()
    t = Boolean.allocate(cs, True)
    f = Boolean.allocate(cs, False)
    f.conditionally_enforce_true(t)
    finish_bad(cs)


def test_uint32_fma_with_carry_and_mul():
    cs, tids = make_cs()
    av, bv, cv, dv = (int(x) for x in RNG.integers(0, 1 << 32, 4,
                                                   dtype=np.uint64))
    a = UInt32.allocate_checked(cs, av, tids)
    b = UInt32.allocate_checked(cs, bv, tids)
    c = UInt32.allocate_checked(cs, cv, tids)
    d = UInt32.allocate_checked(cs, dv, tids)
    low, high = a.fma_with_carry(b, c, d, tids)
    total = av * bv + cv + dv
    assert low.get_witness() == total & 0xFFFFFFFF
    assert high.get_witness() == total >> 32
    s = UInt32.allocate_checked(cs, 0x1234, tids)
    t = UInt32.allocate_checked(cs, 0x5678, tids)
    assert s.non_widening_mul(t, tids).get_witness() == 0x1234 * 0x5678
    finish_ok(cs)


def test_uint32_div_and_views():
    cs, tids = make_cs()
    v = 0xDEADBEEF
    a = UInt32.allocate_checked(cs, v, tids)
    q, r = a.div_by_constant(1000, tids)
    assert (q.get_witness(), r.get_witness()) == divmod(v, 1000)
    assert a.div2(tids).get_witness() == v >> 1
    lo, hi = a.decompose_into_uint16(tids)
    assert (lo.get_witness(), hi.get_witness()) == (v & 0xFFFF, v >> 16)
    assert a.low_u16(tids).get_witness() == v & 0xFFFF
    le = a.to_le_bytes(tids)
    assert [x.get_witness() for x in le] == list(v.to_bytes(4, "little"))
    assert [x.get_witness() for x in a.to_be_bytes(tids)] == \
        list(v.to_bytes(4, "big"))
    back = UInt32.from_le_bytes(cs, le, tids)
    back.enforce_range(tids)
    assert back.get_witness() == v
    b = UInt32.allocate_checked(cs, 7, tids)
    assert b.increment_checked(tids).get_witness() == 8
    assert a.add_no_overflow(b, tids).get_witness() == v + 7
    d, brw = b.sub(a)
    assert d.get_witness() == (7 - v) % (1 << 32)
    assert brw.get_witness() is True
    assert a.sub_no_overflow(b, tids).get_witness() == v - 7
    assert a.equals(UInt32.allocate_checked(cs, v, tids)).get_witness()
    assert not a.is_zero().get_witness()
    flag = Boolean.allocate(cs, False)
    assert a.select(flag, b).get_witness() == 7
    assert a.mask(flag).get_witness() == 0
    finish_ok(cs)


def test_uint32_div_by_constant_bad_remainder():
    cs, tids = make_cs()
    a = UInt32.allocate_checked(cs, 1000001, tids)
    q, r = a.div_by_constant(1000, tids)
    # corrupt: shift one unit from q·1000 into r (r = 1001 >= divisor)
    cs.resolver.values[q.variable] = 999
    cs.resolver.values[r.variable] = 1001
    finish_bad(cs)


def test_uint16_generic_sub():
    from boojum_tpu.cs.gates.arith import UIntXAddGate

    cs, tids = make_cs()
    cs.allow_evaluator(UIntXAddGate.make_evaluator(16))
    a = UInt16.allocate_checked(cs, 0x1234, tids)
    b = UInt16.allocate_checked(cs, 0x5678, tids)
    d, brw = a.sub(b)
    assert d.get_witness() == (0x1234 - 0x5678) % (1 << 16)
    assert brw.get_witness() is True
    s, carry = a.add(b)
    assert s.get_witness() == (0x1234 + 0x5678) % (1 << 16)
    assert carry.get_witness() is False
    finish_ok(cs)


def test_uint64_limb_ops():
    cs, tids = make_cs()
    av = 0xFFFFFFFF_FFFFFFF0
    bv = 0x00000000_00000020
    a = UInt64.allocate_checked(cs, av, tids)
    b = UInt64.allocate_checked(cs, bv, tids)
    s, ovf = a.add(b)
    assert s.get_witness() == (av + bv) % (1 << 64)
    assert ovf.get_witness() is True
    d, brw = b.sub(a)
    assert d.get_witness() == (bv - av) % (1 << 64)
    assert brw.get_witness() is True
    t = Boolean.allocate(cs, True)
    assert a.select(t, b).get_witness() == av
    assert a.equals(UInt64.allocate_checked(cs, av, tids)).get_witness()
    assert not a.equals(b).get_witness()
    assert UInt64.allocate_constant(cs, 0).is_zero().get_witness()
    assert not a.is_zero().get_witness()
    assert a.mask(Boolean.allocate(cs, False)).get_witness() == 0
    le = a.to_le_bytes(tids)
    assert [x.get_witness() for x in le] == list(av.to_bytes(8, "little"))
    back = UInt64.from_le_bytes(cs, le, tids)
    assert back.get_witness() == av
    finish_ok(cs)


def test_multilimb_byte_views():
    from boojum_tpu.gadgets.wrappers import UInt256, UInt512

    cs, tids = make_cs()
    v = int.from_bytes(RNG.bytes(32), "little")
    a = UInt256.allocate_checked(cs, v, tids)
    le = a.to_le_bytes(tids)
    assert [x.get_witness() for x in le] == list(v.to_bytes(32, "little"))
    assert [x.get_witness() for x in a.to_be_bytes(tids)] == \
        list(v.to_bytes(32, "big"))
    back = UInt256.from_le_bytes(cs, le, tids)
    assert back.get_witness() == v
    limbs = a.decompose_into_u32_limbs()
    assert [l.get_witness() for l in limbs] == \
        [(v >> (32 * i)) & 0xFFFFFFFF for i in range(8)]
    assert UInt256.from_u32_limbs(cs, limbs).get_witness() == v
    w = int.from_bytes(RNG.bytes(64), "little")
    b = UInt512.allocate_checked(cs, w, tids)
    assert b.to_low().get_witness() == w % (1 << 256)
    assert b.to_high().get_witness() == w >> 256
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()
