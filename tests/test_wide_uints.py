"""UInt256/512 widening mul + div_rem + misc ops (reference src/gadgets/u256,
u512 — widening_mul via UInt32::fma_with_carry chains, mask/equals/is_odd/
div2; div_rem is an extension beyond the reference API)."""

import numpy as np
import pytest

from boojum_tpu.cs import (ConstraintSystem, CSConfig, CSGeometry,
                           LookupParameters)
from boojum_tpu.cs.gates import (BooleanConstraintGate, ConstantsAllocatorGate,
                                 FmaGate, NopGate, ReductionGate,
                                 SelectionGate)
from boojum_tpu.cs.gates.arith import U8x4FMAGate, U32AddGate, U32SubGate
from boojum_tpu.gadgets import tables
from boojum_tpu.gadgets.wrappers import Boolean, UInt256, UInt512

RNG = np.random.default_rng(17)


def make_cs(max_trace_log=14):
    geom = CSGeometry(num_columns_under_copy_permutation=32,
                      num_witness_columns=0, num_constant_columns=4,
                      max_allowed_constraint_degree=4)
    cs = ConstraintSystem(geom, 1 << max_trace_log, CSConfig.dev())
    cs.allow_lookup(LookupParameters.specialized_with_table_id_as_constant(
        width=3, num_repetitions=4, share_table_id=True))
    cs.allow_gate(ConstantsAllocatorGate)
    cs.allow_gate(FmaGate)
    cs.allow_gate(ReductionGate, params=4)
    cs.allow_gate(BooleanConstraintGate)
    cs.allow_gate(SelectionGate)
    cs.allow_gate(U32AddGate)
    cs.allow_gate(U32SubGate)
    cs.allow_gate(U8x4FMAGate)
    from boojum_tpu.cs.gates import ZeroCheckGate
    cs.allow_gate(ZeroCheckGate, params=False)
    cs.allow_gate(NopGate)
    tids = {"range8": cs.add_lookup_table(
        tables.create_range_check_table(8, width=3))}
    return cs, tids


def rand_u256():
    return int.from_bytes(RNG.bytes(32), "little")


def test_widening_mul_witness_and_satisfiable():
    cs, tids = make_cs()
    a_v, b_v = rand_u256(), rand_u256()
    a = UInt256.allocate_checked(cs, a_v, tids)
    b = UInt256.allocate_checked(cs, b_v, tids)
    wide = a.widening_mul(b, tids)
    assert wide.get_witness() == a_v * b_v
    cs.pad_and_shrink()
    assert cs.check_if_satisfied(verbose=True)


def test_widening_mul_corrupted_fails():
    cs, tids = make_cs()
    a = UInt256.allocate_checked(cs, 3, tids)
    b = UInt256.allocate_checked(cs, 5, tids)
    wide = a.widening_mul(b, tids)
    # corrupt the first product limb value
    from boojum_tpu.cs import places
    idx = int(places.index_of(np.asarray([wide.limbs[0].variable]))[0])
    cs.resolver.values[idx] ^= 1
    cs.pad_and_shrink()
    assert not cs.check_if_satisfied(verbose=False)


def test_div_rem():
    cs, tids = make_cs()
    a_v, b_v = rand_u256(), rand_u256() >> 130
    a = UInt256.allocate_checked(cs, a_v, tids)
    b = UInt256.allocate_checked(cs, b_v, tids)
    q, r = a.div_rem(b, tids)
    assert q.get_witness() == a_v // b_v
    assert r.get_witness() == a_v % b_v
    cs.pad_and_shrink()
    assert cs.check_if_satisfied(verbose=True)


def test_misc_ops():
    cs, tids = make_cs()
    a_v = rand_u256()
    a = UInt256.allocate_checked(cs, a_v, tids)
    b = UInt256.allocate_checked(cs, a_v, tids)
    assert cs.get_value(a.equals(b).variable) == 1
    c = UInt256.allocate_checked(cs, a_v ^ 1, tids)
    assert cs.get_value(a.equals(c).variable) == 0
    assert cs.get_value(a.is_odd(tids).variable) == (a_v & 1)
    half = a.div2(tids)
    assert half.get_witness() == a_v >> 1
    t = Boolean.allocate(cs, True)
    f = Boolean.allocate(cs, False)
    assert a.mask(t).get_witness() == a_v
    assert a.mask(f).get_witness() == 0
    assert a.mask_negated(f).get_witness() == a_v
    cs.pad_and_shrink()
    assert cs.check_if_satisfied(verbose=True)


def test_byte_range_check_rejects_oversize():
    cs, tids = make_cs()
    from boojum_tpu.gadgets.wrappers import byte_range_check
    v = cs.alloc_variable_with_value(300)
    with pytest.raises(KeyError):
        byte_range_check(cs, [v], tids)
