"""User-facing typed gadget wrappers: Num, Boolean, UInt8/16/32/64.

Reference behavior: src/gadgets/num/mod.rs, boolean/mod.rs, u8/u16/u32 —
thin typed handles over circuit variables with arithmetic/selection helpers
and witness hooks. Batched variants operate on numpy handle arrays (the
TPU-build synthesis style). Range checks route through lookup tables when a
table budget exists (sha256-style 4-bit tables) or boolean decomposition
otherwise.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..cs.cs import ConstraintSystem
from ..cs.gates import (BooleanConstraintGate, ConstantsAllocatorGate,
                        FmaGate, ReductionGate, SelectionGate, ZeroCheckGate)
from ..utils import npgl

P = npgl.ORDER


@dataclass(frozen=True)
class Num:
    """A field element as a circuit variable (reference Num<F>)."""

    cs: ConstraintSystem
    variable: int

    @staticmethod
    def allocate(cs, value: int) -> "Num":
        return Num(cs, cs.alloc_variable_with_value(value % P))

    @staticmethod
    def constant(cs, value: int) -> "Num":
        return Num(cs, ConstantsAllocatorGate.allocate_constant(cs, value % P))

    def _one(self):
        return ConstantsAllocatorGate.allocate_constant(self.cs, 1)

    def add(self, other: "Num") -> "Num":
        v = FmaGate.compute_fma(self.cs, 1, (self._one(), self.variable), 1,
                                other.variable)
        return Num(self.cs, v)

    def sub(self, other: "Num") -> "Num":
        v = FmaGate.compute_fma(self.cs, 1, (self._one(), self.variable),
                                P - 1, other.variable)
        return Num(self.cs, v)

    def mul(self, other: "Num") -> "Num":
        v = FmaGate.compute_fma(self.cs, 1, (self.variable, other.variable),
                                0, self._one())
        return Num(self.cs, v)

    def is_zero(self) -> "Boolean":
        flag = ZeroCheckGate.is_zero_batch(self.cs, [self.variable])
        return Boolean(self.cs, int(flag[0]))

    def equals(self, other: "Num") -> "Boolean":
        return self.sub(other).is_zero()

    def select(self, flag: "Boolean", other: "Num") -> "Num":
        """flag ? self : other."""
        v = SelectionGate.select_batch(
            self.cs, np.asarray([self.variable], np.uint64),
            np.asarray([other.variable], np.uint64), flag.variable)
        return Num(self.cs, int(v[0]))

    def get_witness(self) -> int:
        return self.cs.get_value(self.variable)


@dataclass(frozen=True)
class Boolean:
    """A 0/1-constrained variable (reference Boolean)."""

    cs: ConstraintSystem
    variable: int

    @staticmethod
    def allocate(cs, value: bool) -> "Boolean":
        v = BooleanConstraintGate.allocate_batch(cs, [1 if value else 0])
        return Boolean(cs, int(v[0]))

    def and_(self, other: "Boolean") -> "Boolean":
        one = ConstantsAllocatorGate.allocate_constant(self.cs, 1)
        v = FmaGate.compute_fma(self.cs, 1, (self.variable, other.variable),
                                0, one)
        return Boolean(self.cs, v)

    def or_(self, other: "Boolean") -> "Boolean":
        # a + b - a·b
        one = ConstantsAllocatorGate.allocate_constant(self.cs, 1)
        ab = FmaGate.compute_fma(self.cs, 1, (self.variable, other.variable),
                                 0, one)
        s = FmaGate.compute_fma(self.cs, 1, (one, self.variable), 1,
                                other.variable)
        v = FmaGate.compute_fma(self.cs, 1, (one, s), P - 1, ab)
        return Boolean(self.cs, v)

    def not_(self) -> "Boolean":
        one = ConstantsAllocatorGate.allocate_constant(self.cs, 1)
        v = FmaGate.compute_fma(self.cs, P - 1, (one, self.variable), 1, one)
        return Boolean(self.cs, v)

    def get_witness(self) -> bool:
        return bool(self.cs.get_value(self.variable))


class _UIntBase:
    """Shared machinery for fixed-width unsigned ints over one variable."""

    WIDTH = 0

    def __init__(self, cs: ConstraintSystem, variable: int):
        self.cs = cs
        self.variable = variable

    # -- allocation -----------------------------------------------------------

    @classmethod
    def allocate_checked(cls, cs, value: int, table_ids: dict = None):
        v = cs.alloc_variable_with_value(value % (1 << cls.WIDTH))
        out = cls(cs, v)
        out.enforce_range(table_ids)
        return out

    @classmethod
    def allocate_constant(cls, cs, value: int):
        return cls(cs, ConstantsAllocatorGate.allocate_constant(
            cs, value % (1 << cls.WIDTH)))

    def enforce_range(self, table_ids: dict = None):
        """Range check: via 4-bit TriXor lookups when a sha256-style table
        budget exists, else boolean decomposition."""
        cs = self.cs
        if table_ids and "tri_xor" in table_ids:
            from .sha256 import Sha256Gadget
            g = Sha256Gadget(cs, table_ids)
            chunks = cs.alloc_variables(self.WIDTH // 4)

            def fn(vals):
                x = int(vals[0, 0])
                return np.asarray([(x >> (4 * i)) & 0xF
                                   for i in range(self.WIDTH // 4)], np.uint64)

            cs.set_values_with_dependencies(
                np.asarray([[self.variable]], np.uint64), chunks, fn)
            acc = _recompose_pow16(cs, [int(c) for c in chunks])
            one = ConstantsAllocatorGate.allocate_constant(cs, 1)
            FmaGate.enforce_fma_batch(cs, 1, ([one], [acc]), 0, [one],
                                      [self.variable])
            g.range_check_chunks([int(c) for c in chunks])
        else:
            from .recursion.primitives import decompose_bits
            from .num import CircuitOps
            ops = CircuitOps(cs)
            decompose_bits(cs, ops, self.variable, self.WIDTH,
                           enforce_canonical=False)

    # -- arithmetic ------------------------------------------------------------

    def add(self, other):
        """(self + other) mod 2^WIDTH, returns (result, carry Boolean)."""
        from ..cs.gates.arith import U32AddGate
        cs = self.cs
        if self.WIDTH == 32 and cs.gate_is_allowed("u32_add"):
            c, cout = U32AddGate.add_batch(cs, [self.variable],
                                           [other.variable])
            return type(self)(cs, int(c[0])), Boolean(cs, int(cout[0]))
        # generic width via uintx gate
        assert cs.gate_is_allowed(f"uintx_add_{self.WIDTH}")
        zero = ConstantsAllocatorGate.allocate_constant(cs, 0)
        c = cs.alloc_variables(1)
        cout = cs.alloc_variables(1)

        def fn(vals):
            s = int(vals[0, 0]) + int(vals[1, 0])
            return np.stack([np.asarray([s % (1 << self.WIDTH)], np.uint64),
                             np.asarray([s >> self.WIDTH], np.uint64)])

        cs.set_values_with_dependencies(
            np.asarray([[self.variable], [other.variable]], np.uint64),
            np.stack([c, cout]), fn)
        cs.place_general_gate_batch(
            f"uintx_add_{self.WIDTH}", None, [1 << self.WIDTH],
            np.asarray([[self.variable, other.variable, zero,
                         int(c[0]), int(cout[0])]], np.uint64))
        return type(self)(cs, int(c[0])), Boolean(cs, int(cout[0]))

    def get_witness(self) -> int:
        return self.cs.get_value(self.variable)


def _recompose_pow16(cs, chunk_vars: list) -> int:
    """Σ chunk_i · 16^i via chained reductions."""
    zero = ConstantsAllocatorGate.allocate_constant(cs, 0)
    acc = None
    shift = 0
    rest = list(chunk_vars)
    while rest or acc is None:
        group = rest[:3] if acc is not None else rest[:4]
        if acc is not None:
            coeffs = [1] + [1 << (4 * (shift + i)) for i in range(len(group))]
            terms = [acc] + group
        else:
            coeffs = [1 << (4 * i) for i in range(len(group))]
            terms = list(group)
        while len(terms) < 4:
            terms.append(zero)
            coeffs.append(0)
        acc = ReductionGate.reduce_terms(cs, coeffs, terms)
        shift += len(group)
        rest = rest[len(group):]
    return acc


class UInt8(_UIntBase):
    WIDTH = 8


class UInt16(_UIntBase):
    WIDTH = 16


class UInt32(_UIntBase):
    WIDTH = 32


@dataclass(frozen=True)
class UInt64:
    """Two u32 limbs (values up to 2^64-1 exceed the field; reference
    u64 gadgets are limb pairs)."""

    low: UInt32
    high: UInt32

    @staticmethod
    def allocate_checked(cs, value: int, table_ids: dict = None):
        return UInt64(UInt32.allocate_checked(cs, value & 0xFFFFFFFF, table_ids),
                      UInt32.allocate_checked(cs, (value >> 32) & 0xFFFFFFFF,
                                              table_ids))

    def get_witness(self) -> int:
        return self.low.get_witness() | (self.high.get_witness() << 32)


class _MultiLimbUInt:
    """Wide unsigned ints as little-endian u32-limb vectors (reference
    src/gadgets/u160 u256 u512 — limbed big-uints with ripple-carry
    add/sub via U32Add/U32Sub gates and limbwise select)."""

    NUM_LIMBS = 0

    def __init__(self, cs: ConstraintSystem, limbs: list):
        assert len(limbs) == self.NUM_LIMBS
        self.cs = cs
        self.limbs = limbs  # list[UInt32]

    @classmethod
    def allocate_checked(cls, cs, value: int, table_ids: dict = None):
        limbs = [UInt32.allocate_checked(cs, (value >> (32 * i)) & 0xFFFFFFFF,
                                         table_ids)
                 for i in range(cls.NUM_LIMBS)]
        return cls(cs, limbs)

    @classmethod
    def allocate_constant(cls, cs, value: int):
        return cls(cs, [UInt32.allocate_constant(
            cs, (value >> (32 * i)) & 0xFFFFFFFF)
            for i in range(cls.NUM_LIMBS)])

    @classmethod
    def zero(cls, cs):
        return cls.allocate_constant(cs, 0)

    def add(self, other):
        """Ripple-carry add; returns (result, overflow Boolean)."""
        from ..cs.gates.arith import U32AddGate
        cs = self.cs
        out = []
        carry = None
        for a, b in zip(self.limbs, other.limbs):
            cvars, couts = U32AddGate.add_batch(
                cs, [a.variable], [b.variable],
                None if carry is None else [carry])
            out.append(UInt32(cs, int(cvars[0])))
            carry = int(couts[0])
        return type(self)(cs, out), Boolean(cs, carry)

    def sub(self, other):
        """Ripple-borrow sub; returns (result, borrow Boolean)."""
        from ..cs.gates.arith import U32SubGate
        cs = self.cs
        out = []
        borrow = None
        for a, b in zip(self.limbs, other.limbs):
            cvars, bouts = U32SubGate.sub_batch(
                cs, [a.variable], [b.variable],
                None if borrow is None else [borrow])
            out.append(UInt32(cs, int(cvars[0])))
            borrow = int(bouts[0])
        return type(self)(cs, out), Boolean(cs, borrow)

    def select(self, flag: "Boolean", other):
        """self if flag else other, limbwise."""
        from ..cs.gates import SelectionGate
        cs = self.cs
        a = [l.variable for l in self.limbs]
        b = [l.variable for l in other.limbs]
        sel = SelectionGate.select_batch(
            cs, np.asarray(a, np.uint64), np.asarray(b, np.uint64),
            np.full(self.NUM_LIMBS, flag.variable, np.uint64))
        return type(self)(cs, [UInt32(cs, int(v)) for v in sel])

    def is_zero(self) -> "Boolean":
        from .num import CircuitOps
        ops = CircuitOps(self.cs)
        acc = None
        for l in self.limbs:
            acc = l.variable if acc is None else \
                ops.add(acc, l.variable)  # sum < p for <= 16 limbs
        flag = Num(self.cs, acc).is_zero()
        return flag

    def get_witness(self) -> int:
        return sum(l.get_witness() << (32 * i)
                   for i, l in enumerate(self.limbs))


class UInt160(_MultiLimbUInt):
    NUM_LIMBS = 5


class UInt256(_MultiLimbUInt):
    NUM_LIMBS = 8


class UInt512(_MultiLimbUInt):
    NUM_LIMBS = 16
