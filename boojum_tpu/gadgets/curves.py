"""Short-Weierstrass curve points over a non-native field.

Reference behavior: src/gadgets/curves/sw_projective/mod.rs (projective point
ops over NonNativeField). This build uses affine coordinates with witness
slopes (each constrained by its defining equation, with a witness-inverse
proof that denominators are nonzero), covering add / double /
on-curve checks; scalar multiplication composes them.
"""

from __future__ import annotations

from ..cs.cs import ConstraintSystem
from .non_native import NonNativeField, NonNativeParams


class SWAffinePoint:
    """(x, y) on y² = x³ + a·x + b over the foreign field."""

    def __init__(self, x: NonNativeField, y: NonNativeField, a: int, b: int):
        self.x = x
        self.y = y
        self.a = a
        self.b = b

    @classmethod
    def allocate_checked(cls, cs: ConstraintSystem, params: NonNativeParams,
                         x_val: int, y_val: int, a: int, b: int,
                         table_ids=None) -> "SWAffinePoint":
        x = NonNativeField.allocate_checked(cs, params, x_val, table_ids)
        y = NonNativeField.allocate_checked(cs, params, y_val, table_ids)
        pt = cls(x, y, a, b)
        pt.enforce_on_curve()
        return pt

    def _cs(self):
        return self.x.cs

    def _params(self):
        return self.x.params

    def _const(self, v: int) -> NonNativeField:
        return NonNativeField.constant(self._cs(), self._params(), v,
                                       self.x.table_ids)

    def enforce_on_curve(self):
        """y² == x³ + a·x + b."""
        cs = self._cs()
        y2 = self.y.mul(self.y)
        x2 = self.x.mul(self.x)
        x3 = x2.mul(self.x)
        rhs = x3
        if self.a:
            rhs = rhs.add(self._const(self.a).mul(self.x))
        rhs = rhs.add(self._const(self.b))
        _enforce_nn_equal(y2, rhs)

    def _nonzero_witness_inverse(self, d: NonNativeField) -> NonNativeField:
        """Allocate 1/d and enforce d·inv == 1 (proves d != 0)."""
        cs = self._cs()
        params = self._params()
        d_val = d.get_witness() if cs.resolver else 1
        inv_val = pow(d_val % params.modulus, params.modulus - 2,
                      params.modulus) if d_val % params.modulus else 0
        inv = NonNativeField.allocate_checked(cs, params, inv_val,
                                              self.x.table_ids)
        prod = d.mul(inv)
        _enforce_nn_equal(prod, self._const(1))
        return inv

    def add_unequal(self, other: "SWAffinePoint") -> "SWAffinePoint":
        """P + Q for P != ±Q (x1 != x2, proven by witness inverse)."""
        cs = self._cs()
        params = self._params()
        dx = other.x.add(_nn_neg(self.x))
        self._nonzero_witness_inverse(dx)
        dy = other.y.add(_nn_neg(self.y))
        # slope s: s·dx == dy
        M = params.modulus
        if cs.resolver:
            s_val = (dy.get_witness() *
                     pow(dx.get_witness() % M, M - 2, M)) % M
        else:
            s_val = 0
        s = NonNativeField.allocate_checked(cs, params, s_val, self.x.table_ids)
        _enforce_nn_equal(s.mul(dx), dy)
        # x3 = s² − x1 − x2 ; y3 = s·(x1 − x3) − y1
        x3 = s.mul(s).add(_nn_neg(self.x)).add(_nn_neg(other.x))
        y3 = s.mul(self.x.add(_nn_neg(x3))).add(_nn_neg(self.y))
        return SWAffinePoint(x3, y3, self.a, self.b)

    def double(self) -> "SWAffinePoint":
        cs = self._cs()
        params = self._params()
        M = params.modulus
        two_y = self.y.add(self.y)
        self._nonzero_witness_inverse(two_y)
        # s·(2y) == 3x² + a
        x2 = self.x.mul(self.x)
        num = x2.add(x2).add(x2)
        if self.a:
            num = num.add(self._const(self.a))
        if cs.resolver:
            s_val = (num.get_witness() *
                     pow(two_y.get_witness() % M, M - 2, M)) % M
        else:
            s_val = 0
        s = NonNativeField.allocate_checked(cs, params, s_val, self.x.table_ids)
        _enforce_nn_equal(s.mul(two_y), num)
        x3 = s.mul(s).add(_nn_neg(self.x)).add(_nn_neg(self.x))
        y3 = s.mul(self.x.add(_nn_neg(x3))).add(_nn_neg(self.y))
        return SWAffinePoint(x3, y3, self.a, self.b)


def _nn_neg(a: NonNativeField) -> NonNativeField:
    """M − a (as a fresh reduced element)."""
    cs = a.cs
    params = a.params
    val = (-a.get_witness()) % params.modulus if cs.resolver else 0
    neg = NonNativeField.allocate_checked(cs, params, val, a.table_ids)
    s = a.add(neg)
    _enforce_nn_equal(s, NonNativeField.constant(cs, params, 0, a.table_ids))
    return neg


def _enforce_nn_equal(a: NonNativeField, b: NonNativeField):
    """Limbwise equality of two REDUCED representatives.

    Both sides here come out of mul/add (always fully reduced by the q·M + r
    witness identity with r range-limited), so limb equality is sound."""
    from .num import CircuitOps
    ops = CircuitOps(a.cs)
    for la, lb in zip(a.limbs, b.limbs):
        ops.enforce_equal(la, lb)
