"""Arithmetic gates: u32 add/sub with carries, parametrized-width add,
matrix multiplication, extension-field FMA.

Reference behavior: src/cs/gates/u32_add.rs (a + b + carry_in = c +
2^32·carry_out, carry boolean), u32_sub.rs (a - b - borrow_in = c -
2^32·borrow_out), uintx_add.rs (shift constant instead of 2^32),
matrix_multiplication_gate.rs (out = M·in for a constant NxN matrix — the
in-circuit Poseidon MDS), fma_gate_in_extension_without_constant.rs.
"""

from __future__ import annotations

import numpy as np

from ...utils import npgl
from .base import GateEvaluator


class U32AddEvaluator(GateEvaluator):
    name = "u32_add"
    num_variables = 5
    max_constraint_degree = 2
    num_quotient_terms = 2

    def evaluate(self, src, ops):
        a, b, cin, c, cout = (src.var(i) for i in range(5))
        shift = ops.from_int(1 << 32)
        t = ops.sub(ops.sub(ops.add(ops.add(a, b), cin), c), ops.mul(shift, cout))
        boolean = ops.sub(ops.mul(cout, cout), cout)
        return [t, boolean]


class U32AddGate:
    @staticmethod
    def make_evaluator():
        return U32AddEvaluator()

    @staticmethod
    def add_batch(cs, a, b, carry_in=None):
        """c = (a + b + carry_in) mod 2^32 with carry_out; returns (c, carry_out).
        Inputs must be range-checked u32 variables."""
        a = np.asarray(a, np.uint64).reshape(-1)
        b = np.asarray(b, np.uint64).reshape(-1)
        n = a.shape[0]
        if carry_in is None:
            from .simple import ConstantsAllocatorGate
            zero = ConstantsAllocatorGate.allocate_constant(cs, 0)
            carry_in = np.full(n, zero, np.uint64)
        else:
            carry_in = np.asarray(carry_in, np.uint64).reshape(-1)
        c = cs.alloc_variables(n)
        cout = cs.alloc_variables(n)

        def fn(vals):
            s = vals[0].astype(np.uint64) + vals[1] + vals[2]
            return np.stack([s & np.uint64(0xFFFFFFFF), s >> np.uint64(32)])

        cs.set_values_with_dependencies(np.stack([a, b, carry_in]),
                                        np.stack([c, cout]), fn)
        cs.place_general_gate_batch(
            "u32_add", None, [], np.stack([a, b, carry_in, c, cout], axis=1))
        return c, cout


class U32SubEvaluator(GateEvaluator):
    name = "u32_sub"
    num_variables = 5
    max_constraint_degree = 2
    num_quotient_terms = 2

    def evaluate(self, src, ops):
        a, b, bin_, c, bout = (src.var(i) for i in range(5))
        shift = ops.from_int(1 << 32)
        t = ops.add(ops.sub(ops.sub(ops.sub(a, b), bin_), c), ops.mul(shift, bout))
        boolean = ops.sub(ops.mul(bout, bout), bout)
        return [t, boolean]


class U32SubGate:
    @staticmethod
    def make_evaluator():
        return U32SubEvaluator()

    @staticmethod
    def sub_batch(cs, a, b, borrow_in=None):
        a = np.asarray(a, np.uint64).reshape(-1)
        b = np.asarray(b, np.uint64).reshape(-1)
        n = a.shape[0]
        if borrow_in is None:
            from .simple import ConstantsAllocatorGate
            zero = ConstantsAllocatorGate.allocate_constant(cs, 0)
            borrow_in = np.full(n, zero, np.uint64)
        else:
            borrow_in = np.asarray(borrow_in, np.uint64).reshape(-1)
        c = cs.alloc_variables(n)
        bout = cs.alloc_variables(n)

        def fn(vals):
            d = vals[0].astype(np.int64) - vals[1].astype(np.int64) \
                - vals[2].astype(np.int64)
            borrow = (d < 0).astype(np.uint64)
            return np.stack([(d + (borrow.astype(np.int64) << 32)).astype(np.uint64),
                             borrow])

        cs.set_values_with_dependencies(np.stack([a, b, borrow_in]),
                                        np.stack([c, bout]), fn)
        cs.place_general_gate_batch(
            "u32_sub", None, [], np.stack([a, b, borrow_in, c, bout], axis=1))
        return c, bout


class UIntXAddEvaluator(GateEvaluator):
    num_variables = 5
    num_constants = 1
    max_constraint_degree = 2
    num_quotient_terms = 2

    def __init__(self, width: int = 32):
        self.width = width
        self.name = f"uintx_add_{width}"

    def spec_params(self):
        return self.width

    def evaluate(self, src, ops):
        a, b, cin, c, cout = (src.var(i) for i in range(5))
        shift = src.const(0)
        t = ops.sub(ops.sub(ops.add(ops.add(a, b), cin), c), ops.mul(shift, cout))
        boolean = ops.sub(ops.mul(cout, cout), cout)
        return [t, boolean]


class UIntXAddGate:
    WIDTH = 32

    @classmethod
    def make_evaluator(cls, width: int = None):
        return UIntXAddEvaluator(width or cls.WIDTH)


class MatrixMulEvaluator(GateEvaluator):
    max_constraint_degree = 1
    """out = M·in for a constant N x N matrix (reference
    matrix_multiplication_gate.rs — in-circuit Poseidon MDS)."""

    def __init__(self, params):
        n, matrix = params
        self.n = n
        self.matrix = [[int(x) % npgl.ORDER for x in row] for row in matrix]
        self.name = f"matrix_mul_{n}"
        self.num_variables = 2 * n
        self.num_quotient_terms = n

    def spec_params(self):
        return (self.n, self.matrix)

    def evaluate(self, src, ops):
        out = []
        for i in range(self.n):
            acc = ops.zero()
            for j in range(self.n):
                acc = ops.add(acc, ops.mul(ops.from_int(self.matrix[i][j]),
                                           src.var(j)))
            out.append(ops.sub(acc, src.var(self.n + i)))
        return out


class MatrixMultiplicationGate:
    @staticmethod
    def make_evaluator(params):
        return MatrixMulEvaluator(params)

    @staticmethod
    def multiply_batch(cs, name, matrix, inputs_2d):
        """inputs_2d: (N, n) handles -> outputs (N, n)."""
        inputs = np.asarray(inputs_2d, np.uint64)
        nn, n = inputs.shape
        outputs = cs.alloc_variables(nn * n).reshape(nn, n)
        m = np.asarray([[int(x) % npgl.ORDER for x in row] for row in matrix],
                       np.uint64)

        def fn(vals):
            out = np.zeros((nn, n), np.uint64)
            for i in range(nn):
                for j in range(nn):
                    out[i] = npgl.add(out[i], npgl.mul_scalar(vals[j], int(m[i, j])))
            return out

        cs.set_values_with_dependencies(inputs, outputs, fn)
        cs.place_general_gate_batch(
            name, None, [], np.concatenate([inputs, outputs]).T)
        return outputs


class FmaExtEvaluator(GateEvaluator):
    """c0·A·B + c1·C -> D over GoldilocksExt2 (reference
    fma_gate_in_extension_without_constant.rs): variables are (c0, c1) pairs,
    coefficients are extension constants; two quotient terms (components)."""

    name = "fma_ext"
    num_variables = 8
    num_constants = 4
    max_constraint_degree = 3
    num_quotient_terms = 2

    def evaluate(self, src, ops):
        a = (src.var(0), src.var(1))
        b = (src.var(2), src.var(3))
        c = (src.var(4), src.var(5))
        d = (src.var(6), src.var(7))
        q = (src.const(0), src.const(1))
        l = (src.const(2), src.const(3))
        nr = ops.from_int(7)

        def emul(x, y):
            v0 = ops.mul(x[0], y[0])
            v1 = ops.mul(x[1], y[1])
            c0 = ops.add(v0, ops.mul(nr, v1))
            c1 = ops.sub(ops.sub(ops.mul(ops.add(x[0], x[1]),
                                         ops.add(y[0], y[1])), v0), v1)
            return (c0, c1)

        t = emul(emul(q, a), b)
        u = emul(l, c)
        r0 = ops.sub(ops.add(t[0], u[0]), d[0])
        r1 = ops.sub(ops.add(t[1], u[1]), d[1])
        return [r0, r1]


class FmaGateInExtension:
    @staticmethod
    def make_evaluator():
        return FmaExtEvaluator()

    @staticmethod
    def compute_fma_ext_batch(cs, coeff_quad, ab, coeff_lin, c):
        """coeffs are (c0, c1) int tuples; ab/c are pairs of (c0_vars, c1_vars)
        arrays; returns (d0_vars, d1_vars)."""
        from ...field import extension as ext2
        (a0, a1), (b0, b1) = ab
        c0v, c1v = c
        arrs = [np.asarray(x, np.uint64).reshape(-1)
                for x in (a0, a1, b0, b1, c0v, c1v)]
        n = arrs[0].shape[0]
        d0 = cs.alloc_variables(n)
        d1 = cs.alloc_variables(n)
        q = (int(coeff_quad[0]) % npgl.ORDER, int(coeff_quad[1]) % npgl.ORDER)
        l = (int(coeff_lin[0]) % npgl.ORDER, int(coeff_lin[1]) % npgl.ORDER)

        def fn(vals):
            av = (vals[0], vals[1])
            bv = (vals[2], vals[3])
            cv = (vals[4], vals[5])

            def em(x, y):
                v0 = npgl.mul(x[0], y[0])
                v1 = npgl.mul(x[1], y[1])
                r0 = npgl.add(v0, npgl.mul_scalar(v1, 7))
                r1 = npgl.sub(npgl.sub(npgl.mul(npgl.add(x[0], x[1]),
                                                npgl.add(y[0], y[1])), v0), v1)
                return (r0, r1)

            def es(x, s):
                return (npgl.add(npgl.mul_scalar(x[0], s[0]),
                                 npgl.mul_scalar(npgl.mul_scalar(x[1], s[1]), 7)),
                        npgl.add(npgl.mul_scalar(x[0], s[1]),
                                 npgl.mul_scalar(x[1], s[0])))

            t = em(es(av, q), bv)
            u = es(cv, l)
            return np.stack([npgl.add(t[0], u[0]), npgl.add(t[1], u[1])])

        cs.set_values_with_dependencies(np.stack(arrs), np.stack([d0, d1]), fn)
        cs.place_general_gate_batch(
            "fma_ext", (q, l), [q[0], q[1], l[0], l[1]],
            np.stack(arrs + [d0, d1], axis=1))
        return d0, d1
