"""Quadratic extension F_p[x]/(x^2 - 7) over Goldilocks ("GoldilocksExt2").

Reference behavior: src/field/goldilocks/extension.rs (non-residue 7 at :15)
and the generic ExtensionField at src/field/traits/field.rs:326.

Elements are pairs (c0, c1) of GL tensors: value = c0 + c1·u with u^2 = 7.
Both the vectorized jnp form (GL2) and the exact host scalar form (tuples of
Python ints, ``s2_*``) are provided; the prover uses the former, the
transcript/verifier the latter.
"""

from __future__ import annotations

from typing import NamedTuple

import jax

from . import goldilocks as gl
from .goldilocks import GL, ORDER

NON_RESIDUE = 7


class GL2(NamedTuple):
    c0: GL
    c1: GL

    @property
    def shape(self):
        return self.c0.shape

    def __getitem__(self, idx):  # type: ignore[override]
        return GL2(self.c0[idx], self.c1[idx])

    def reshape(self, *shape):
        return GL2(self.c0.reshape(*shape), self.c1.reshape(*shape))


def zeros(shape) -> GL2:
    return GL2(gl.zeros(shape), gl.zeros(shape))


def ones(shape) -> GL2:
    return GL2(gl.ones(shape), gl.zeros(shape))


def from_base(a: GL) -> GL2:
    return GL2(a, gl.zeros(a.shape))


def from_u64_pair(c0, c1) -> GL2:
    return GL2(gl.from_u64(c0), gl.from_u64(c1))


def to_u64_pair(a: GL2):
    return gl.to_u64(a.c0), gl.to_u64(a.c1)


def add(a: GL2, b: GL2) -> GL2:
    return GL2(gl.add(a.c0, b.c0), gl.add(a.c1, b.c1))


def sub(a: GL2, b: GL2) -> GL2:
    return GL2(gl.sub(a.c0, b.c0), gl.sub(a.c1, b.c1))


def neg(a: GL2) -> GL2:
    return GL2(gl.neg(a.c0), gl.neg(a.c1))


def mul(a: GL2, b: GL2) -> GL2:
    # (a0 + a1 u)(b0 + b1 u) = a0 b0 + 7 a1 b1 + (a0 b1 + a1 b0) u
    v0 = gl.mul(a.c0, b.c0)
    v1 = gl.mul(a.c1, b.c1)
    c0 = gl.add(v0, gl.mul_by_u32(v1, NON_RESIDUE))
    # Karatsuba: a0 b1 + a1 b0 = (a0+a1)(b0+b1) - v0 - v1
    t = gl.mul(gl.add(a.c0, a.c1), gl.add(b.c0, b.c1))
    c1 = gl.sub(gl.sub(t, v0), v1)
    return GL2(c0, c1)


def mul_by_base(a: GL2, b: GL) -> GL2:
    return GL2(gl.mul(a.c0, b), gl.mul(a.c1, b))


def square(a: GL2) -> GL2:
    return mul(a, a)


def pow_const(a: GL2, e: int) -> GL2:
    assert e >= 0
    if e == 0:
        return ones(a.shape)
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    return result


def inverse(a: GL2) -> GL2:
    """1/(c0 + c1 u) = (c0 - c1 u) / (c0^2 - 7 c1^2)."""
    norm = gl.sub(gl.square(a.c0), gl.mul_by_u32(gl.square(a.c1), NON_RESIDUE))
    inv_norm = gl.inverse(norm)
    return GL2(gl.mul(a.c0, inv_norm), gl.neg(gl.mul(a.c1, inv_norm)))


def batch_inverse(a: GL2) -> GL2:
    """Montgomery batch inversion over the flattened extension elements."""
    shape = a.shape
    flat = a.reshape(-1)

    def fwd(carry, x):
        return mul(carry, x), carry

    total, prefix = jax.lax.scan(fwd, ones(()), flat)
    inv_total = inverse(total)

    def bwd(carry, xs):
        x, pfx = xs
        return mul(carry, x), mul(carry, pfx)

    _, inv_flat = jax.lax.scan(bwd, inv_total, (flat, prefix), reverse=True)
    return inv_flat.reshape(shape)


def select(mask, a: GL2, b: GL2) -> GL2:
    return GL2(gl.select(mask, a.c0, b.c0), gl.select(mask, a.c1, b.c1))


def stack(parts, axis=0) -> GL2:
    return GL2(
        gl.stack([p.c0 for p in parts], axis=axis),
        gl.stack([p.c1 for p in parts], axis=axis),
    )


# ----------------------------------------------------------------------------
# Exact host-side scalar extension ops over (int, int) tuples
# ----------------------------------------------------------------------------


def s2_add(a, b):
    return ((a[0] + b[0]) % ORDER, (a[1] + b[1]) % ORDER)


def s2_sub(a, b):
    return ((a[0] - b[0]) % ORDER, (a[1] - b[1]) % ORDER)


def s2_mul(a, b):
    c0 = (a[0] * b[0] + NON_RESIDUE * a[1] * b[1]) % ORDER
    c1 = (a[0] * b[1] + a[1] * b[0]) % ORDER
    return (c0, c1)


def s2_neg(a):
    return ((-a[0]) % ORDER, (-a[1]) % ORDER)


def s2_inv(a):
    norm = (a[0] * a[0] - NON_RESIDUE * a[1] * a[1]) % ORDER
    inv_norm = pow(norm, ORDER - 2, ORDER)
    return ((a[0] * inv_norm) % ORDER, (-a[1] * inv_norm) % ORDER)


def s2_pow(a, e: int):
    result = (1, 0)
    base = a
    while e:
        if e & 1:
            result = s2_mul(result, base)
        e >>= 1
        base = s2_mul(base, base)
    return result
