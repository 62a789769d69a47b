"""Small jitted device primitives for the prover stages.

XLA (especially :CPU) compiles wide u32 carry-chain graphs superlinearly
slowly, so the device prover composes MEDIUM-GRAINED jitted ops — each
compiles once per array shape and is reused hundreds of times — instead of
one monolithic stage graph. Scalars ride as (2, 2) u32 arrays so challenge
values never trigger recompiles.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..field import extension as ext2
from ..field import goldilocks as gl
from ..field.extension import GL2
from ..field.goldilocks import GL
from ..utils import npgl


def scalar_ext(c) -> np.ndarray:
    return np.asarray([[c[0] & 0xFFFFFFFF, c[0] >> 32],
                       [c[1] & 0xFFFFFFFF, c[1] >> 32]], np.uint32)


def _b(carr, shape):
    """(2,2) u32 -> GL2 broadcast to shape."""
    return GL2(GL(jnp.broadcast_to(carr[0, 0], shape),
                  jnp.broadcast_to(carr[0, 1], shape)),
               GL(jnp.broadcast_to(carr[1, 0], shape),
                  jnp.broadcast_to(carr[1, 1], shape)))


@jax.jit
def jext_mul(a0l, a0h, a1l, a1h, b0l, b0h, b1l, b1h):
    r = ext2.mul(GL2(GL(a0l, a0h), GL(a1l, a1h)), GL2(GL(b0l, b0h), GL(b1l, b1h)))
    return r.c0.lo, r.c0.hi, r.c1.lo, r.c1.hi


@jax.jit
def jext_add(a0l, a0h, a1l, a1h, b0l, b0h, b1l, b1h):
    r = ext2.add(GL2(GL(a0l, a0h), GL(a1l, a1h)), GL2(GL(b0l, b0h), GL(b1l, b1h)))
    return r.c0.lo, r.c0.hi, r.c1.lo, r.c1.hi


@jax.jit
def jext_sub(a0l, a0h, a1l, a1h, b0l, b0h, b1l, b1h):
    r = ext2.sub(GL2(GL(a0l, a0h), GL(a1l, a1h)), GL2(GL(b0l, b0h), GL(b1l, b1h)))
    return r.c0.lo, r.c0.hi, r.c1.lo, r.c1.hi


@jax.jit
def jext_inv(a0l, a0h, a1l, a1h):
    from . import device
    r = device.ext_inverse(GL2(GL(a0l, a0h), GL(a1l, a1h)))
    return r.c0.lo, r.c0.hi, r.c1.lo, r.c1.hi


@jax.jit
def jaffine(w_lo, w_hi, s_lo, s_hi, beta, gamma):
    """(w + β·s + γ) as ext over base arrays w, s."""
    w = GL(w_lo, w_hi)
    s = GL(s_lo, s_hi)
    shape = w.shape
    bs = _b(beta, shape)
    gs = _b(gamma, shape)
    r = ext2.add(GL2(gl.add(w, gl.mul(s, bs.c0)), gl.mul(s, bs.c1)), gs)
    return r.c0.lo, r.c0.hi, r.c1.lo, r.c1.hi


@jax.jit
def jscale_base(b_lo, b_hi, carr):
    """base array × ext scalar -> ext."""
    b = GL(b_lo, b_hi)
    s = _b(carr, b.shape)
    return (gl.mul(b, s.c0).lo, gl.mul(b, s.c0).hi,
            gl.mul(b, s.c1).lo, gl.mul(b, s.c1).hi)


@jax.jit
def jext_scale(a0l, a0h, a1l, a1h, carr):
    a = GL2(GL(a0l, a0h), GL(a1l, a1h))
    s = _b(carr, a.c0.shape)
    r = ext2.mul(a, s)
    return r.c0.lo, r.c0.hi, r.c1.lo, r.c1.hi


@jax.jit
def jext_mul_base(a0l, a0h, a1l, a1h, b_lo, b_hi):
    b = GL(b_lo, b_hi)
    a = GL2(GL(a0l, a0h), GL(a1l, a1h))
    return (gl.mul(a.c0, b).lo, gl.mul(a.c0, b).hi,
            gl.mul(a.c1, b).lo, gl.mul(a.c1, b).hi)


@jax.jit
def jbase_mul(a_lo, a_hi, b_lo, b_hi):
    r = gl.mul(GL(a_lo, a_hi), GL(b_lo, b_hi))
    return r.lo, r.hi


@jax.jit
def jbase_one_minus(a_lo, a_hi):
    r = gl.sub(gl.ones(()), GL(a_lo, a_hi))
    return r.lo, r.hi


@jax.jit
def jext_sub_one_c0(a0l, a0h, a1l, a1h):
    """(a - 1) on the c0 component."""
    return gl.sub(GL(a0l, a0h), gl.ones(())).lo, \
        gl.sub(GL(a0l, a0h), gl.ones(())).hi, a1l, a1h


@jax.jit
def jgrand_product_exclusive(r0l, r0h, r1l, r1h):
    from . import device
    z = device.grand_product_exclusive(GL2(GL(r0l, r0h), GL(r1l, r1h)))
    return z.c0.lo, z.c0.hi, z.c1.lo, z.c1.hi


# ---------------------------------------------------------------------------
# Ext value convenience wrapper
# ---------------------------------------------------------------------------


class EV:
    """An ext-field device vector as 4 u32 arrays, with operator sugar built
    on the jitted primitives (one compile per shape, reused everywhere)."""

    __slots__ = ("a",)

    def __init__(self, *arrs):
        self.a = tuple(arrs)

    @staticmethod
    def from_base(b_lo, b_hi):
        z = jnp.zeros_like(b_lo)
        return EV(b_lo, b_hi, z, z)

    @staticmethod
    def const(c, shape):
        carr = scalar_ext(c)
        return EV(jnp.broadcast_to(jnp.uint32(carr[0, 0]), shape),
                  jnp.broadcast_to(jnp.uint32(carr[0, 1]), shape),
                  jnp.broadcast_to(jnp.uint32(carr[1, 0]), shape),
                  jnp.broadcast_to(jnp.uint32(carr[1, 1]), shape))

    def __add__(self, o):
        return EV(*jext_add(*self.a, *o.a))

    def __sub__(self, o):
        return EV(*jext_sub(*self.a, *o.a))

    def __mul__(self, o):
        return EV(*jext_mul(*self.a, *o.a))

    def inv(self):
        return EV(*jext_inv(*self.a))

    def scale(self, carr):
        return EV(*jext_scale(*self.a, carr))

    def mul_base(self, b_lo, b_hi):
        return EV(*jext_mul_base(*self.a, b_lo, b_hi))

    def to_host(self):
        c0 = np.asarray(self.a[0], np.uint64) | \
            (np.asarray(self.a[1], np.uint64) << np.uint64(32))
        c1 = np.asarray(self.a[2], np.uint64) | \
            (np.asarray(self.a[3], np.uint64) << np.uint64(32))
        return c0, c1
