"""Trustworthy device-compute microbench for the axon backend.

block_until_ready is not a reliable completion barrier here; the only hard
barrier is a device_get of data that depends on the work. Every measurement
below is: (submit work) -> device_get(tiny data-dependent slice), minus the
measured baseline get latency.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from boojum_tpu.field import goldilocks as gl
from boojum_tpu.field.goldilocks import GL


def get1(arr):
    return np.asarray(jax.device_get(arr[..., :1]))


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)

    # baseline: get of 4 bytes of an already-computed array
    x = jnp.asarray(np.arange(8, dtype=np.uint32))
    get1(x)
    t0 = time.perf_counter()
    for _ in range(8):
        get1(x)
    base_get = (time.perf_counter() - t0) / 8
    print(f"baseline tiny get: {base_get*1e3:.2f} ms")

    N = 1 << 22
    a_lo = jnp.asarray(rng.integers(0, 1 << 32, N).astype(np.uint32))
    a_hi = jnp.asarray(rng.integers(0, 0xFFFF0000, N).astype(np.uint32))
    get1(a_lo)

    def chain(k):
        def f(lo, hi):
            x = GL(lo, hi)
            for _ in range(k):
                x = gl.mul(x, x)
            return x.lo, x.hi
        return jax.jit(f)

    prev = {}
    for k in (16, 64, 256):
        f = chain(k)
        lo, hi = f(a_lo, a_hi)
        get1(lo)  # warm + drain
        t0 = time.perf_counter()
        lo, hi = f(lo, hi)
        get1(lo)
        dt = time.perf_counter() - t0 - base_get
        print(f"gl.square chain x{k:<4d} 4M lanes: {dt*1e3:9.2f} ms  "
              f"{N*k/dt/1e9:8.2f} G glmul/s")
        prev[k] = dt
    marg = (prev[256] - prev[64]) / 192
    print(f"  marginal: {N/marg/1e9:.1f} G glmul/s")

    # u32 add and mul chains for the raw roofline
    def uchain(op, k):
        def f(x, y):
            for _ in range(k):
                x = op(x, y)
            return x
        return jax.jit(f)

    for name, op in (("u32 add", lambda x, y: x + y),
                     ("u32 mul", lambda x, y: x * y)):
        f64 = uchain(op, 64)
        f256 = uchain(op, 256)
        x = f64(a_lo, a_hi); get1(x)
        t0 = time.perf_counter(); x = f64(x, a_hi); get1(x)
        d64 = time.perf_counter() - t0 - base_get
        t0 = time.perf_counter(); x = f256(x, a_hi); get1(x)
        d256 = time.perf_counter() - t0 - base_get
        marg = (d256 - d64) / 192
        print(f"{name} marginal: {N/marg/1e12:.2f} T op/s   "
              f"(x64 {d64*1e3:.2f} ms, x256 {d256*1e3:.2f} ms)")

    # poseidon2 perm
    from boojum_tpu.hash.poseidon2 import _permutation_stacked
    B = 1 << 19
    st_lo = jnp.asarray(rng.integers(0, 1 << 32, (12, B)).astype(np.uint32))
    st_hi = jnp.asarray(rng.integers(0, 0xFFFF0000, (12, B)).astype(np.uint32))

    def perm_chain(k):
        def f(lo, hi):
            x = GL(lo, hi)
            for _ in range(k):
                x = _permutation_stacked(x)
            return x.lo, x.hi
        return jax.jit(f)

    f1 = perm_chain(1)
    f8 = perm_chain(8)
    lo, hi = f1(st_lo, st_hi); get1(lo)
    t0 = time.perf_counter(); lo, hi = f1(lo, hi); get1(lo)
    d1 = time.perf_counter() - t0 - base_get
    lo, hi = f8(st_lo, st_hi); get1(lo)
    t0 = time.perf_counter(); lo, hi = f8(lo, hi); get1(lo)
    d8 = time.perf_counter() - t0 - base_get
    marg = (d8 - d1) / 7
    print(f"poseidon2 perm 2^19 lanes: x1 {d1*1e3:.2f} ms, x8 {d8*1e3:.2f} ms"
          f"  marginal {marg*1e3:.2f} ms = {B/marg/1e6:.1f} M perm/s")

    # the fused witness tree
    from boojum_tpu.prover.device_merkle import (_full_tree_jit,
                                                 _pad_cols_to_rate)
    m = 1 << 19
    cols = GL(jnp.asarray(rng.integers(0, 1 << 32, (96, m)).astype(np.uint32)),
              jnp.asarray(rng.integers(0, 0xFFFF0000, (96, m)).astype(np.uint32)))
    get1(cols.lo)
    fj = _full_tree_jit(96, m, 16)
    out = fj(cols.lo, cols.hi); get1(out[-2])
    cols = GL(cols.lo + jnp.uint32(1), cols.hi)
    t0 = time.perf_counter()
    out = fj(cols.lo, cols.hi)
    get1(out[-2])
    dt = time.perf_counter() - t0 - base_get
    nperm = (96 // 8) * m + (m - 16)
    print(f"witness tree 96x2^19: {dt*1e3:.2f} ms = {nperm/dt/1e6:.1f} M perm/s"
          f" ({nperm/1e6:.1f} M perms)")


if __name__ == "__main__":
    main()
