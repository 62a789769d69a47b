"""Standalone named-kernel benchmark runner (reference profiling-target/).

Usage: python scripts/profiling_target.py <kernel> [log_n] [iters]
Kernels: field_mul, batch_inv, ntt, lde, poseidon2, merkle_leaves, native_mul
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    kernel = sys.argv[1] if len(sys.argv) > 1 else "ntt"
    log_n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    import jax
    import jax.numpy as jnp

    from boojum_tpu.field import goldilocks as gl
    from boojum_tpu.ntt import ntt
    from boojum_tpu.utils import npgl

    n = 1 << log_n
    rng = np.random.default_rng(0)
    vals = rng.integers(0, gl.ORDER, size=n, dtype=np.uint64)

    if kernel == "field_mul":
        a = gl.from_u64(vals)
        f = jax.jit(lambda x: gl.mul(x, x))
        f(a).lo.block_until_ready()
        t0 = time.time()
        for _ in range(iters):
            out = f(a)
        out.lo.block_until_ready()
        report("field_mul", n * iters, time.time() - t0)
    elif kernel == "native_mul":
        from boojum_tpu.utils import native
        t0 = time.time()
        for _ in range(iters):
            native.mul(vals, vals)
        report("native_mul", n * iters, time.time() - t0)
    elif kernel == "batch_inv":
        t0 = time.time()
        for _ in range(iters):
            npgl.batch_inv(vals)
        report("batch_inv", n * iters, time.time() - t0)
    elif kernel in ("ntt", "lde"):
        cols = 16
        m = gl.from_u64(rng.integers(0, gl.ORDER, size=(n * cols),
                                     dtype=np.uint64).reshape(n, cols))
        lde = 8 if kernel == "lde" else 1
        if kernel == "ntt":
            f = jax.jit(lambda x: jnp.sum(
                ntt.ntt_cols(x, ntt.get_plan(log_n)).lo, dtype=jnp.uint32))
        else:
            f = jax.jit(lambda x: jnp.sum(
                ntt.lde_from_monomials(x, log_n, lde).lo, dtype=jnp.uint32))
        int(f(m))
        t0 = time.time()
        for _ in range(iters):
            c = f(m)
        int(c)
        report(kernel, n * cols * lde * iters, time.time() - t0)
    elif kernel == "poseidon2":
        from boojum_tpu.hash import poseidon2
        st = gl.from_u64(rng.integers(0, gl.ORDER, size=12 * n,
                                      dtype=np.uint64)).reshape(12, n)
        out = poseidon2.permutation_gl(st)
        out.lo.block_until_ready()
        t0 = time.time()
        for _ in range(iters):
            out = poseidon2.permutation_gl(st)
        out.lo.block_until_ready()
        report("poseidon2 (permutations)", n * iters, time.time() - t0)
    elif kernel == "merkle_leaves":
        from boojum_tpu.hash import sponge
        cols = gl.from_u64(rng.integers(0, gl.ORDER, size=16 * n,
                                        dtype=np.uint64)).reshape(16, n)
        out = sponge.hash_leaves(cols)
        out.lo.block_until_ready()
        t0 = time.time()
        for _ in range(iters):
            out = sponge.hash_leaves(cols)
        out.lo.block_until_ready()
        report("merkle_leaves (leaves)", n * iters, time.time() - t0)
    else:
        raise SystemExit(f"unknown kernel {kernel}")


def report(name, units, dt):
    print(f"{name}: {units / dt / 1e6:.1f} M/s  ({dt:.3f}s total)")


if __name__ == "__main__":
    main()
