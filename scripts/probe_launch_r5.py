"""Confirm the per-kernel-launch-overhead theory: 173 sequential 1-D ext
ops (the DEEP structure) vs one batched 2-D formulation of the same math."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import boojum_tpu
boojum_tpu.enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from boojum_tpu.field import goldilocks as gl
from boojum_tpu.field.goldilocks import GL
from boojum_tpu.field import extension as ext2
from boojum_tpu.field.extension import GL2


def get1(arr):
    return np.asarray(jax.device_get(arr.reshape(-1)[:1]))


def bench(name, j, *args, reps=5):
    o = j(*args)
    leaves = jax.tree_util.tree_leaves(o)
    get1(leaves[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = j(*args)
        leaves = jax.tree_util.tree_leaves(o)
        get1(leaves[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{name:<44s} {(ts[len(ts)//2]-BASE)*1e3:9.2f} ms", flush=True)


def main():
    global BASE
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(np.arange(8, dtype=np.uint32))
    get1(x0)
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        get1(x0)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    BASE = ts[len(ts) // 2]
    print(f"baseline get: {BASE*1e3:.2f} ms", flush=True)

    C, F = 176, 1 << 19
    src_lo = jnp.asarray(rng.integers(0, 1 << 32, (C, F)).astype(np.uint32))
    src_hi = jnp.asarray(rng.integers(0, 0xFFFF0000, (C, F)).astype(np.uint32))
    lam = jnp.asarray(rng.integers(0, 1 << 31, (C, 2, 2)).astype(np.uint32))
    get1(src_lo)

    def seq(sl, sh, lams, r):
        acc = GL2(GL(jnp.zeros((F,), jnp.uint32) + r,
                     jnp.zeros((F,), jnp.uint32)),
                  GL(jnp.zeros((F,), jnp.uint32),
                     jnp.zeros((F,), jnp.uint32)))
        for c in range(C):
            s = GL2(GL(sl[c], sh[c]), GL(jnp.zeros((F,), jnp.uint32),
                                         jnp.zeros((F,), jnp.uint32)))
            l = GL2(GL(jnp.broadcast_to(lams[c, 0, 0], (F,)),
                       jnp.broadcast_to(lams[c, 0, 1], (F,))),
                    GL(jnp.broadcast_to(lams[c, 1, 0], (F,)),
                       jnp.broadcast_to(lams[c, 1, 1], (F,))))
            acc = ext2.add(acc, ext2.mul(s, l))
        return acc.c0.lo, acc.c0.hi, acc.c1.lo, acc.c1.hi

    def batched(sl, sh, lams, r):
        s = GL2(GL(sl + r, sh), GL(jnp.zeros((C, F), jnp.uint32),
                                   jnp.zeros((C, F), jnp.uint32)))
        l = GL2(GL(jnp.broadcast_to(lams[:, 0, 0][:, None], (C, F)),
                   jnp.broadcast_to(lams[:, 0, 1][:, None], (C, F))),
                GL(jnp.broadcast_to(lams[:, 1, 0][:, None], (C, F)),
                   jnp.broadcast_to(lams[:, 1, 1][:, None], (C, F))))
        p = ext2.mul(s, l)
        # log-tree sum over axis 0
        from boojum_tpu.prover.device import _sum_gl
        return (_sum_gl(p.c0, 0).lo, _sum_gl(p.c0, 0).hi,
                _sum_gl(p.c1, 0).lo, _sum_gl(p.c1, 0).hi)

    bench("seq: 176 x (2^19,) ext mul-add chain", jax.jit(seq),
          src_lo, src_hi, lam, jnp.uint32(1))
    bench("batched: (176, 2^19) ext mul + tree sum", jax.jit(batched),
          src_lo, src_hi, lam, jnp.uint32(1))

    # chunked middle ground
    def chunked(sl, sh, lams, r, chunk=16):
        acc = None
        for st in range(0, C, chunk):
            s = GL2(GL(sl[st:st + chunk] + r, sh[st:st + chunk]),
                    GL(jnp.zeros((chunk, F), jnp.uint32),
                       jnp.zeros((chunk, F), jnp.uint32)))
            l = GL2(GL(jnp.broadcast_to(lams[st:st + chunk, 0, 0][:, None],
                                        (chunk, F)),
                       jnp.broadcast_to(lams[st:st + chunk, 0, 1][:, None],
                                        (chunk, F))),
                    GL(jnp.broadcast_to(lams[st:st + chunk, 1, 0][:, None],
                                        (chunk, F)),
                       jnp.broadcast_to(lams[st:st + chunk, 1, 1][:, None],
                                        (chunk, F))))
            p = ext2.mul(s, l)
            from boojum_tpu.prover.device import _sum_gl
            ps = GL2(_sum_gl(p.c0, 0), _sum_gl(p.c1, 0))
            acc = ps if acc is None else ext2.add(acc, ps)
        return acc.c0.lo, acc.c0.hi, acc.c1.lo, acc.c1.hi

    bench("chunked 16: 11 x (16, 2^19) batches", jax.jit(chunked),
          src_lo, src_hi, lam, jnp.uint32(1))


if __name__ == "__main__":
    main()
