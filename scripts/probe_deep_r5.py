"""Time the REAL _deep_jit at flagship shapes with synthetic data, plus
ablations: no entry transposes (pre-transposed inputs), no ext_inverse."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import boojum_tpu
boojum_tpu.enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from boojum_tpu.prover.device_prover import _deep_jit
from boojum_tpu.prover import device
from boojum_tpu.field import goldilocks as gl, extension as ext2
from boojum_tpu.field.goldilocks import GL
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
    print(f"{name:<48s} {(ts[len(ts)//2]-BASE)*1e3:9.2f} ms", flush=True)


def main():
    global BASE
    rng = np.random.default_rng(3)
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

    F = 1 << 19
    kw, ks, kt, kq = 97, 75, 48, 16

    def mk(k):
        return (jnp.asarray(rng.integers(0, 1 << 32, (k, F)).astype(np.uint32)),
                jnp.asarray(rng.integers(0, 0xFFFF0000, (k, F)).astype(np.uint32)))

    w = mk(kw); s = mk(ks); t2 = mk(kt); q = mk(kq)
    x = mk(1)
    x_lo, x_hi = x[0][0], x[1][0]
    get1(w[0])

    # flagship-like layout: group0 = 60 wit + 4+60 setup cols + z/inters +
    # mults + A/B + tables + quotient chunks; group1 = z at zw; group2 = A/B at 0
    g0 = []
    for i in range(60):
        g0.append((0, i, -1))
    for i in range(64):
        g0.append((1, i % ks, -1))
    g0.append((2, 0, 1))
    for i in range(14):
        g0.append((2, 2 + 2 * i, 3 + 2 * i))
    for i in range(8):
        g0.append((0, 61 + i, -1))
        g0.append((2, 30 + i, 31 + i))
    for k in range(8):
        g0.append((3, 2 * k, 2 * k + 1))
    g1 = [(2, 0, 1)]
    g2 = [(2, 30 + 2 * i, 31 + 2 * i) for i in range(4)]
    layout = (tuple(g0), tuple(g1), tuple(g2))
    C = sum(len(g) for g in layout)
    print(f"sources: {C}", flush=True)

    pts = jnp.asarray(rng.integers(0, 1 << 31, (3, 2, 2)).astype(np.uint32))
    lams = jnp.asarray(rng.integers(0, 1 << 31, (C, 2, 2)).astype(np.uint32))
    vals = jnp.asarray(rng.integers(0, 1 << 31, (C, 2, 2)).astype(np.uint32))

    args = (w[0], w[1], s[0], s[1], t2[0], t2[1], q[0], q[1],
            x_lo, x_hi, pts, lams, vals)
    bench("real _deep_jit trans=True", _deep_jit(F, layout, True), *args)
    # ablation: trans=False with pre-transposed (row-major) mats
    wt = (w[0].T, w[1].T); st = (s[0].T, s[1].T)
    tt = (t2[0].T, t2[1].T); qt = (q[0].T, q[1].T)
    get1(wt[0])
    args_rm = (wt[0], wt[1], st[0], st[1], tt[0], tt[1], qt[0], qt[1],
               x_lo, x_hi, pts, lams, vals)
    bench("real _deep_jit trans=False (row-major)", _deep_jit(F, layout, False),
          *args_rm)

    # ablation: inverse cost alone (3 x Fermat over (F,))
    def inv3(al, ah, r):
        acc = GL(al + r, ah)
        outs = []
        for _ in range(3):
            e = GL2(acc, GL(jnp.zeros_like(al), jnp.zeros_like(ah)))
            iv = device.ext_inverse(e)
            outs.append(iv.c0.lo)
            acc = iv.c0
        return tuple(outs)

    bench("3 x ext_inverse (Fermat, 2^19)", jax.jit(inv3),
          w[0][0], w[1][0], jnp.uint32(1))


if __name__ == "__main__":
    main()
