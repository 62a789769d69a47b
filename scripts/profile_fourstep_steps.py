"""Cumulative-prefix decomposition of ntt_fourstep_cols at (2^24, 8):
time jitted prefixes of the exact pipeline; differences = per-step cost."""

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
from boojum_tpu.ntt import ntt
from boojum_tpu.ntt.pallas_ntt import _fourstep_twiddles_host


def get1(arr):
    return np.asarray(jax.device_get(arr.reshape(-1)[:1]))


def timed(name, f, lo, hi, base, reps=2):
    j = jax.jit(f)
    o = j(lo, hi, jnp.uint32(0))
    leaves = jax.tree_util.tree_leaves(o)
    get1(leaves[0])
    times = []
    for r in range(reps):
        o = None
        t0 = time.perf_counter()
        o = j(lo, hi, jnp.uint32(r + 1))
        leaves = jax.tree_util.tree_leaves(o)
        get1(leaves[0])
        times.append(time.perf_counter() - t0)
    t = min(times) - base
    print(f"{name:<40s} {t*1e3:9.2f} ms", flush=True)
    return t


def main():
    print("backend:", jax.default_backend(), flush=True)
    x0 = jnp.asarray(np.arange(8, dtype=np.uint32))
    get1(x0)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        get1(x0)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    base = ts[len(ts) // 2]
    print(f"baseline get: {base*1e3:.2f} ms", flush=True)

    rng = np.random.default_rng(5)
    log_n, b = 24, 8
    n = 1 << log_n
    n1, n2 = 256, n // 256
    lo = jnp.asarray(rng.integers(0, 1 << 32, (n, b)).astype(np.uint32))
    hi = jnp.asarray(rng.integers(0, 0xFFFF0000, (n, b)).astype(np.uint32))
    get1(lo)
    tw_lo, tw_hi = _fourstep_twiddles_host(8, 16)

    def xv_build(l, h, r):
        x3 = GL((l + r).reshape(n1, n2, b), h.reshape(n1, n2, b))
        return (jnp.swapaxes(x3.lo, 1, 2).reshape(n1, b * n2),
                jnp.swapaxes(x3.hi, 1, 2).reshape(n1, b * n2))

    def pass1(l, h, r):
        xl, xh = xv_build(l, h, r)
        s1 = ntt._pass_ntt(GL(xl, xh), 8)
        return s1.astuple()

    def pass1_tw(l, h, r):
        xl, xh = xv_build(l, h, r)
        s1 = ntt._pass_tw_fwd(GL(xl, xh), 8, tw_lo, tw_hi)
        return s1.astuple()

    def to_s1t(l, h, r):
        s1 = GL(*pass1_tw(l, h, r))
        return (jnp.transpose(s1.lo.reshape(n1, b, n2), (2, 1, 0))
                .reshape(n2, b * n1),
                jnp.transpose(s1.hi.reshape(n1, b, n2), (2, 1, 0))
                .reshape(n2, b * n1))

    def with_pass2(l, h, r):
        s1t = GL(*to_s1t(l, h, r))
        return ntt._pass_ntt(s1t, 16).astuple()

    def full(l, h, r):
        return ntt.ntt_fourstep_cols(GL(l + r, h)).astuple()

    timed("xv build (swap12 + reshape)", xv_build, lo, hi, base)
    timed("+ pass1 (no tw)", pass1, lo, hi, base)
    timed("+ pass1 fused tw", pass1_tw, lo, hi, base)
    timed("+ s1t transpose(2,1,0)", to_s1t, lo, hi, base)
    timed("+ pass2 (recursion log16 b=2048)", with_pass2, lo, hi, base)
    timed("FULL fourstep", full, lo, hi, base)

    # recursion alone at its real shape
    del lo, hi
    lo2 = jnp.asarray(rng.integers(0, 1 << 32, (1 << 16, 2048))
                      .astype(np.uint32))
    hi2 = jnp.asarray(rng.integers(0, 0xFFFF0000, (1 << 16, 2048))
                      .astype(np.uint32))
    get1(lo2)
    tw2 = _fourstep_twiddles_host(8, 8)

    def r_xv(l, h, r):
        x3 = GL((l + r).reshape(256, 256, 2048), h.reshape(256, 256, 2048))
        return (jnp.swapaxes(x3.lo, 1, 2).reshape(256, 2048 * 256),
                jnp.swapaxes(x3.hi, 1, 2).reshape(256, 2048 * 256))

    def r_pass1tw(l, h, r):
        xl, xh = r_xv(l, h, r)
        return ntt._pass_tw_fwd(GL(xl, xh), 8, tw2[0], tw2[1]).astuple()

    def r_full(l, h, r):
        return ntt.ntt_fourstep_cols(GL(l + r, h)).astuple()

    timed("rec: xv build", r_xv, lo2, hi2, base)
    timed("rec: + pass1 fused tw", r_pass1tw, lo2, hi2, base)
    timed("rec: FULL fourstep 2^16 b=2048", r_full, lo2, hi2, base)


if __name__ == "__main__":
    main()
