"""A/B the MXU NTT stage kernels (v1 per-pair carry chains vs v2
slot-accumulate) for correctness and steady-state throughput."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import boojum_tpu
boojum_tpu.enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from boojum_tpu.field.goldilocks import GL
from boojum_tpu.ntt import mxu_ntt


def get1(arr):
    return np.asarray(jax.device_get(arr[..., :1]))


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(np.arange(8, dtype=np.uint32))
    get1(x0)
    t0 = time.perf_counter()
    for _ in range(8):
        get1(x0)
    base = (time.perf_counter() - t0) / 8
    print(f"baseline get: {base*1e3:.2f} ms", flush=True)

    m = 1 << 16
    lo = jnp.asarray(rng.integers(0, 1 << 32, (256, m)).astype(np.uint32))
    hi = jnp.asarray(rng.integers(0, 1 << 32, (256, m)).astype(np.uint32))
    # clamp to < 2^64 arbitrary (lazy input ok); include near-max values
    get1(lo)

    # correctness first, small shape
    s = 1 << 14
    for inverse in (False, True):
        o1 = mxu_ntt._stage_pallas_jit(8, s, inverse, False, 1)(
            lo[:, :s], hi[:, :s])
        o2 = mxu_ntt._stage_pallas_jit(8, s, inverse, False, 2)(
            lo[:, :s], hi[:, :s])
        a1 = np.asarray(jax.device_get(o1))
        a2 = np.asarray(jax.device_get(o2))
        ok = np.array_equal(a1, a2)
        print(f"correctness inverse={inverse}: {'OK' if ok else 'MISMATCH'}",
              flush=True)
        if not ok:
            bad = np.nonzero(a1[0] != a2[0])
            print("first diffs:", bad[0][:5], bad[1][:5], flush=True)
            print("v1:", a1[0][bad][:5], "v2:", a2[0][bad][:5], flush=True)

    # fused-twiddle kernel vs separate tile-mul (correctness)
    from boojum_tpu.field import goldilocks as gl
    n2 = 1 << 10
    twl = jnp.asarray(rng.integers(0, 1 << 32, (256, n2)).astype(np.uint32))
    twh = jnp.asarray(rng.integers(0, 1 << 16, (256, n2)).astype(np.uint32))
    reps = s // n2
    tw_full = GL(jnp.tile(twl, (1, reps)), jnp.tile(twh, (1, reps)))
    xs = GL(lo[:, :s], hi[:, :s])
    ref_post = gl.mul(mxu_ntt.ntt_cols_matmul(xs), tw_full)
    got_post = mxu_ntt.ntt_cols_matmul(xs, tw=(twl, twh))
    ok = np.array_equal(np.asarray(jax.device_get(ref_post.astuple())),
                        np.asarray(jax.device_get(got_post.astuple())))
    print(f"fused post-twiddle: {'OK' if ok else 'MISMATCH'}", flush=True)
    ref_pre = mxu_ntt.ntt_cols_matmul(gl.mul(xs, tw_full), inverse=True)
    got_pre = mxu_ntt.ntt_cols_matmul(xs, inverse=True, tw=(twl, twh),
                                      tw_pre=True)
    ok = np.array_equal(np.asarray(jax.device_get(ref_pre.astuple())),
                        np.asarray(jax.device_get(got_pre.astuple())))
    print(f"fused pre-twiddle:  {'OK' if ok else 'MISMATCH'}", flush=True)

    # full four-step timing at 2^24 x8 (fresh arrays, minimal live set)
    from boojum_tpu.ntt import ntt as nttmod
    del tw_full, ref_post, got_post, ref_pre, got_pre, xs
    n24 = 1 << 24
    lo24 = jnp.asarray(rng.integers(0, 1 << 32, (n24, 8)).astype(np.uint32))
    hi24 = jnp.asarray(rng.integers(0, 0xFFFF0000, (n24, 8)).astype(np.uint32))
    get1(lo24)
    ff = jax.jit(lambda l, h, r: nttmod.ntt_fourstep_cols(
        GL(l + r, h)).astuple())
    o = ff(lo24, hi24, jnp.uint32(0))
    get1(o[0])
    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        o = ff(lo24, hi24, jnp.uint32(rep + 1))
        get1(o[0])
        times.append(time.perf_counter() - t0)
    t = min(times) - base
    print(f"full fourstep 2^24 b=8: {t*1e3:.1f} ms = {t/8*1e3:.2f} ms/transform",
          flush=True)
    del o, lo24, hi24

    # throughput: k chained applications in one jit
    K = 8
    for ver in (1, 2):
        stage = mxu_ntt._stage_pallas_jit(8, m, False, False, ver)

        def chain(l, h, r):
            l = l + r
            for _ in range(K):
                l, h = stage(l, h)
            return l, h

        f = jax.jit(chain)
        o = f(lo, hi, jnp.uint32(0))
        get1(o[0])
        times = []
        for rep in range(3):
            t0 = time.perf_counter()
            o = f(lo, hi, jnp.uint32(rep + 1))
            get1(o[0])
            times.append(time.perf_counter() - t0 - base)
        per_pass = min(times) / K
        elems = 256 * m
        print(f"v{ver}: {per_pass*1e3:8.2f} ms/pass over (256, 2^16) "
              f"({elems/per_pass/1e9:.2f} Gelem/s; full 2^24x8-equiv pass "
              f"{per_pass*8*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
