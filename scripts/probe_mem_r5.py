"""Find the size cliff: is the 2^24-scale slowness HBM paging or layout?

Fresh process, minimal live arrays; prints device memory stats as it goes.
"""

import gc
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


def get1(arr):
    return np.asarray(jax.device_get(arr.reshape(-1)[:1]))


def memstat(label):
    try:
        s = jax.devices()[0].memory_stats()
        if s:
            print(f"  [mem {label}] in_use={s.get('bytes_in_use', 0)/2**30:.2f} GiB "
                  f"limit={s.get('bytes_limit', 0)/2**30:.2f} GiB "
                  f"peak={s.get('peak_bytes_in_use', 0)/2**30:.2f} GiB",
                  flush=True)
        else:
            print(f"  [mem {label}] no stats", flush=True)
    except Exception as e:
        print(f"  [mem {label}] unavailable: {e}", flush=True)


def base_get():
    x0 = jnp.asarray(np.arange(8, dtype=np.uint32))
    get1(x0)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        get1(x0)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]  # median


def main():
    print("backend:", jax.default_backend(), flush=True)
    memstat("start")
    base = base_get()
    print(f"baseline get (median of 10): {base*1e3:.2f} ms", flush=True)

    rng = np.random.default_rng(11)

    # 3-D twiddle-style mul at growing middle dim; fresh arrays each size,
    # deleted after
    for log_m in (13, 14, 15, 16):
        m = 1 << log_m
        lo = jnp.asarray(rng.integers(0, 1 << 32, (256, m, 8)).astype(np.uint32))
        hi = jnp.asarray(rng.integers(0, 0xFFFF0000, (256, m, 8)).astype(np.uint32))
        tl = jnp.asarray(rng.integers(0, 1 << 32, (256, m)).astype(np.uint32))
        th = jnp.asarray(rng.integers(0, 1 << 16, (256, m)).astype(np.uint32))
        j3 = jax.jit(lambda al, ah, wl, wh, r: gl.mul(
            GL(al + r, ah), GL(wl[:, :, None], wh[:, :, None])).astuple())
        o = j3(lo, hi, tl, th, jnp.uint32(0)); get1(o[0])
        times = []
        for rep in range(3):
            o = None
            t0 = time.perf_counter()
            o = j3(lo, hi, tl, th, jnp.uint32(rep + 1))
            get1(o[0])
            times.append(time.perf_counter() - t0)
        gb = 256 * m * 8 * 4 / 2**30
        print(f"3-D mul (256, 2^{log_m}, 8): {(min(times)-base)*1e3:9.2f} ms "
              f"({gb:.2f} GiB/limb)", flush=True)
        memstat(f"after 2^{log_m}")
        del lo, hi, tl, th, o, j3
        gc.collect()

    # same total size, 2-D lane-major
    m = 1 << 16
    lo = jnp.asarray(rng.integers(0, 1 << 32, (256, m * 8)).astype(np.uint32))
    hi = jnp.asarray(rng.integers(0, 0xFFFF0000, (256, m * 8)).astype(np.uint32))
    tl = jnp.asarray(rng.integers(0, 1 << 32, (256, m * 8)).astype(np.uint32))
    th = jnp.asarray(rng.integers(0, 1 << 16, (256, m * 8)).astype(np.uint32))
    j2 = jax.jit(lambda al, ah, wl, wh, r: gl.mul(
        GL(al + r, ah), GL(wl, wh)).astuple())
    o = j2(lo, hi, tl, th, jnp.uint32(0)); get1(o[0])
    times = []
    for rep in range(3):
        o = None
        t0 = time.perf_counter()
        o = j2(lo, hi, tl, th, jnp.uint32(rep + 1))
        get1(o[0])
        times.append(time.perf_counter() - t0)
    print(f"2-D mul (256, 2^19) same bytes: {(min(times)-base)*1e3:9.2f} ms",
          flush=True)
    memstat("after 2-D")
    del lo, hi, tl, th, o, j2
    gc.collect()

    # transposes at full scale, fresh arrays
    big = jnp.asarray(rng.integers(0, 1 << 32, (256, m, 8)).astype(np.uint32))
    for name, fn in (
        ("swapaxes(0,1)", lambda a: jnp.swapaxes(a, 0, 1)),
        ("swapaxes(1,2)", lambda a: jnp.swapaxes(a, 1, 2)),
        ("transpose(2,1,0)", lambda a: jnp.transpose(a, (2, 1, 0))),
        ("transpose(1,2,0)", lambda a: jnp.transpose(a, (1, 2, 0))),
        ("transpose(2,0,1)", lambda a: jnp.transpose(a, (2, 0, 1))),
    ):
        j = jax.jit(lambda a, r, fn=fn: fn(a + r))
        o = j(big, jnp.uint32(0)); get1(o)
        times = []
        for rep in range(3):
            o = None
            t0 = time.perf_counter()
            o = j(big, jnp.uint32(rep + 1))
            get1(o)
            times.append(time.perf_counter() - t0)
        print(f"move {name:<18s} (256,2^16,8): {(min(times)-base)*1e3:9.2f} ms",
              flush=True)
        del o, j
        gc.collect()
    memstat("end")


if __name__ == "__main__":
    main()
