"""Find the effective device-memory budget of the tunnel chip: allocate
512 MiB device buffers one at a time, after each re-touch the FIRST buffer
with a tiny jit op and time it. When the pool oversubscribes, the re-touch
time jumps (paging)."""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import boojum_tpu
boojum_tpu.enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def get1(arr):
    return np.asarray(jax.device_get(arr.reshape(-1)[:1]))


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

    chunk = (1 << 27,)  # 512 MiB of u32
    touch = jax.jit(lambda a, r: a + r)
    bufs = []
    try:
        for i in range(40):
            b = jnp.zeros(chunk, jnp.uint32) + jnp.uint32(i)
            get1(b)
            bufs.append(b)
            t0 = time.perf_counter()
            o = touch(bufs[0], jnp.uint32(i))
            get1(o)
            dt = time.perf_counter() - t0 - base
            print(f"{(i+1)*0.5:5.1f} GiB allocated: retouch buf0 "
                  f"{dt*1e3:9.2f} ms", flush=True)
            del o
            if dt > 3.0:
                print("paging detected; stopping", flush=True)
                break
    except Exception as e:
        print(f"allocation failed at {len(bufs)*0.5:.1f} GiB: "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
