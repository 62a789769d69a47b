"""Round-5 probes: (a) VPU rate vs array shape (1-D vs 2-D vs bad 3-D),
(b) per-dispatch overhead of cached jit calls, (c) eager op cost,
(d) f32 MXU matmul marginal rate at kernel shapes (long chain)."""

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


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(np.arange(8, dtype=np.uint32))
    get1(x0)
    t0 = time.perf_counter()
    for _ in range(8):
        get1(x0)
    base = (time.perf_counter() - t0) / 8
    print(f"baseline get: {base*1e3:.2f} ms", flush=True)

    n = 1 << 22

    def bench_mul(shape, label, k=64):
        lo = jnp.asarray(rng.integers(0, 1 << 32, shape).astype(np.uint32))
        hi = jnp.asarray(rng.integers(0, 0xFFFF0000, shape).astype(np.uint32))

        def f(l, h, r):
            x = GL(l + r, h)
            for _ in range(k):
                x = gl.mul(x, x)
            return x.lo, x.hi

        j = jax.jit(f)
        o = j(lo, hi, jnp.uint32(0))
        get1(o[0])
        times = []
        for rep in range(3):
            t0 = time.perf_counter()
            o = j(lo, hi, jnp.uint32(rep + 1))
            get1(o[0])
            times.append(time.perf_counter() - t0)
        dt = min(times) - base
        tot = np.prod(shape) * k
        print(f"gl.mul x{k} {label:<18s} {dt*1e3:8.2f} ms  "
              f"{tot/dt/1e9:8.2f} G glmul/s", flush=True)

    bench_mul((n,), "(2^22,) 1-D")
    bench_mul((n // 2048, 2048), "(2^11, 2^11) 2-D")
    bench_mul((n // 8, 8), "(2^19, 8) 2-D")
    bench_mul((256, n // 2048, 8), "(256, 2^11, 8) 3-D")
    bench_mul((64, 64, 1024), "(64, 64, 1024) 3-D")

    # data movement patterns at fourstep scale (2^24 x 8 = 2^27 u32)
    big = jnp.asarray(rng.integers(0, 1 << 32, (256, 1 << 16, 8))
                      .astype(np.uint32))
    get1(big)

    def bench_move(label, fn, x=big, reps=3):
        j = jax.jit(lambda a, r: fn(a + r))
        o = j(x, jnp.uint32(0))
        get1(o)
        times = []
        for rep in range(reps):
            t0 = time.perf_counter()
            o = j(x, jnp.uint32(rep + 1))
            get1(o)
            times.append(time.perf_counter() - t0)
        print(f"move {label:<32s} {(min(times)-base)*1e3:9.2f} ms", flush=True)

    bench_move("swapaxes(0,1) (256,2^16,8)", lambda a: jnp.swapaxes(a, 0, 1))
    bench_move("swapaxes(1,2) (256,2^16,8)", lambda a: jnp.swapaxes(a, 1, 2))
    bench_move("transpose(2,1,0)", lambda a: jnp.transpose(a, (2, 1, 0)))
    bench_move("transpose(1,2,0)", lambda a: jnp.transpose(a, (1, 2, 0)))
    bench_move("transpose(2,0,1)", lambda a: jnp.transpose(a, (2, 0, 1)))
    flat2 = big.reshape(1 << 24, 8)
    bench_move("2-D T (2^24,8)->(8,2^24)", lambda a: a.T, flat2)
    sq = big.reshape(1 << 16, 2048)
    bench_move("2-D T (2^16,2048)", lambda a: a.T, sq)
    tw = jnp.asarray(rng.integers(0, 1 << 32, (256, 1 << 16))
                     .astype(np.uint32))
    bench_move("tile (256,2^16) x8 lanes", lambda a: jnp.tile(a, (1, 8)), tw)
    bench_move("repeat (256,2^16) x8 lanes",
               lambda a: jnp.repeat(a, 8, axis=1), tw)

    # 3-D gl.mul with WIDE trailing dim (the b>=128 fourstep path)
    wlo = jnp.asarray(rng.integers(0, 1 << 32, (256, 256, 2048))
                      .astype(np.uint32))
    whi = jnp.asarray(rng.integers(0, 0xFFFF0000, (256, 256, 2048))
                      .astype(np.uint32))
    tl = jnp.asarray(rng.integers(0, 1 << 32, (256, 256)).astype(np.uint32))
    th = jnp.asarray(rng.integers(0, 1 << 16, (256, 256)).astype(np.uint32))
    j3 = jax.jit(lambda al, ah, r: gl.mul(
        GL(al + r, ah), GL(tl[:, :, None], th[:, :, None])).astuple())
    o = j3(wlo, whi, jnp.uint32(0)); get1(o[0])
    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        o = j3(wlo, whi, jnp.uint32(rep + 1))
        get1(o[0])
        times.append(time.perf_counter() - t0)
    print(f"gl.mul 3-D (256,256,2048) x bcast(256,256,1): "
          f"{(min(times)-base)*1e3:9.2f} ms", flush=True)

    # dispatch overhead: K chained tiny cached-jit calls
    small = jnp.asarray(rng.integers(0, 1 << 31, (256,)).astype(np.uint32))
    tiny = jax.jit(lambda x: x + jnp.uint32(1))
    o = tiny(small); get1(o)
    for K in (1, 16, 64):
        o = small
        t0 = time.perf_counter()
        for _ in range(K):
            o = tiny(o)
        get1(o)
        dt = time.perf_counter() - t0 - base
        print(f"chained tiny jit x{K:<3d}: {dt*1e3:8.2f} ms "
              f"({dt/K*1e3:.2f} ms/dispatch)", flush=True)

    # eager op cost
    o = small + jnp.uint32(1); get1(o)
    for K in (1, 16):
        o = small
        t0 = time.perf_counter()
        for _ in range(K):
            o = o + jnp.uint32(1)
        get1(o)
        dt = time.perf_counter() - t0 - base
        print(f"chained EAGER add x{K:<3d}: {dt*1e3:8.2f} ms "
              f"({dt/K*1e3:.2f} ms/op)", flush=True)

    # f32 matmul marginal at kernel shape, long chain for reliable signal
    w = jnp.asarray(rng.integers(0, 255, (2048, 256)).astype(np.float32))
    xs = jnp.asarray(rng.integers(0, 255, (256, 2048)).astype(np.float32))

    def mm_chain(k):
        def f(w_, x_, r):
            acc = jnp.zeros((2048, 2048), jnp.float32)
            cur = x_ + r
            for i in range(k):
                p = jax.lax.dot_general(
                    w_, cur, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + p
                cur = acc[:256]  # feed dependency forward
            return acc
        return jax.jit(f)

    f64_, f256_ = mm_chain(64), mm_chain(256)
    o = f64_(w, xs, jnp.float32(0)); get1(o)
    t0 = time.perf_counter(); o = f64_(w, xs, jnp.float32(1)); get1(o)
    d64 = time.perf_counter() - t0 - base
    o = f256_(w, xs, jnp.float32(0)); get1(o)
    t0 = time.perf_counter(); o = f256_(w, xs, jnp.float32(1)); get1(o)
    d256 = time.perf_counter() - t0 - base
    macs = 2048 * 256 * 2048
    print(f"f32 matmul marginal: {192*macs/(d256-d64)/1e12:.1f} T MAC/s "
          f"(x64 {d64*1e3:.1f} ms, x256 {d256*1e3:.1f} ms)", flush=True)

    # poseidon2 pallas perm rate at FIXED_BATCH
    from boojum_tpu.hash.pallas_poseidon2 import _perm_pallas_jit
    bp = (1 << 16) // 8
    slo = jnp.asarray(rng.integers(0, 1 << 32, (96, bp)).astype(np.uint32))
    shi = jnp.asarray(rng.integers(0, 0xFFFF0000, (96, bp)).astype(np.uint32))
    pj = _perm_pallas_jit(bp, False)

    def perm_chain(k):
        def f(l, h, r):
            l = l + r
            for _ in range(k):
                l, h = pj(l, h)
            return l, h
        return jax.jit(f)

    p1, p9 = perm_chain(1), perm_chain(9)
    o = p1(slo, shi, jnp.uint32(0)); get1(o[0])
    t0 = time.perf_counter(); o = p1(slo, shi, jnp.uint32(1)); get1(o[0])
    d1 = time.perf_counter() - t0 - base
    o = p9(slo, shi, jnp.uint32(0)); get1(o[0])
    t0 = time.perf_counter(); o = p9(slo, shi, jnp.uint32(1)); get1(o[0])
    d9 = time.perf_counter() - t0 - base
    marg = (d9 - d1) / 8
    print(f"poseidon2 pallas 2^16 states: marginal {marg*1e3:.2f} ms "
          f"= {(1 << 16)/marg/1e6:.1f} M perm/s", flush=True)


if __name__ == "__main__":
    main()
