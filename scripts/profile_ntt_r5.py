"""Round-5 NTT component profile: where do the 71.6 ms of a 2^24 transform go?

Times each component of the MXU four-step independently with the
drained-dispatch harness (device_get barrier), plus microbenches for the
candidate kernel improvements (int8 MXU path, big-matmul variants).
"""

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
from boojum_tpu.ntt import mxu_ntt


def get1(arr):
    return np.asarray(jax.device_get(arr[..., :1]))


def timeit(name, f, *args, reps=3):
    o = f(*args)
    leaves = jax.tree_util.tree_leaves(o)
    get1(leaves[0])  # compile + drain
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = f(*args)
        leaves = jax.tree_util.tree_leaves(o)
        get1(leaves[0])
        times.append(time.perf_counter() - t0)
    best = min(times) - BASE
    print(f"{name:<44s} {best*1e3:9.2f} ms", flush=True)
    return best


def main():
    global BASE
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(np.arange(8, dtype=np.uint32))
    get1(x0)
    t0 = time.perf_counter()
    for _ in range(8):
        get1(x0)
    BASE = (time.perf_counter() - t0) / 8
    print(f"baseline get: {BASE*1e3:.2f} ms", flush=True)

    log_n = 24
    n = 1 << log_n
    b = 8
    lo = jnp.asarray(rng.integers(0, 1 << 32, (n, b)).astype(np.uint32))
    hi = jnp.asarray(rng.integers(0, 0xFFFF0000, (n, b)).astype(np.uint32))
    get1(lo)

    # 1. full four-step 2^24 x8
    f_full = jax.jit(lambda l, h, r: ntt.ntt_fourstep_cols(GL(l + r, h)).astuple())
    t = timeit("full fourstep 2^24 b=8", f_full, lo, hi, jnp.uint32(1))
    print(f"  = {t/b*1e3:.2f} ms/transform", flush=True)

    # 2. one radix-256 pallas pass over the full data (256, 2^19)
    lov = lo.reshape(256, (n // 256) * b)
    hiv = hi.reshape(256, (n // 256) * b)
    f_pass = jax.jit(lambda l, h, r: mxu_ntt.ntt_cols_matmul(
        GL(l + r, h)).astuple())
    t = timeit("one radix-256 pass (256, 2^19)", f_pass, lov, hiv, jnp.uint32(1))
    print(f"  (3 passes would be {3*t*1e3:.2f} ms)", flush=True)

    # 3. transpose (n1, n2, b) -> (n2, n1*b) on both limbs
    n1, n2 = 256, n // 256
    l3 = lo.reshape(n1, n2, b)
    h3 = hi.reshape(n1, n2, b)
    f_tr = jax.jit(lambda l, h, r: (
        jnp.swapaxes(l + r, 0, 1).reshape(n2, n1 * b),
        jnp.swapaxes(h, 0, 1).reshape(n2, n1 * b)))
    timeit("transpose (256, 2^16, 8) both limbs", f_tr, l3, h3, jnp.uint32(1))

    # 4. cross twiddle mul
    from boojum_tpu.ntt.pallas_ntt import _fourstep_twiddles_host
    tw_lo, tw_hi = _fourstep_twiddles_host(8, 16)
    twl = jnp.asarray(tw_lo)[:, :, None]
    twh = jnp.asarray(tw_hi)[:, :, None]
    f_tw = jax.jit(lambda l, h, r: gl.mul(GL(l + r, h), GL(twl, twh)).astuple())
    timeit("cross-twiddle gl.mul (256, 2^16, 8)", f_tw, l3, h3, jnp.uint32(1))

    # 5. single-column 2^24 (the layout-cliff case)
    lo1 = lo[:, :1]
    hi1 = hi[:, :1]
    f_one = jax.jit(lambda l, h, r: ntt.ntt_fourstep_cols(GL(l + r, h)).astuple())
    timeit("full fourstep 2^24 b=1", f_one, lo1, hi1, jnp.uint32(1))

    # 6. raw matmul rate probes at kernel shapes, via jnp (XLA) not pallas
    wf = jnp.asarray(np.asarray(
        mxu_ntt._w_digit_stack_f32(8, False)))  # (2048, 256)
    xs = jnp.asarray(rng.integers(0, 255, (256, 2048)).astype(np.float32))

    def mm_chain_f32(k):
        def f(w, x, r):
            acc = None
            for i in range(k):
                p = jax.lax.dot_general(
                    w, x + r, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = p if acc is None else acc + p
            return acc
        return jax.jit(f)

    t1 = timeit("f32 matmul (2048,256)@(256,2048) x4", mm_chain_f32(4), wf, xs,
                jnp.float32(1))
    t2 = timeit("f32 matmul (2048,256)@(256,2048) x20", mm_chain_f32(20), wf, xs,
                jnp.float32(1))
    macs = 2048 * 256 * 2048
    print(f"  marginal f32: {16*macs/(t2-t1)/1e12:.1f} T MAC/s", flush=True)

    # int8 probe
    wi8 = jnp.asarray(rng.integers(-127, 127, (2048, 2048)).astype(np.int8))
    xi8 = jnp.asarray(rng.integers(-127, 127, (2048, 256)).astype(np.int8))

    def mm_chain_i8(k):
        def f(w, x, r):
            acc = None
            for i in range(k):
                p = jax.lax.dot_general(
                    w, x + r, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = p if acc is None else acc + p
            return acc
        return jax.jit(f)

    try:
        t1 = timeit("int8 matmul (2048,2048)@(2048,256) x4", mm_chain_i8(4),
                    wi8, xi8, jnp.int8(1))
        t2 = timeit("int8 matmul (2048,2048)@(2048,256) x20", mm_chain_i8(20),
                    wi8, xi8, jnp.int8(1))
        macs = 2048 * 2048 * 256
        print(f"  marginal int8: {16*macs/(t2-t1)/1e12:.1f} T MAC/s", flush=True)
    except Exception as e:
        print(f"int8 matmul failed: {e}", flush=True)

    # bf16 probe
    wb = wf.astype(jnp.bfloat16)
    xb = xs.astype(jnp.bfloat16)

    def mm_chain_bf(k):
        def f(w, x, r):
            acc = None
            for i in range(k):
                p = jax.lax.dot_general(
                    w, x + r, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = p if acc is None else acc + p
            return acc
        return jax.jit(f)

    try:
        t1 = timeit("bf16 matmul (2048,256)@(256,2048) x4", mm_chain_bf(4),
                    wb, xb, jnp.bfloat16(1))
        t2 = timeit("bf16 matmul (2048,256)@(256,2048) x20", mm_chain_bf(20),
                    wb, xb, jnp.bfloat16(1))
        macs = 2048 * 256 * 2048
        print(f"  marginal bf16: {16*macs/(t2-t1)/1e12:.1f} T MAC/s", flush=True)
    except Exception as e:
        print(f"bf16 matmul failed: {e}", flush=True)


if __name__ == "__main__":
    main()
