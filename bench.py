"""Driver benchmark: one JSON line on stdout.

Round-1 metric: the flagship LDE workload — the dominant prover kernel
(SURVEY §3.2 flamegraph: NTT/LDE + hashing dominate). We LDE a trace-shaped
monomial batch (2^16 rows x 60 columns -> 8 bitreversed cosets) on one chip
and report Goldilocks element-evaluations per second.

vs_baseline: ratio against an estimated 64-core CPU NTT throughput of
1.0e9 el/s (the reference publishes no absolute numbers — README.md:35 even
notes "FFT is not optimized"; 1e9 el/s assumes ~16M butterflies/s/core x 64
on the radix-2 scalar path, a generous estimate).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import numpy as np

    from boojum_tpu.field import goldilocks as gl
    from boojum_tpu.ntt import ntt

    log_n = 16
    n = 1 << log_n
    cols = 60
    lde = 8

    rng = np.random.default_rng(7)
    vals = rng.integers(0, gl.ORDER, size=(n, cols), dtype=np.uint64)
    mono = gl.from_u64(vals.reshape(-1)).reshape(n, cols)

    # fold the LDE to a tiny checksum on-device so timing can force a real
    # roundtrip (block_until_ready over the axon tunnel is not reliable)
    import jax.numpy as jnp

    def work(m):
        out = ntt.lde_from_monomials(m, log_n, lde)
        # wraparound u32 checksum over EVERY output element: nothing can be
        # dead-code-eliminated, and pulling the scalar forces a full sync
        return jnp.sum(out.lo, dtype=jnp.uint32) + jnp.sum(out.hi, dtype=jnp.uint32)

    fn = jax.jit(work)
    _ = int(fn(mono))  # compile + sync

    iters = 5
    t0 = time.time()
    for _ in range(iters):
        chk = fn(mono)
    _ = int(chk)  # data-dependent sync
    dt = (time.time() - t0) / iters

    elements_per_s = lde * n * cols / dt
    baseline = 1.0e9
    print(json.dumps({
        "metric": "goldilocks_lde_2e16x60_lde8_elements_per_s",
        "value": round(elements_per_s, 1),
        "unit": "goldilocks elements evaluated / s (single chip)",
        "vs_baseline": round(elements_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
