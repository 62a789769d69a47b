"""Trace a full flagship prove under the JAX profiler (reference analogue:
profiling-target/ + flamegraph.svg workflow, SURVEY §5 tracing/profiling).

Usage:
    python scripts/profile_prove.py [outdir] [--bytes N] [--trace-len LOG2]

Writes a TensorBoard/XProf trace to <outdir> (default /tmp/boojum_trace):
every jitted program on the device timeline plus host Python regions, the
XLA:TPU equivalent of the reference's `perf`+flamegraph recipe. View with
`tensorboard --logdir <outdir>` (the profile plugin shows trace_viewer and
op_profile), or pass the .pb to xprof directly.

Per-stage wall-clock attribution without TensorBoard: the prove itself is
run with verbose=True, which prints the synced per-stage split to stderr
(DeviceProver._stage / _sync).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    outdir = "/tmp/boojum_trace"
    nbytes = 8192
    log_trace = 17
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--bytes":
            nbytes = int(args.pop(0))
        elif a == "--trace-len":
            log_trace = int(args.pop(0))
        else:
            outdir = a

    import jax
    import numpy as np

    import boojum_tpu
    boojum_tpu.enable_persistent_compilation_cache()

    from tests.test_sha256 import build_sha256_circuit
    from boojum_tpu.cs.setup import create_base_setup
    from boojum_tpu.prover import ProofConfig
    from boojum_tpu.prover.device_prover import (DeviceProver,
                                                 create_device_setup)
    from boojum_tpu.verifier import verify

    data = bytes(np.random.default_rng(42).integers(0, 256, nbytes,
                                                    dtype=np.uint8))
    print(f"backend={jax.default_backend()} bytes={nbytes} "
          f"trace=2^{log_trace} outdir={outdir}", flush=True)

    t0 = time.time()
    cs, _ = build_sha256_circuit(data, max_trace_len=1 << log_trace)
    cs.pad_and_shrink()
    print(f"synthesis {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    sb = create_base_setup(cs)
    cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=16,
                      security_level=100, pow_bits=0)
    art = create_device_setup(cs, sb, cfg, "poseidon2")
    dp = DeviceProver(cs, art, cfg)
    print(f"setup {time.time() - t0:.1f}s", flush=True)

    # warm-up: compile everything outside the trace window
    t0 = time.time()
    dp.prove("poseidon", "poseidon2")
    print(f"cold prove {time.time() - t0:.1f}s", flush=True)

    with jax.profiler.trace(outdir):
        t0 = time.time()
        proof = dp.prove("poseidon", "poseidon2", verbose=True)
        warm = time.time() - t0
    print(f"warm prove (traced) {warm:.2f}s", flush=True)

    assert verify(art.vk, proof, "poseidon", "poseidon2")
    print(f"verified ok; trace in {outdir} "
          f"(tensorboard --logdir {outdir})", flush=True)


if __name__ == "__main__":
    main()
