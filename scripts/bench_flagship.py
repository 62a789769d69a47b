"""Flagship benchmark: the 8 kB SHA-256 proof end-to-end (BASELINE config[0])
on whatever backend JAX selects (real TPU under the driver).

Prints one JSON line with the warm prove wall-clock. Run explicitly:
    python scripts/bench_flagship.py [n_bytes]
(bench.py keeps the fast LDE metric as the default driver benchmark.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(n_bytes=8192):
    import numpy as np

    import boojum_tpu
    boojum_tpu.enable_persistent_compilation_cache()

    from tests.test_sha256 import build_sha256_circuit
    from boojum_tpu.cs.setup import create_base_setup
    from boojum_tpu.prover import ProofConfig
    from boojum_tpu.prover.device_prover import DeviceProver, create_device_setup
    from boojum_tpu.verifier import verify

    data = bytes(np.random.default_rng(42).integers(0, 256, n_bytes,
                                                    dtype=np.uint8))
    t0 = time.time()
    cs, out = build_sha256_circuit(data, max_trace_len=1 << 17)
    cs.pad_and_shrink()
    t_synth = time.time() - t0
    t0 = time.time()
    sb = create_base_setup(cs)
    cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=16,
                      security_level=100, pow_bits=0)
    art = create_device_setup(cs, sb, cfg, "poseidon2")
    dp = DeviceProver(cs, art, cfg)
    t_setup = time.time() - t0
    t0 = time.time()
    proof = dp.prove("poseidon", "poseidon2")
    t_cold = time.time() - t0
    t0 = time.time()
    proof = dp.prove("poseidon", "poseidon2")
    t_warm = time.time() - t0
    ok = verify(art.vk, proof, "poseidon", "poseidon2")
    assert ok

    # vs_baseline: no published reference numbers exist (README.md:101 "run
    # and read the log"); 30 s is our documented single-host assumption for
    # era-boojum on the bench workload. >1 means faster than that assumption.
    baseline_s = 30.0
    print(json.dumps({
        "metric": "sha256_%dkB_proof_wall_clock_s" % (n_bytes // 1024),
        "value": round(t_warm, 2),
        "unit": "seconds (warm prove, single chip; verified)",
        "vs_baseline": round(baseline_s / t_warm, 3),
        "detail": {"synthesis_s": round(t_synth, 1),
                   "setup_s": round(t_setup, 1),
                   "prove_cold_s": round(t_cold, 1),
                   "domain": cs.final_trace_len},
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8192)
