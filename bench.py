"""Driver benchmark: ONE JSON line — the flagship 8 kB SHA-256 proof
end-to-end on the real chip (BASELINE config[0]; round-1 VERDICT item 7:
report proof wall-clock, not a kernel).

metric: warm prove wall-clock seconds on one chip (best of 3), after which
the proof is VERIFIED (and the run aborts if verification fails).

vs_baseline: baseline_seconds / value (>1 = faster than baseline). The
baseline is a roofline-DERIVED estimate of era-boojum on a 64-core AVX-512
server — the reference publishes no absolute numbers and no Rust toolchain
exists in this image to measure it. Derivation (scripts/derive_baseline.py
prints the work count; constants documented there):
  protocol work for this proof = 0.8e9 NTT butterflies + ~14e6 Poseidon2
  permutations (prove-time Merkle trees) + ~0.7e9 other field muls.
  At generous 64-core sustained rates (4e9 butterflies/s, 128e6 perms/s,
  32e9 mul/s) that is ~0.33 s of kernel time; with witness materialization,
  memory traffic and orchestration a perfectly-engineered CPU prover lands
  at ~1 s. BASELINE_SECONDS = 1.0 (favorable to the CPU, so vs_baseline is
  conservative).

Context the number carries (also in `detail`): this chip hangs off an
experimental tunnel (measured this round: ~8-10 MB/s host->device,
~3 MB/s device->host, ~40 ms per synced dispatch). The witness upload alone
(~12 MB packed) costs more over the tunnel than the whole baseline; the
per-stage split separates device compute from transfer-bound stages.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_SECONDS = 1.0


def main():
    import numpy as np

    import boojum_tpu
    boojum_tpu.enable_persistent_compilation_cache()

    from tests.test_sha256 import build_sha256_circuit
    from boojum_tpu.cs.setup import create_base_setup
    from boojum_tpu.prover import ProofConfig
    from boojum_tpu.prover.device_prover import DeviceProver, create_device_setup
    from boojum_tpu.verifier import verify

    data = bytes(np.random.default_rng(42).integers(0, 256, 8192,
                                                    dtype=np.uint8))
    t0 = time.time()
    cs, _ = build_sha256_circuit(data, max_trace_len=1 << 17)
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

    warms = []
    for _ in range(3):
        t0 = time.time()
        proof = dp.prove("poseidon", "poseidon2")
        warms.append(time.time() - t0)

    ok = verify(art.vk, proof, "poseidon", "poseidon2")
    assert ok, "flagship proof failed to verify"

    # one extra verbose prove for the per-stage split (synced attribution
    # adds blocking, so it is NOT one of the timed runs)
    dp.prove("poseidon", "poseidon2", verbose=True)

    warm = min(warms)
    print(json.dumps({
        "metric": "sha256_8kB_proof_wall_clock_s",
        "value": round(warm, 2),
        "unit": "seconds (warm prove, 1 chip, verified; best of 3)",
        "vs_baseline": round(BASELINE_SECONDS / warm, 3),
        "detail": {
            "warm_runs_s": [round(w, 2) for w in warms],
            "cold_prove_s": round(t_cold, 1),
            "synthesis_s": round(t_synth, 1),
            "setup_s": round(t_setup, 1),
            "domain": cs.final_trace_len,
            "stage_split_s": dp.last_stage_times,
            "baseline": "era-boojum roofline on 64-core AVX-512 server, "
                        "~1.0 s (see module docstring)",
        },
    }))


if __name__ == "__main__":
    main()
