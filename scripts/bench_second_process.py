"""Second-process time-to-first-proof (VERDICT r4 missing #2 / next #4).

The reference fast-serializes its committed setup so a production prover
never rebuilds it (src/cs/implementations/fast_serialization.rs:17,34;
merkle_tree.rs:36-76). The TPU-native equivalent measured here:

  process A (once):   synthesize -> create_base_setup -> save_artifacts
  process B (always): synthesize (witness-only) -> load_artifacts ->
                      device re-commit (persistent-compile-cache warm) ->
                      first proof

Device memory does not persist across processes and the committed LDEs are
recomputed from the persisted base columns at device speed — shipping the
LDE+tree bytes back through the ~8-10 MB/s tunnel would be slower than the
on-device recommit (the round-5 NTT path commits the flagship setup in
well under a second of device time).

Usage: python scripts/bench_second_process.py [flagship|blake2s]
Run TWICE: first run creates the artifact file, second run measures the
true second-process path (and emits the JSON line).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART = "/tmp/boojum_artifacts_{name}.npz"


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "flagship"
    hasher = "blake2s" if name == "blake2s" else "poseidon2"
    transcript = "blake2s" if name == "blake2s" else "poseidon"

    import numpy as np

    import boojum_tpu
    boojum_tpu.enable_persistent_compilation_cache()

    from tests.test_sha256 import build_sha256_circuit
    from boojum_tpu.prover import ProofConfig
    from boojum_tpu.prover.device_prover import DeviceProver
    from boojum_tpu.prover.serialization import (
        create_device_setup_from_artifacts, save_artifacts)
    from boojum_tpu.verifier import verify

    path = ART.format(name=name)
    cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=16,
                      security_level=100, pow_bits=0)

    t_all = time.time()
    data = bytes(np.random.default_rng(42).integers(0, 256, 8192,
                                                    dtype=np.uint8))
    t0 = time.time()
    cs, _ = build_sha256_circuit(data, max_trace_len=1 << 17)
    cs.pad_and_shrink()
    t_synth = time.time() - t0

    if not os.path.exists(path):
        from boojum_tpu.cs.setup import create_base_setup
        from boojum_tpu.prover.device_prover import create_device_setup
        t0 = time.time()
        sb = create_base_setup(cs)
        art = create_device_setup(cs, sb, cfg, hasher)
        save_artifacts(path, sb, art.vk)
        print(json.dumps({
            "metric": f"{name}_first_process_setup_s",
            "value": round(time.time() - t0, 1),
            "note": "artifact created; run again for the second-process "
                    "measurement"}))
        return

    t0 = time.time()
    art = create_device_setup_from_artifacts(cs, path, cfg, hasher)
    t_load_commit = time.time() - t0

    t0 = time.time()
    dp = DeviceProver(cs, art, cfg)
    proof = dp.prove(transcript, hasher)
    t_first_prove = time.time() - t0
    ttfp = time.time() - t_all

    ok = verify(art.vk, proof, transcript, hasher)
    assert ok, "second-process proof failed to verify"

    print(json.dumps({
        "metric": f"{name}_second_process_time_to_first_proof_s",
        "value": round(ttfp, 1),
        "unit": "seconds (process start -> first verified proof, artifacts "
                "+ persistent compile cache warm)",
        "detail": {
            "synthesis_s": round(t_synth, 1),
            "load_and_device_commit_s": round(t_load_commit, 1),
            "first_prove_s": round(t_first_prove, 1),
            "hasher": hasher,
        }}))


if __name__ == "__main__":
    main()
