"""Round-5 flagship stage dissection: one warm prove with fine-grained
verbose markers (witness program vs commit, quotient host dispatch, FRI
per-stage)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import boojum_tpu
boojum_tpu.enable_persistent_compilation_cache()

from tests.test_sha256 import build_sha256_circuit
from boojum_tpu.cs.setup import create_base_setup
from boojum_tpu.prover import ProofConfig
from boojum_tpu.prover.device_prover import DeviceProver, create_device_setup
from boojum_tpu.verifier import verify


def main():
    data = bytes(np.random.default_rng(42).integers(0, 256, 8192,
                                                    dtype=np.uint8))
    t0 = time.time()
    cs, _ = build_sha256_circuit(data, max_trace_len=1 << 17)
    cs.pad_and_shrink()
    print(f"synthesis {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    sb = create_base_setup(cs)
    cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=16,
                      security_level=100, pow_bits=0)
    art = create_device_setup(cs, sb, cfg, "poseidon2")
    dp = DeviceProver(cs, art, cfg)
    print(f"setup {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    proof = dp.prove("poseidon", "poseidon2")
    print(f"cold prove {time.time()-t0:.1f}s", flush=True)
    for i in range(2):
        t0 = time.time()
        proof = dp.prove("poseidon", "poseidon2")
        print(f"warm prove {time.time()-t0:.2f}s", flush=True)
    assert verify(art.vk, proof, "poseidon", "poseidon2")
    print("verified OK; verbose run:", flush=True)
    t0 = time.time()
    dp.prove("poseidon", "poseidon2", verbose=True)
    print(f"verbose prove {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
