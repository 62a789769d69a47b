"""End-to-end example: prove knowledge of a SHA-256 preimage.

Usage:
    python examples/sha256_proof.py [n_bytes] [--device]

Builds the reference-shaped SHA-256 circuit (60 copy columns, 4-bit chunked
lookups), proves it, verifies the proof, then re-proves a SECOND input via
witness replay against the same setup/VK.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import hashlib

import numpy as np


def main():
    n_bytes = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 512
    device = "--device" in sys.argv

    from tests.test_sha256 import build_sha256_circuit
    from boojum_tpu.prover import ProofConfig, verify_circuit
    from boojum_tpu.prover.prover import prove

    if not device:
        import jax
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    data = bytes(rng.integers(0, 256, n_bytes, dtype=np.uint8))

    t0 = time.time()
    cs, digest_vars = build_sha256_circuit(data, max_trace_len=1 << 15)
    cs.pad_and_shrink()
    print(f"synthesis: {time.time()-t0:.1f}s, trace {cs.final_trace_len} rows")

    digest = bytes(int(cs.get_value(int(v))) for v in digest_vars)
    assert digest == hashlib.sha256(data).digest()
    print("in-circuit digest matches hashlib:", digest.hex())

    t0 = time.time()
    cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=16)
    from boojum_tpu.prover import prepare_setup_and_vk
    art = prepare_setup_and_vk(cs, cfg, "poseidon2")
    print(f"setup: {time.time()-t0:.1f}s")
    t0 = time.time()
    proof = prove(cs, art, cfg, "poseidon", "poseidon2")
    print(f"prove: {time.time()-t0:.1f}s")
    assert verify_circuit(art.vk, proof, "poseidon", "poseidon2")
    print("proof verifies")

    # repeated proving: new input, same circuit + setup + VK
    data2 = bytes(rng.integers(0, 256, n_bytes, dtype=np.uint8))
    t0 = time.time()
    cs.replay_witness({int(v): b for v, b in zip(cs.input_variables, data2)})
    assert bytes(int(cs.get_value(int(v))) for v in digest_vars) == \
        hashlib.sha256(data2).digest()
    proof2 = prove(cs, art, cfg, "poseidon", "poseidon2")
    assert verify_circuit(art.vk, proof2, "poseidon", "poseidon2")
    print(f"replay + reprove: {time.time()-t0:.1f}s — second proof verifies")


if __name__ == "__main__":
    main()
