"""Quick real-TPU smoke for the round-4 device paths: byte trees, device
witness program, fused query gather. Prints timing lines; asserts parity.

Usage: python scripts/tpu_smoke.py [out_file]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

OUT = open(sys.argv[1], "a", buffering=1) if len(sys.argv) > 1 else sys.stderr


def log(msg):
    print(msg, file=OUT, flush=True)
    if OUT is not sys.stderr:
        print(msg, flush=True)


def main():
    import numpy as np

    import boojum_tpu
    boojum_tpu.enable_persistent_compilation_cache()
    import jax

    log("backend: %s" % jax.default_backend())
    from boojum_tpu.field import goldilocks as gl
    from boojum_tpu.hash.merkle import BytesMerkleTree
    from boojum_tpu.prover.device_merkle import build_device_bytes_tree

    rng = np.random.default_rng(0)
    for algo in ("blake2s", "keccak256"):
        for k, m in ((72, 1 << 12), (72, 1 << 19)):
            vals = rng.integers(0, gl.ORDER, size=(k, m), dtype=np.uint64)
            t0 = time.time()
            cols = gl.from_u64(vals)
            jax.block_until_ready(cols.lo)
            t_up = time.time() - t0
            t0 = time.time()
            tree = build_device_bytes_tree(cols, 16, algo)
            cap = tree.get_cap()
            t_cold = time.time() - t0
            t0 = time.time()
            cap2 = build_device_bytes_tree(cols, 16, algo).get_cap()
            t_warm = time.time() - t0
            log("%s m=%d upload %.1fs cold %.1fs warm %.3fs"
                % (algo, m, t_up, t_cold, t_warm))
            if m <= 1 << 12:
                host = BytesMerkleTree.from_leaf_columns_u64(vals, 16, algo)
                assert cap == host.get_cap(), "%s cap mismatch" % algo
                leaf, path = tree.get_proof(5)
                h_leaf, h_path = host.get_proof(5)
                assert (leaf, path) == (h_leaf, h_path)
                log("%s cap+path parity OK" % algo)

    # device witness program at flagship scale
    from tests.test_sha256 import build_sha256_circuit
    from boojum_tpu.prover.device_witness import DeviceWitnessProgram
    from boojum_tpu.prover.prover import materialize_witness_columns

    data = bytes(rng.integers(0, 256, 8192, dtype=np.uint8))
    t0 = time.time()
    cs, _ = build_sha256_circuit(data, max_trace_len=1 << 17)
    cs.pad_and_shrink()
    log("sha256 synthesis %.1fs n=%d" % (time.time() - t0,
                                         cs.final_trace_len))
    n = cs.final_trace_len
    assert DeviceWitnessProgram.supported(cs)
    t0 = time.time()
    prog = DeviceWitnessProgram(cs, n)
    log("witness program build %.1fs" % (time.time() - t0))
    t0 = time.time()
    lag = prog()
    jax.block_until_ready(lag.lo)
    log("witness program exec cold %.1fs" % (time.time() - t0))
    t0 = time.time()
    lag = prog()
    jax.block_until_ready(lag.lo)
    log("witness program exec warm %.3fs" % (time.time() - t0))
    # spot-check 64 random cells vs host materialization
    variables, wits, mults = materialize_witness_columns(cs, n)
    host = np.concatenate([variables, wits, mults], axis=0).T
    ri = rng.integers(0, n, 64)
    ci = rng.integers(0, host.shape[1], 64)
    dev_lo = np.asarray(lag.lo[ri, ci])
    dev_hi = np.asarray(lag.hi[ri, ci])
    dev = dev_lo.astype(np.uint64) | (dev_hi.astype(np.uint64) << np.uint64(32))
    assert np.array_equal(dev, host[ri, ci]), "witness spot-check mismatch"
    log("witness spot-check OK")

    # mega-fused quotient vs per-phase path: BYTE-IDENTICAL proofs on chip
    from tests.test_prove_verify import build_small_circuit
    from boojum_tpu.cs.setup import create_base_setup
    from boojum_tpu.prover import ProofConfig
    from boojum_tpu.prover.device_prover import (DeviceProver,
                                                 create_device_setup)
    from boojum_tpu.prover.proof import proof_to_json
    from boojum_tpu.verifier import verify

    cs2 = build_small_circuit(with_lookup=True, n_fma=12)
    sb2 = create_base_setup(cs2)
    cfg = ProofConfig(fri_lde_factor=4, merkle_tree_cap_size=4)
    art = create_device_setup(cs2, sb2, cfg, "poseidon2")
    t0 = time.time()
    mega = DeviceProver(cs2, art, cfg, fuse=True).prove(
        "poseidon2", "poseidon2")
    log("mega prove (small) %.1fs" % (time.time() - t0))
    t0 = time.time()
    rolled = DeviceProver(cs2, art, cfg, fuse=False).prove(
        "poseidon2", "poseidon2")
    log("rolled prove (small) %.1fs" % (time.time() - t0))
    assert verify(art.vk, mega, "poseidon2", "poseidon2")
    assert proof_to_json(mega) == proof_to_json(rolled), \
        "mega-fused quotient is NOT byte-identical to the rolled path"
    log("mega == rolled byte-identity OK")


if __name__ == "__main__":
    main()
