"""BASELINE config benchmark suite (BASELINE.md "Configs" list).

Runs the non-flagship configs end-to-end on the live backend (real TPU
under the driver env; CPU otherwise) and prints one JSON line per config:

    python scripts/bench_suite.py                 # all configs
    python scripts/bench_suite.py keccak256 ...   # a subset

Configs (reference counterparts in parentheses):
  keccak256       1 kB Keccak-256 circuit, Poseidon2 tree, device prover
                  (src/gadgets/keccak256 bench config)
  lookup_heavy    ~10^6 enforced byte-op lookups through the binop table
                  (lookup-argument stress; width-3 specialized x4)
  recursion_outer outer circuit recursively verifying a full-security
                  (100-bit, lde 8) inner proof — the reference's
                  "recursive mode poseidon2" configuration
                  (sha256_bench_recursive_poseidon2.sh)
  sha256_blake2s  8 kB SHA-256 with Blake2s transcript + tree — the
                  reference's NON-recursive bench configuration
                  (sha256_bench_non_recursive.sh); device prover with
                  device-resident Blake2s trees
(The flagship sha256+poseidon2 config is bench.py itself.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def _emit(name, t_warm, extra):
    print(json.dumps({
        "metric": f"{name}_proof_wall_clock_s",
        "value": round(t_warm, 2),
        "unit": "seconds (warm prove, verified)",
        **extra,
    }), flush=True)


def _run_device(cs, cfg, transcript_kind="poseidon", hasher="poseidon2",
                reprove=None):
    from boojum_tpu.cs.setup import create_base_setup
    from boojum_tpu.prover.device_prover import DeviceProver, create_device_setup
    from boojum_tpu.verifier import verify

    t0 = time.time()
    sb = create_base_setup(cs)
    art = create_device_setup(cs, sb, cfg, hasher)
    dp = DeviceProver(cs, art, cfg)
    t_setup = time.time() - t0
    t0 = time.time()
    proof = dp.prove(transcript_kind, hasher)
    t_cold = time.time() - t0
    t0 = time.time()
    proof = dp.prove(transcript_kind, hasher)
    t_warm = time.time() - t0
    assert verify(art.vk, proof, transcript_kind, hasher)
    return t_warm, {"setup_s": round(t_setup, 1),
                    "prove_cold_s": round(t_cold, 1),
                    "domain": cs.final_trace_len}


def bench_keccak256(n_bytes=1024):
    from tests.test_keccak_gadget import build
    from boojum_tpu.prover import ProofConfig

    data = bytes(np.random.default_rng(7).integers(0, 256, n_bytes,
                                                   dtype=np.uint8))
    t0 = time.time()
    cs, _ = build(data, max_trace=1 << 17)
    cs.pad_and_shrink()
    t_synth = time.time() - t0
    cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=16,
                      security_level=100, pow_bits=0)
    t_warm, extra = _run_device(cs, cfg)
    extra["synthesis_s"] = round(t_synth, 1)
    _emit("keccak256_%dB" % n_bytes, t_warm, extra)


def bench_lookup_heavy(n_lookups=(1 << 20) - 1024):
    # 8 specialized repetitions/row: leave headroom for the constants rows
    # so the trace stays at 2^17 (1<<20 exactly overflowed max_trace_len)
    from boojum_tpu.cs import (ConstraintSystem, CSConfig, CSGeometry,
                               LookupParameters)
    from boojum_tpu.cs.gates import ConstantsAllocatorGate, FmaGate, NopGate
    from boojum_tpu.gadgets import tables
    from boojum_tpu.prover import ProofConfig

    rng = np.random.default_rng(11)
    geom = CSGeometry(num_columns_under_copy_permutation=32,
                      num_witness_columns=0, num_constant_columns=4,
                      max_allowed_constraint_degree=4)
    t0 = time.time()
    cs = ConstraintSystem(geom, 1 << 17, CSConfig.dev())
    cs.allow_lookup(LookupParameters.specialized_with_table_id_as_constant(
        width=3, num_repetitions=8, share_table_id=True))
    for g in (ConstantsAllocatorGate, FmaGate, NopGate):
        cs.allow_gate(g)
    tid = cs.add_lookup_table(tables.create_binop_table())
    a = rng.integers(0, 256, n_lookups, dtype=np.uint64)
    b = rng.integers(0, 256, n_lookups, dtype=np.uint64)
    packed = ((a ^ b) << np.uint64(32)) | ((a | b) << np.uint64(16)) | (a & b)
    av = cs.alloc_variables_with_values(a)
    bv = cs.alloc_variables_with_values(b)
    cv = cs.alloc_variables_with_values(packed)
    cs.enforce_lookup_batch(tid, np.stack([av, bv, cv]))
    cs.pad_and_shrink()
    t_synth = time.time() - t0
    cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=16,
                      security_level=100, pow_bits=0)
    t_warm, extra = _run_device(cs, cfg)
    extra["synthesis_s"] = round(t_synth, 1)
    extra["n_lookups"] = n_lookups
    _emit("lookup_heavy_%dk" % (n_lookups // 1000), t_warm, extra)


def bench_recursion_outer():
    from tests.test_prove_verify import build_small_circuit
    from boojum_tpu.cs import ConstraintSystem, CSConfig, CSGeometry
    from boojum_tpu.cs.gates import (BooleanConstraintGate,
                                     ConstantsAllocatorGate, FmaGate,
                                     NopGate, ReductionGate, SelectionGate,
                                     ZeroCheckGate)
    from boojum_tpu.cs.gates.arith import FmaGateInExtension
    from boojum_tpu.cs.setup import create_base_setup
    from boojum_tpu.gadgets.poseidon2_circuit import allow_poseidon2_gates
    from boojum_tpu.gadgets.recursion.primitives import allow_poseidon_gates
    from boojum_tpu.gadgets.recursion.verifier import (AllocatedProof,
                                                       recursive_verify)
    from boojum_tpu.prover import ProofConfig, create_setup_and_vk, prove
    from boojum_tpu.verifier import verify

    # inner: full-security proof (100-bit, lde 8) — reference recursive mode
    inner = build_small_circuit()
    inner.pad_and_shrink()
    sb = create_base_setup(inner)
    inner_cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=8,
                            security_level=100, pow_bits=0)
    art = create_setup_and_vk(inner, sb, inner_cfg, "poseidon2")
    inner_proof = prove(inner, art, inner_cfg, "poseidon", "poseidon2")
    assert verify(art.vk, inner_proof, "poseidon", "poseidon2")

    # outer: the flattened-gate geometry of
    # test_recursive_verifier_full_security_proof (132 cols, degree 8)
    t0 = time.time()
    geom = CSGeometry(num_columns_under_copy_permutation=132,
                      num_witness_columns=0, num_constant_columns=8,
                      max_allowed_constraint_degree=8)
    outer = ConstraintSystem(geom, 1 << 17, CSConfig.dev())
    for g in (ConstantsAllocatorGate, FmaGate, NopGate, BooleanConstraintGate,
              SelectionGate, ZeroCheckGate, FmaGateInExtension):
        outer.allow_gate(g)
    outer.allow_gate(ReductionGate, params=4)
    allow_poseidon2_gates(outer, flattened=True)
    allow_poseidon_gates(outer, flattened=True)
    alloc = AllocatedProof.allocate(outer, inner_proof)
    recursive_verify(outer, art.vk, alloc, inner_cfg, "poseidon", "poseidon2")
    outer.pad_and_shrink()
    t_synth = time.time() - t0
    assert outer.check_if_satisfied()
    cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=16,
                      security_level=100, pow_bits=0)
    t_warm, extra = _run_device(outer, cfg)
    extra["synthesis_s"] = round(t_synth, 1)
    _emit("recursion_outer", t_warm, extra)


def bench_sha256_blake2s(n_bytes=8192):
    """Reference non-recursive bench config: Blake2s transcript + tree
    (sha256_bench_non_recursive.sh). Runs the DEVICE prover — byte trees are
    device-resident batched u32 kernels (hash/device_bytes_hash.py)."""
    from tests.test_sha256 import build_sha256_circuit
    from boojum_tpu.prover import ProofConfig

    data = bytes(np.random.default_rng(42).integers(0, 256, n_bytes,
                                                    dtype=np.uint8))
    t0 = time.time()
    cs, _ = build_sha256_circuit(data, max_trace_len=1 << 17)
    cs.pad_and_shrink()
    t_synth = time.time() - t0
    cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=16,
                      security_level=100, pow_bits=0)
    t_warm, extra = _run_device(cs, cfg, "blake2s", "blake2s")
    extra["synthesis_s"] = round(t_synth, 1)
    extra["prover"] = "device (blake2s trees on-chip)"
    _emit("sha256_%dkB_blake2s" % (n_bytes // 1024), t_warm, extra)


ALL = {
    "keccak256": bench_keccak256,
    "lookup_heavy": bench_lookup_heavy,
    "recursion_outer": bench_recursion_outer,
    "sha256_blake2s": bench_sha256_blake2s,
}


def main(names):
    import boojum_tpu
    boojum_tpu.enable_persistent_compilation_cache()
    for name in names or list(ALL):
        ALL[name]()


if __name__ == "__main__":
    main(sys.argv[1:])
