"""Bisect which quotient gate sweep kills the remote TPU compile helper on
the recursion-outer circuit (reduced-security variant for fast iteration).

Compiles each gate sweep's program ALONE with AOT lower/compile, printing
the gate name before each attempt.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    import boojum_tpu
    boojum_tpu.enable_persistent_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tests.test_prove_verify import build_small_circuit
    from tests.test_recursion import make_outer_cs  # noqa: F401  (import side effects)
    from boojum_tpu.cs import ConstraintSystem, CSConfig, CSGeometry
    from boojum_tpu.cs.gates import (BooleanConstraintGate,
                                     ConstantsAllocatorGate, FmaGate, NopGate,
                                     ReductionGate, SelectionGate,
                                     ZeroCheckGate)
    from boojum_tpu.cs.gates.arith import FmaGateInExtension
    from boojum_tpu.cs.setup import create_base_setup
    from boojum_tpu.gadgets.poseidon2_circuit import allow_poseidon2_gates
    from boojum_tpu.gadgets.recursion.primitives import allow_poseidon_gates
    from boojum_tpu.gadgets.recursion.verifier import (AllocatedProof,
                                                       recursive_verify)
    from boojum_tpu.prover import ProofConfig, create_setup_and_vk, prove
    from boojum_tpu.prover.device_prover import _gate_sweep_body
    from boojum_tpu.verifier import verify

    inner = build_small_circuit(with_lookup=True, n_fma=8)
    sb_i = create_base_setup(inner)
    cfg = ProofConfig(fri_lde_factor=4, merkle_tree_cap_size=4,
                      security_level=20, pow_bits=0)
    art = create_setup_and_vk(inner, sb_i, cfg, "poseidon2")
    proof = prove(inner, art, cfg, "poseidon", "poseidon2")
    assert verify(art.vk, proof, "poseidon", "poseidon2")
    print("inner proof done", flush=True)

    geom = CSGeometry(num_columns_under_copy_permutation=132,
                      num_witness_columns=0, num_constant_columns=8,
                      max_allowed_constraint_degree=8)
    outer = ConstraintSystem(geom, 1 << 16, CSConfig.dev())
    for g in (ConstantsAllocatorGate, FmaGate, NopGate, BooleanConstraintGate,
              SelectionGate, ZeroCheckGate, FmaGateInExtension):
        outer.allow_gate(g)
    outer.allow_gate(ReductionGate, params=4)
    allow_poseidon2_gates(outer, flattened=True)
    allow_poseidon_gates(outer, flattened=True)
    alloc = AllocatedProof.allocate(outer, proof)
    recursive_verify(outer, art.vk, alloc, cfg, "poseidon", "poseidon2")
    outer.pad_and_shrink()
    print("outer rows:", outer.final_trace_len, flush=True)

    sb = create_base_setup(outer)
    n = sb.domain_size
    qd = sb.quotient_degree
    size = qd * n
    geometry = outer.geometry
    num_var = (geometry.num_columns_under_copy_permutation
               + (outer.specialized_copy_data.shape[0]
                  if outer.specialized_copy_data is not None else 0)
               + (outer.gate_spec_data.shape[0]
                  if outer.gate_spec_data is not None else 0))
    nw = geometry.num_witness_columns
    n_setup = sb.copy_permutation_polys.shape[0] + \
        sb.constant_columns.shape[0] + sb.lookup_tables_columns.shape[0]

    w_shape = (size, num_var + nw + 1)
    s_shape = (size, n_setup)
    print("size", size, "w cols", w_shape[1], flush=True)

    for ev_idx, ev in enumerate(outer.evaluators_general):
        if ev.num_quotient_terms == 0:
            continue
        path = sb.selector_paths[ev_idx]
        reps = ev.num_repetitions(geometry)
        body = _gate_sweep_body(ev, reps, 0, num_var, num_var + len(path))
        args = (
            jax.ShapeDtypeStruct(w_shape, jnp.uint32),
            jax.ShapeDtypeStruct(w_shape, jnp.uint32),
            jax.ShapeDtypeStruct(s_shape, jnp.uint32),
            jax.ShapeDtypeStruct(s_shape, jnp.uint32),
            jax.ShapeDtypeStruct((size,), jnp.uint32),
            jax.ShapeDtypeStruct((size,), jnp.uint32),
            jax.ShapeDtypeStruct((ev.num_quotient_terms * reps, 2, 2),
                                 jnp.uint32),
        )
        t0 = time.time()
        print("compiling sweep for gate %s (reps %d, terms %d)"
              % (ev.name, reps, ev.num_quotient_terms), flush=True)
        try:
            jax.jit(body).lower(*args).compile()
            print("  OK %.1fs" % (time.time() - t0), flush=True)
        except Exception as e:
            print("  FAILED %.1fs: %s" % (time.time() - t0,
                                          str(e)[:200]), flush=True)


if __name__ == "__main__":
    main()
