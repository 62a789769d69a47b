"""Large-trace sharded prove (BASELINE configs[4] direction; round-2 VERDICT
item 4: 'prove a >=2^20-row circuit ... largest that fits').

Builds a 2^20-row circuit (FMA filler + specialized byte-op lookups), runs
the SHARDED prover path (ShardedOracle + distributed NTT/grand-product +
sharded trees) over the available mesh, verifies, and prints one JSON line.

On the driver image the real mesh is 1 chip (multi-chip hardware is not
available), so the collectives are degenerate but every sharded code path —
layouts, shard_map programs, sharded tree/query plumbing — runs at full
2^20-row scale on real hardware. Cross-device semantics are pinned
separately: byte-identity on the virtual 8-device CPU mesh
(tests/test_sharded_prover.py) and 2-process jax.distributed collectives
(tests/test_multihost.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_big_circuit(log_rows: int):
    from boojum_tpu.cs.cs import ConstraintSystem, CSConfig, LookupTable
    from boojum_tpu.cs.gates import (ConstantsAllocatorGate, FmaGate, NopGate,
                                     PublicInputGate)
    from boojum_tpu.cs.geometry import CSGeometry, LookupParameters
    from boojum_tpu.utils import npgl

    P = npgl.ORDER
    geom = CSGeometry(16, 0, 4, 4)
    n = 1 << log_rows
    cs = ConstraintSystem(geom, n, CSConfig.dev())
    cs.allow_lookup(
        LookupParameters.specialized_with_table_id_as_constant(3, 2))
    for g in (ConstantsAllocatorGate, FmaGate, NopGate, PublicInputGate):
        cs.allow_gate(g)
    aa, bb = np.meshgrid(np.arange(32, dtype=np.uint64),
                         np.arange(32, dtype=np.uint64), indexing="ij")
    rows = np.stack([aa.reshape(-1), bb.reshape(-1),
                     (aa ^ bb).reshape(-1)], axis=1)
    tid = cs.add_lookup_table(LookupTable("xor5", rows, num_keys=2))
    rng = np.random.default_rng(5)
    # ~n FMA rows (4 fma instances per row at 16 copy cols)
    n_fma = (n - 2048) * 4
    fv = cs.alloc_variables_with_values(
        rng.integers(0, P, n_fma, dtype=np.uint64))
    d = FmaGate.compute_fma_batch(cs, 3, (fv, fv), 5, fv)
    # lookups through the specialized columns (2 reps/row)
    n_lk = 2 * (n - 8)
    xa = cs.alloc_variables_with_values(
        rng.integers(0, 32, n_lk, dtype=np.uint64))
    xb = cs.alloc_variables_with_values(
        rng.integers(0, 32, n_lk, dtype=np.uint64))
    xr = cs.alloc_variables_with_values(cs.get_values(xa) ^ cs.get_values(xb))
    cs.enforce_lookup_batch(tid, np.stack([xa, xb, xr]))
    PublicInputGate.place(cs, int(d[0]))
    cs.pad_and_shrink()
    return cs


def main():
    import boojum_tpu
    boojum_tpu.enable_persistent_compilation_cache()
    from boojum_tpu.cs.setup import create_base_setup
    from boojum_tpu.parallel import sharding as sh
    from boojum_tpu.prover import ProofConfig
    from boojum_tpu.prover.device_prover import (DeviceProver,
                                                 create_device_setup)
    from boojum_tpu.verifier import verify

    log_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    t0 = time.time()
    cs = build_big_circuit(log_rows)
    t_synth = time.time() - t0
    mesh = sh.make_mesh()
    cfg = ProofConfig(fri_lde_factor=4, merkle_tree_cap_size=16,
                      security_level=100, pow_bits=0)
    t0 = time.time()
    sb = create_base_setup(cs)
    art = create_device_setup(cs, sb, cfg, "poseidon2", mesh=mesh)
    dp = DeviceProver(cs, art, cfg, mesh=mesh)
    t_setup = time.time() - t0
    t0 = time.time()
    proof = dp.prove("poseidon2", "poseidon2")
    t_cold = time.time() - t0
    t0 = time.time()
    proof = dp.prove("poseidon2", "poseidon2")
    t_warm = time.time() - t0
    ok = verify(art.vk, proof, "poseidon2", "poseidon2")
    print(json.dumps({
        "metric": "sharded_prove_2e%d_rows" % log_rows,
        "value": round(t_warm, 2),
        "unit": "seconds (warm sharded prove, verified)",
        "verified": bool(ok),
        "rows": 1 << log_rows,
        "mesh_devices": int(mesh.devices.size),
        "setup_s": round(t_setup, 1),
        "prove_cold_s": round(t_cold, 1),
        "synthesis_s": round(t_synth, 1),
    }), flush=True)
    assert ok


if __name__ == "__main__":
    main()
