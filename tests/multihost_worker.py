"""Worker process for the multi-host (multi-process) collectives test.

Launched by tests/test_multihost.py as N separate OS processes that form one
JAX distributed system over a localhost coordinator (the DCN analogue this
image can exercise — real multi-chip hardware is unavailable). Each process
owns 4 virtual CPU devices; the global mesh spans all processes, so every
collective in the sharded kernels (all_to_all, all_gather, prefix folds)
actually crosses the process boundary.

Covers SURVEY §7 step 9 / BASELINE configs[4]'s distributed ingredients:
  - distributed four-step NTT (all_to_all transposes)
  - distributed exclusive grand product (all_gather + prefix fold)
  - sharded Merkle commit (leaf hash + cap ring all_gather)
Process 0 writes the gathered results to a file; the parent test compares
byte-exactly against a single-process reference.
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    proc_id = int(sys.argv[1])
    num_procs = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=num_procs, process_id=proc_id)
    assert jax.device_count() == 4 * num_procs
    assert jax.process_count() == num_procs

    import numpy as np
    import jax.numpy as jnp  # noqa: F401
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from boojum_tpu.field import goldilocks as gl
    from boojum_tpu.parallel import sharding as sh

    mesh = sh.make_mesh()

    def to_global(arr, spec):
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(arr.shape, sharding,
                                            lambda idx: arr[idx])

    def limbs(a, spec):
        return (to_global((a & np.uint64(0xFFFFFFFF)).astype(np.uint32), spec),
                to_global((a >> np.uint64(32)).astype(np.uint32), spec))

    def gather(a, tiled=True):
        return np.asarray(multihost_utils.process_allgather(a, tiled=tiled))

    rng = np.random.default_rng(1234)  # same seed in every process
    log_n, batch = 10, 4
    n = 1 << log_n
    results = {}

    # 1. distributed NTT (plain + coset legs)
    x = rng.integers(0, gl.ORDER, (n, batch), dtype=np.uint64)
    step = sh.distributed_ntt(mesh, log_n, batch)
    for name, coset in (("ntt", 1), ("ntt_coset", 7)):
        pf = sh.coset_power_factors(log_n, mesh.devices.size, coset)
        p1 = (to_global(pf[0], P(sh.AXIS)), to_global(pf[1], P(sh.AXIS)))
        p2 = (to_global(pf[2], P()), to_global(pf[3], P()))
        out_lo, out_hi = step(*limbs(x, P(sh.AXIS)), *p1, *p2)
        results[name] = (gather(out_lo), gather(out_hi))

    # 2. distributed exclusive grand product over ext ratios
    c0 = rng.integers(0, gl.ORDER, n, dtype=np.uint64)
    c1 = rng.integers(0, gl.ORDER, n, dtype=np.uint64)
    gp = sh.distributed_grand_product(mesh, n)
    o = gp(*limbs(c0, P(sh.AXIS)), *limbs(c1, P(sh.AXIS)))
    results["grand_product"] = tuple(gather(a) for a in o)

    # 3. sharded Merkle commit: (n, k) cols sharded over k; cap replicated
    k = 16
    cols = rng.integers(0, gl.ORDER, (n, k), dtype=np.uint64)
    commit = sh.distributed_commit_step(mesh, log_n, 2, cap_size=4)
    leaves_lo, leaves_hi, cap_lo, cap_hi = commit(
        *limbs(cols, P(None, sh.AXIS)))
    # cap is replicated (P() out_spec): read the local replica directly
    results["cap"] = (np.asarray(cap_lo.addressable_data(0)),
                      np.asarray(cap_hi.addressable_data(0)))
    results["leaves"] = (gather(leaves_lo), gather(leaves_hi))

    if proc_id == 0:
        with open(out_path, "wb") as f:
            pickle.dump(results, f)
    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
