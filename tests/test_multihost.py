"""Multi-process (multi-host analogue) correctness: the sharded kernels run
across 2 OS processes joined via jax.distributed and produce BYTE-IDENTICAL
results to the single-process path.

This is the BASELINE configs[4] ingredient testable without hardware
(SURVEY §7 step 9, round-2 VERDICT item 3): the 8-device mesh spans two
processes (4 virtual CPU devices each), so all_to_all / all_gather
collectives actually cross the process boundary (gloo/DCN transport).
"""

import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

from boojum_tpu.field import goldilocks as gl
from boojum_tpu.ntt import ntt
from boojum_tpu.utils import npgl

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_collectives_byte_identical(tmp_path):
    port = _free_port()
    out_path = str(tmp_path / "mh_results.pkl")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "multihost_worker.py"),
         str(i), "2", str(port), out_path],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-4000:]
    with open(out_path, "rb") as f:
        got = pickle.load(f)

    # single-process references (same seeds as the worker)
    rng = np.random.default_rng(1234)
    log_n, batch = 10, 4
    n = 1 << log_n
    x = rng.integers(0, gl.ORDER, (n, batch), dtype=np.uint64)
    plan = ntt.get_plan(log_n)

    def u64(pair):
        return (pair[0].astype(np.uint64)
                | (pair[1].astype(np.uint64) << np.uint64(32)))

    ref = np.asarray(gl.to_u64(ntt.ntt_cols(gl.from_u64(x), plan)))
    assert np.array_equal(u64(got["ntt"]), ref)
    ref_c = np.asarray(gl.to_u64(ntt.coset_ntt_cols(gl.from_u64(x), 7, plan)))
    assert np.array_equal(u64(got["ntt_coset"]), ref_c)

    from boojum_tpu.field import extension as ext2
    c0 = rng.integers(0, gl.ORDER, n, dtype=np.uint64)
    c1 = rng.integers(0, gl.ORDER, n, dtype=np.uint64)
    g0 = got["grand_product"][0].astype(np.uint64) | \
        (got["grand_product"][1].astype(np.uint64) << np.uint64(32))
    g1 = got["grand_product"][2].astype(np.uint64) | \
        (got["grand_product"][3].astype(np.uint64) << np.uint64(32))
    acc = (1, 0)
    for i in range(n):
        assert (int(g0[i]), int(g1[i])) == acc, i
        acc = ext2.s2_mul(acc, (int(c0[i]), int(c1[i])))

    from boojum_tpu.hash import merkle, sponge
    k = 16
    cols = rng.integers(0, gl.ORDER, (n, k), dtype=np.uint64)
    xg = gl.from_u64(cols)
    full = ntt.lde_from_monomials(xg, log_n, 2)
    flat = full.reshape(2 * n, k)
    leaf_cols = gl.GL(flat.lo.T, flat.hi.T)
    ref_leaves = sponge.hash_leaves(leaf_cols)
    assert np.array_equal(u64(got["leaves"]).T, np.asarray(
        gl.to_u64(ref_leaves)))
    # distributed_commit_step's cap output is the per-device root ring
    # (one sub-tree root per shard, all_gathered) — size n_shards = 8
    tree = merkle.AlgebraicMerkleTree.from_leaf_columns(leaf_cols, cap_size=8)
    ref_cap = np.asarray(tree.get_cap(), dtype=np.uint64).T  # (4, 8)
    assert np.array_equal(u64(got["cap"]), ref_cap)
