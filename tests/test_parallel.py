"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(reference has no distributed backend — SURVEY §2.4; this validates the new
capability: sharded commit step and the distributed four-step NTT)."""

import numpy as np

from boojum_tpu.field import goldilocks as gl
from boojum_tpu.ntt import ntt
from boojum_tpu.parallel import sharding
from boojum_tpu.utils import npgl


def test_distributed_commit_matches_local():
    from boojum_tpu.hash import sponge, merkle

    mesh = sharding.make_mesh()
    S = mesh.devices.size
    log_n, lde, k = 8, 4, 16
    n = 1 << log_n
    rng = np.random.default_rng(3)
    vals = rng.integers(0, npgl.ORDER, size=(n, k), dtype=np.uint64)

    step = sharding.distributed_commit_step(mesh, log_n, lde, cap_size=S)
    x = gl.from_u64(vals)
    leaves_lo, leaves_hi, cap_lo, cap_hi = step(x.lo, x.hi)

    # local reference: full LDE -> leaf hash rows -> tree with cap S
    full = ntt.lde_from_monomials(x, log_n, lde)
    flat = full.reshape(lde * n, k)
    cols = gl.GL(flat.lo.T, flat.hi.T)
    ref_leaves = sponge.hash_leaves(cols)  # (4, m)
    assert np.array_equal(np.asarray(leaves_lo).T, np.asarray(ref_leaves.lo))
    tree = merkle.AlgebraicMerkleTree.from_leaf_columns(cols, cap_size=S)
    ref_cap = np.asarray(tree.get_cap(), dtype=np.uint64).T  # (4, S)
    got_cap = (np.asarray(cap_lo, np.uint64)
               | (np.asarray(cap_hi, np.uint64) << np.uint64(32)))
    assert np.array_equal(got_cap, ref_cap)




def test_distributed_ntt_matches_local():
    mesh = sharding.make_mesh()
    S = mesh.devices.size
    log_n, b = 12, 4
    n = 1 << log_n
    rng = np.random.default_rng(7)
    vals = rng.integers(0, npgl.ORDER, size=(n, b), dtype=np.uint64)

    ref = np.asarray(
        gl.to_u64(ntt.ntt_cols(gl.from_u64(vals), ntt.get_plan(log_n))))

    step = sharding.distributed_ntt(mesh, log_n, b)
    x = gl.from_u64(vals)
    ones = sharding.coset_power_factors(log_n, S, 1)
    out_lo, out_hi = step(x.lo, x.hi, *ones)
    got = np.asarray(gl.to_u64(gl.GL(out_lo, out_hi)))
    assert np.array_equal(got, ref)

    # coset leg: scale-by-powers then NTT == coset_ntt
    coset = int(gl.MULTIPLICATIVE_GENERATOR)
    ref_c = np.asarray(gl.to_u64(
        ntt.coset_ntt_cols(gl.from_u64(vals), coset, ntt.get_plan(log_n))))
    pows = sharding.coset_power_factors(log_n, S, coset)
    out_lo, out_hi = step(x.lo, x.hi, *pows)
    got_c = np.asarray(gl.to_u64(gl.GL(out_lo, out_hi)))
    assert np.array_equal(got_c, ref_c)


def test_distributed_grand_product():
    from boojum_tpu.field import extension as ext2

    mesh = sharding.make_mesh()
    S = mesh.devices.size
    n = 1 << 9
    rng = np.random.default_rng(11)
    c0 = rng.integers(0, npgl.ORDER, n, dtype=np.uint64)
    c1 = rng.integers(0, npgl.ORDER, n, dtype=np.uint64)

    step = sharding.distributed_grand_product(mesh, n)
    limb = lambda a: ((a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                      (a >> np.uint64(32)).astype(np.uint32))
    (c0l, c0h), (c1l, c1h) = limb(c0), limb(c1)
    o0l, o0h, o1l, o1h = step(c0l, c0h, c1l, c1h)
    got0 = np.asarray(o0l, np.uint64) | (np.asarray(o0h, np.uint64) << np.uint64(32))
    got1 = np.asarray(o1l, np.uint64) | (np.asarray(o1h, np.uint64) << np.uint64(32))

    # exact host reference: exclusive prefix products over GL2
    acc = (1, 0)
    for i in range(n):
        assert (int(got0[i]), int(got1[i])) == acc, i
        acc = ext2.s2_mul(acc, (int(c0[i]), int(c1[i])))
