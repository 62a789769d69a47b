"""Mesh-sharded committed oracle: the multi-chip twin of DeviceOracle.

Composition of the distributed kernels (BASELINE configs[4]):
- monomials via the distributed inverse four-step NTT (two all_to_alls);
- per-coset LDEs via the distributed forward NTT with factored coset powers;
- the Merkle tree via the sharded builder (leaf hashing + sub-cap layers
  local per shard, top layers replicated);
- query gathers and barycentric evaluations run on the global sharded
  arrays (XLA inserts the collectives).

Everything produces bit-identical caps/paths/values to the single-device
DeviceOracle — asserted in tests/test_sharded_prover.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..field import goldilocks as gl
from ..field.goldilocks import GL
from ..ntt import ntt
from ..prover.oracles import DeviceOracle
from ..utils import npgl
from . import sharding as sh


def _row_sharding(mesh):
    return NamedSharding(mesh, P(sh.AXIS, None))


def _put_rows(mesh, lo, hi):
    s = _row_sharding(mesh)
    return jax.device_put(lo, s), jax.device_put(hi, s)


def _factor_limbs(log_n, n_shards, coset):
    l1o, l1h, l2o, l2h = sh.coset_power_factors(log_n, n_shards, coset)
    return (jnp.asarray(l1o), jnp.asarray(l1h),
            jnp.asarray(l2o), jnp.asarray(l2h))


def sharded_cols_to_monomials(mesh, cols: GL) -> GL:
    """Lagrange values (n, k) -> monomials via bitreverse + distributed
    iNTT (device-resident input; the bitreverse is a global gather)."""
    n, k = cols.shape
    log_n = n.bit_length() - 1
    rev = jnp.asarray(ntt.bitreverse_indices(log_n))
    y = GL(cols.lo[rev], cols.hi[rev])
    f = sh.distributed_intt(mesh, log_n, k)
    ones = _factor_limbs(log_n, mesh.devices.size, 1)
    lo, hi = f(y.lo, y.hi, *ones)
    return GL(lo, hi)


def sharded_monomials_to_lde(mesh, mono: GL, lde_factor: int) -> GL:
    """(n, k) monomials -> (lde, n, k) bitreversed coset evals via the
    distributed forward NTT, one call per coset."""
    n, k = mono.shape
    log_n = n.bit_length() - 1
    f = sh.distributed_ntt(mesh, log_n, k)
    outs_lo, outs_hi = [], []
    for coset in ntt.lde_cosets(log_n, lde_factor):
        fac = _factor_limbs(log_n, mesh.devices.size, int(coset))
        lo, hi = f(mono.lo, mono.hi, *fac)
        outs_lo.append(lo)
        outs_hi.append(hi)
    return GL(jnp.stack(outs_lo), jnp.stack(outs_hi))


class ShardedOracle(DeviceOracle):
    """DeviceOracle over a 1-D device mesh; same interface, same bytes."""

    def __init__(self, lagrange_cols_u64, lde_factor: int, cap_size: int,
                 hasher: str, mesh, tree_lde: int = None, monomials=None):
        assert hasher == "poseidon2", \
            "sharded oracles require the poseidon2 hasher"
        self.mesh = mesh
        if monomials is None:
            k, n = lagrange_cols_u64.shape
            log_n = n.bit_length() - 1
            # bitreverse on host (free index permutation), shard, iNTT
            rev = ntt.bitreverse_indices(log_n)
            host = np.ascontiguousarray(lagrange_cols_u64[:, rev].T)
            lo = (host & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            hi = (host >> np.uint64(32)).astype(np.uint32)
            lo, hi = _put_rows(mesh, lo, hi)
            f = sh.distributed_intt(mesh, log_n, k)
            ones = _factor_limbs(log_n, mesh.devices.size, 1)
            mlo, mhi = f(lo, hi, *ones)
            monomials = GL(mlo, mhi)
        self.monomials = monomials
        self.n = monomials.shape[0]
        self.num_polys = monomials.shape[1]
        self.lde_factor = lde_factor
        self.tree_lde = tree_lde or lde_factor
        lde = sharded_monomials_to_lde(mesh, monomials, lde_factor)
        self.flat = lde.reshape(lde_factor * self.n, self.num_polys)
        tree_rows = self.flat[: self.tree_lde * self.n]
        leaf_cols = gl.GL(tree_rows.lo.T, tree_rows.hi.T)
        self.tree = sh.build_sharded_tree(mesh, leaf_cols, cap_size)
