"""Committed oracles: LDE storage + Merkle-cap tree + query opening.

Reference behavior: the per-oracle flow in prover.rs (LDE columns → tree →
cap → per-query leaf + path; OracleQuery::construct proof.rs:64). Leaf i of
a width-1 oracle holds one value per source poly at flat position i of the
(lde, n) bitreversed-coset layout; FRI oracles chunk 2^k consecutive flat
positions per leaf, c0 block then c1 block.
"""

from __future__ import annotations

import functools as _functools

import jax as _jax
import numpy as np

from ..field import goldilocks as gl
from ..utils.npgl import ORDER as npgl_ORDER
from ..hash.merkle import AlgebraicMerkleTree, BytesMerkleTree
from . import device
from .proof import OracleQuery


def build_tree(leaf_cols_u64: np.ndarray, cap_size: int, hasher: str):
    """leaf_cols_u64: (num_els_per_leaf, tree_size)."""
    if hasher in ("poseidon2", "poseidon"):
        return AlgebraicMerkleTree.from_leaf_columns(
            gl.from_u64(leaf_cols_u64), cap_size, hasher)
    return BytesMerkleTree.from_leaf_columns_u64(leaf_cols_u64, cap_size, hasher)


class CommittedOracle:
    """A set of committed base polys: host Lagrange columns -> device
    monomials + LDEs -> Merkle tree. ``polys`` order defines leaf layout."""

    def __init__(self, lagrange_cols_u64: np.ndarray, lde_factor: int,
                 cap_size: int, hasher: str, tree_lde: int = None):
        cols_dev = device.to_device_cols(lagrange_cols_u64)  # (n, k)
        monomials = device.cols_to_monomials(cols_dev)  # (n, k)
        self._init_from_monomials(monomials, lde_factor, cap_size, hasher,
                                  tree_lde)

    @classmethod
    def from_monomials(cls, monomials: "gl.GL", lde_factor: int, cap_size: int,
                       hasher: str, tree_lde: int = None):
        self = cls.__new__(cls)
        self._init_from_monomials(monomials, lde_factor, cap_size, hasher,
                                  tree_lde)
        return self

    def _init_from_monomials(self, monomials, lde_factor, cap_size, hasher,
                             tree_lde):
        self.n = monomials.shape[0]
        self.num_polys = monomials.shape[1]
        self.lde_factor = lde_factor
        # bitreversed coset enumeration: the first L blocks of a larger LDE
        # ARE the L-coset LDE, so the tree can hash a prefix subset
        self.tree_lde = tree_lde or lde_factor
        assert self.tree_lde <= lde_factor
        self.monomials = monomials
        self.monomials_host = device.from_device(monomials)  # (n, k)
        self.lde = device.monomials_to_lde(monomials, lde_factor)
        self.lde_host = np.stack(
            [device.from_device(self.lde[i]) for i in range(lde_factor)])
        tree_cols = self.lde_host[:self.tree_lde]
        self.tree = build_tree(
            tree_cols.transpose(2, 0, 1).reshape(self.num_polys, -1),
            cap_size, hasher)

    def get_cap(self):
        return self.tree.get_cap()

    def query(self, coset_idx: int, inner_idx: int) -> OracleQuery:
        leaf_idx = coset_idx * self.n + inner_idx
        leaf, path = self.tree.get_proof(leaf_idx)
        values = [int(self.lde_host[coset_idx, inner_idx, p])
                  for p in range(self.num_polys)]
        return OracleQuery(leaf_elements=values, proof=path)


class FlatOracle:
    """Oracle over flat (already folded) value arrays with 2^k-element leaf
    chunks: sources = [c0_flat, c1_flat] host u64 (FRI layers)."""

    def __init__(self, sources: list[np.ndarray], elems_per_leaf: int,
                 cap_size: int, hasher: str):
        self.sources = sources
        self.elems_per_leaf = elems_per_leaf
        size = sources[0].shape[0]
        tree_size = size // elems_per_leaf
        cols = np.concatenate(
            [s.reshape(tree_size, elems_per_leaf).T for s in sources], axis=0)
        self.tree = build_tree(cols, cap_size, hasher)

    @classmethod
    def from_parts(cls, sources, elems_per_leaf: int, tree):
        """Wrap an already-built tree (device FRI path)."""
        self = cls.__new__(cls)
        self.sources = sources
        self.elems_per_leaf = elems_per_leaf
        self.tree = tree
        return self

    def get_cap(self):
        return self.tree.get_cap()

    def query(self, flat_idx: int) -> OracleQuery:
        leaf_idx = flat_idx // self.elems_per_leaf
        leaf, path = self.tree.get_proof(leaf_idx)
        start = leaf_idx * self.elems_per_leaf
        values = []
        for s in self.sources:
            values.extend(int(x) for x in s[start:start + self.elems_per_leaf])
        return OracleQuery(leaf_elements=values, proof=path)


class _DeferredRows:
    """Placeholder for a query_many result whose host transfer rides a
    shared FetchCollector; ``.value`` is set at flush time."""
    value = None


@_functools.lru_cache(maxsize=None)
def _commit_jit(n: int, k: int, lde_factor: int, tree_lde: int,
                cap_size: int, hasher: str, from_lagrange: bool):
    """The WHOLE oracle commit as ONE program: [Lagrange -> monomials ->]
    LDE -> flat -> leaf columns -> every Merkle layer.

    Replaces the previous chain of ~7 eager device hops per oracle (reshape,
    slice, two transposes, rate-pad concats, per-phase dispatches) — each
    eager op is its own ~20-40 ms dispatch over the device tunnel, and the
    quotient oracle's chain alone cost ~0.4 s of the round-5 prove."""
    import jax
    import jax.numpy as jnp

    from ..ntt import ntt as _ntt
    from .device_merkle import (_leaf_hashes_traced, _node_layer_traced,
                                _pad_cols_to_rate)

    def f(cols_lo, cols_hi):
        cols = gl.GL(cols_lo, cols_hi)
        if from_lagrange:
            monos = device.cols_to_monomials(cols)
        else:
            monos = cols
        lde = device.monomials_to_lde(monos, lde_factor)  # (L, n, k)
        flat = lde.reshape(lde_factor * n, k)
        # the TRANSPOSED (k, L*n) flat is the canonical stored layout: the
        # Merkle leaf columns ARE its prefix, and every consumer that reads
        # per-poly columns (quotient sweeps, DEEP sources, query gathers)
        # reads contiguous rows instead of 128x-wasteful strided columns
        flat_t = gl.GL(flat.lo.T, flat.hi.T)
        leaf_cols = flat_t if tree_lde == lde_factor \
            else gl.GL(flat_t.lo[:, : tree_lde * n],
                       flat_t.hi[:, : tree_lde * n])
        outs = [monos.lo, monos.hi, flat_t.lo, flat_t.hi]
        if hasher in ("poseidon", "poseidon2"):
            cur = _leaf_hashes_traced(_pad_cols_to_rate(leaf_cols))
            outs.extend((cur.lo, cur.hi))
            while cur.lo.shape[1] > cap_size:
                cur = _node_layer_traced(cur)
                outs.extend((cur.lo, cur.hi))
        else:
            from ..hash.device_bytes_hash import LEAF_FNS, NODE_FNS
            cur = LEAF_FNS[hasher](leaf_cols)
            outs.append(cur)
            while cur.shape[1] > cap_size:
                cur = NODE_FNS[hasher](cur[:, 0::2], cur[:, 1::2])
                outs.append(cur)
        return tuple(outs)

    return _jax.jit(f)


def _use_fused_commit() -> bool:
    """One-program oracle commit on accelerators; XLA:CPU's compile of the
    merged LDE+tree graph is slow, and the CPU path has no dispatch-latency
    problem to solve (BOOJUM_FUSED_COMMIT=0/1 overrides)."""
    import os

    v = os.environ.get("BOOJUM_FUSED_COMMIT")
    if v is not None:
        return v == "1"
    return _jax.default_backend() not in ("cpu",)


class DeviceOracle:
    """Device-resident oracle: LDEs stay on device; the Merkle tree hashes
    device leaf columns (only hash layers cross to host); query values are
    gathered in one batched device call after indices are known.

    The TPU-path replacement for CommittedOracle (which pulls full LDEs to
    host — fine on the CPU dev backend, fatal over a device interconnect)."""

    def __init__(self, lagrange_cols_u64, lde_factor: int, cap_size: int,
                 hasher: str, tree_lde: int = None, monomials=None,
                 lagrange_dev=None):
        import os
        import time as _time

        import jax
        import jax.numpy as jnp

        timing = os.environ.get("BOOJUM_ORACLE_TIMING")
        _t = [_time.time()]

        def _mark(label, *arrs):
            if timing:
                import sys as _sys
                for a in arrs:
                    jax.block_until_ready(a)
                now = _time.time()
                print("[oracle] %-18s %.3fs" % (label, now - _t[0]),
                      file=_sys.stderr, flush=True)
                _t[0] = now

        assert hasher in ("poseidon", "poseidon2", "blake2s", "keccak256"), \
            hasher
        self.lagrange = None  # (n, k) device plain-domain values (when known)
        src = None
        from_lagrange = False
        if lagrange_dev is not None:
            # device-materialized witness (DeviceWitnessProgram): no upload
            self.lagrange = lagrange_dev
            src = lagrange_dev
            from_lagrange = True
        elif monomials is None:
            # packed upload: only a win over the device tunnel; on CPU the
            # reassembly gather is pure overhead
            up = (device.to_device_cols_packed
                  if jax.default_backend() != "cpu" else device.to_device_cols)
            cols_dev = up(lagrange_cols_u64)
            _mark("upload", cols_dev.lo)
            # retained so the prover can SLICE base-domain columns (witness
            # vars, sigmas, tables) instead of re-uploading them per prove —
            # the upload was the top stage-2 cost over the tunnel
            self.lagrange = cols_dev
            src = cols_dev
            from_lagrange = True
        else:
            src = monomials

        self.n = src.shape[0]
        self.num_polys = src.shape[1]
        self.lde_factor = lde_factor
        self.tree_lde = tree_lde or lde_factor
        assert self.tree_lde <= lde_factor

        if hasher != "poseidon" and _use_fused_commit():
            out = _commit_jit(self.n, self.num_polys, lde_factor,
                              self.tree_lde, cap_size, hasher,
                              from_lagrange)(src.lo, src.hi)
            self.monomials = gl.GL(out[0], out[1])
            self.flat_t = gl.GL(out[2], out[3])
            rest = out[4:]
            from .device_merkle import DeviceBytesTree, DeviceTree
            if hasher in ("poseidon", "poseidon2"):
                self.tree = DeviceTree(list(zip(rest[0::2], rest[1::2])))
            else:
                self.tree = DeviceBytesTree(list(rest), hasher)
            _mark("fused commit", self.flat_t.lo)
            return

        if from_lagrange:
            monomials = device.cols_to_monomials(src)
            _mark("monomials", monomials.lo)
        self.monomials = monomials  # (n, k) device
        lde = device.monomials_to_lde(monomials, lde_factor)  # (L, n, k)
        flat = lde.reshape(lde_factor * self.n, self.num_polys)
        self.flat_t = gl.GL(flat.lo.T, flat.hi.T)
        _mark("lde", self.flat_t.lo)
        leaf_cols = gl.GL(self.flat_t.lo[:, : self.tree_lde * self.n],
                          self.flat_t.hi[:, : self.tree_lde * self.n])
        from .device_merkle import build_any_device_tree
        self.tree = build_any_device_tree(leaf_cols, cap_size, hasher)
        _mark("tree", *(self.tree.layers[-1] if hasattr(self.tree, "layers")
                        else ()))

    def get_cap(self):
        return self.tree.get_cap()

    def query_many(self, flat_indices, collector=None) -> np.ndarray:
        """Gather leaf values for all queries at once -> (q, k) host u64.
        With ``collector`` the gather AND the host transfer ride the shared
        batched program; the returned object exposes the result as
        ``.value`` after ``collector.flush()``."""
        from .device_merkle import FetchCollector, _rows_gather_fn

        idx = np.asarray(flat_indices, np.int64)

        def combine(host):
            arr = np.asarray(host)
            return (arr[0].astype(np.uint64) |
                    (arr[1].astype(np.uint64) << np.uint64(32)))

        out = _DeferredRows()
        mini = collector or FetchCollector()
        from .device_merkle import _rows_gather_t_fn
        mini.add_gather(_rows_gather_t_fn,
                        (self.flat_t.lo, self.flat_t.hi, idx),
                        lambda h: setattr(out, "value", combine(h)))
        if collector is None:
            mini.flush()
            return out.value
        return out

    def query(self, coset_idx: int, inner_idx: int, cached_rows=None,
              row_pos: int = None) -> OracleQuery:
        leaf_idx = coset_idx * self.n + inner_idx
        leaf, path = self.tree.get_proof(leaf_idx)
        vals = cached_rows[row_pos]
        return OracleQuery(leaf_elements=[int(v) for v in vals], proof=path)

    def eval_monomials_at(self, z_pows_host) -> list:
        """Evaluate all polys at the ext point: f(z) = Σ cᵢ·zⁱ on device,
        processed in fixed column blocks; returns [(c0, c1), ...] host ints
        where the pair is (Σ cᵢ·(z^i)_c0, Σ cᵢ·(z^i)_c1)."""
        import jax.numpy as jnp

        zp0 = gl.from_u64(z_pows_host[0])
        zp1 = gl.from_u64(z_pows_host[1])
        f = _eval_jit(self.n)
        k = self.num_polys
        out = []
        B = device.COL_BLOCK
        for start in range(0, k, B):
            blk_lo = self.monomials.lo[:, start:start + B]
            blk_hi = self.monomials.hi[:, start:start + B]
            pad = B - blk_lo.shape[1]
            if pad:
                blk_lo = jnp.pad(blk_lo, ((0, 0), (0, pad)))
                blk_hi = jnp.pad(blk_hi, ((0, 0), (0, pad)))
            s0l, s0h = f(blk_lo, blk_hi, zp0.lo, zp0.hi)
            s1l, s1h = f(blk_lo, blk_hi, zp1.lo, zp1.hi)
            r0 = np.asarray(s0l, np.uint64) | (np.asarray(s0h, np.uint64) << np.uint64(32))
            r1 = np.asarray(s1l, np.uint64) | (np.asarray(s1h, np.uint64) << np.uint64(32))
            take = min(B, k - start)
            out.extend((int(r0[j]), int(r1[j])) for j in range(take))
        return out


@_functools.lru_cache(maxsize=None)
def _eval_jit(n):
    def f(mono_lo, mono_hi, zp_lo, zp_hi):
        mono = gl.GL(mono_lo, mono_hi)
        zp = gl.GL(zp_lo, zp_hi)
        prod = gl.mul(mono, gl.GL(zp.lo[:, None], zp.hi[:, None]))
        s = device._sum_gl(prod, axis=0)
        return s.lo, s.hi

    return _jax.jit(f)


@_functools.lru_cache(maxsize=None)
def _eval_many_at_points_jit(n, widths, point_ids):
    """One program: Σ cᵢ·zⁱ for SEVERAL monomial sets, each at the opening
    point ``point_ids[set]`` — the whole evals-at-z stage in a single
    dispatch.  The power table z^0..z^{n-1} is built ON DEVICE from the
    runtime 16-byte scalar (an associative scan of ext muls): the previous
    host-built table was ~1 MB per point over the ~8-10 MB/s tunnel."""
    import jax.numpy as jnp

    from ..field import extension as ext2
    from ..field.extension import GL2

    def f(points, *mono_args):
        pows = []
        for pi in range(int(np.max(point_ids)) + 1):
            pt = points[pi]
            base = GL2(gl.GL(jnp.broadcast_to(pt[0, 0], (n,)),
                             jnp.broadcast_to(pt[0, 1], (n,))),
                       gl.GL(jnp.broadcast_to(pt[1, 0], (n,)),
                             jnp.broadcast_to(pt[1, 1], (n,))))
            seeded = GL2(
                gl.GL(base.c0.lo.at[0].set(1), base.c0.hi.at[0].set(0)),
                gl.GL(base.c1.lo.at[0].set(0), base.c1.hi.at[0].set(0)))
            pows.append(_jax.lax.associative_scan(ext2.mul, seeded, axis=0))
        outs = []
        for si in range(len(widths)):
            mono = gl.GL(mono_args[2 * si], mono_args[2 * si + 1])
            zp = pows[point_ids[si]]
            for comp in (zp.c0, zp.c1):
                prod = gl.mul(mono, gl.GL(comp.lo[:, None], comp.hi[:, None]))
                s = device._sum_gl(prod, axis=0)
                outs.extend((s.lo, s.hi))
        return tuple(outs)

    return _jax.jit(f)


def eval_monomial_sets_at(sets, extra_fetch=()):
    """sets: list of (monomials GL (n, k), point) where ``point`` is an ext
    scalar (c0, c1) of host ints. Returns (results, extra_host): per set the
    list of k (c0, c1) host-int pairs, plus ``extra_fetch`` device arrays as
    numpy.  All sets evaluate in ONE dispatch and everything (results +
    extras) crosses to host in ONE device_get — per-array gets are full
    tunnel round-trips and cost ~0.8 s/prove here."""
    import jax
    import jax.numpy as jnp

    n = sets[0][0].shape[0]
    widths = tuple(m.shape[1] for (m, _) in sets)
    pts, pt_ids, seen = [], [], {}
    for (_, point) in sets:
        key = (int(point[0]) % npgl_ORDER, int(point[1]) % npgl_ORDER)
        if key not in seen:
            seen[key] = len(pts)
            pts.append(key)
        pt_ids.append(seen[key])
    pts_arr = np.zeros((len(pts), 2, 2), np.uint32)
    for i, (c0, c1) in enumerate(pts):
        pts_arr[i, 0] = (c0 & 0xFFFFFFFF, c0 >> 32)
        pts_arr[i, 1] = (c1 & 0xFFFFFFFF, c1 >> 32)
    args = []
    for (m, _) in sets:
        args.extend((m.lo, m.hi))
    out = _eval_many_at_points_jit(n, widths, tuple(pt_ids))(
        jnp.asarray(pts_arr), *args)
    host = jax.device_get(list(out) + list(extra_fetch))
    extra_host = [np.asarray(a) for a in host[len(out):]]
    results = []
    for i in range(0, 4 * len(widths), 4):
        s0l, s0h, s1l, s1h = host[i], host[i + 1], host[i + 2], host[i + 3]
        r0 = np.asarray(s0l, np.uint64) | (np.asarray(s0h, np.uint64)
                                           << np.uint64(32))
        r1 = np.asarray(s1l, np.uint64) | (np.asarray(s1h, np.uint64)
                                           << np.uint64(32))
        results.append([(int(a), int(b)) for a, b in zip(r0, r1)])
    return results, extra_host
