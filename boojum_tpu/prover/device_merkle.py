"""Single-dispatch device Merkle construction + device-resident FRI.

Reference behavior: oracle construction (src/cs/oracle/merkle_tree.rs:78-176)
and FRI folding (src/cs/implementations/fri/mod.rs:49,362). The reference
parallelizes leaves over CPU threads; here the WHOLE tree (leaf sponge
absorption + every node layer) is one traced XLA computation, so building an
oracle costs one device dispatch and one host transfer instead of one
dispatch per absorb-chunk per layer (which over the axon tunnel dominated
the prover's wall clock).

FRI folds likewise run on device: each schedule entry is one jitted call
doing all k sub-folds, with the challenge/coset squaring chains precomputed
host-side (tiny exact-int scalars) and fed in as (k, ...) tables.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import goldilocks as gl
from ..field.goldilocks import GL, ORDER, MULTIPLICATIVE_GENERATOR
from ..hash.merkle import AlgebraicMerkleTree
from ..hash.pallas_poseidon2 import permutation_stacked_fast
from ..ntt import ntt
from ..utils import npgl

RATE = 8
CAP = 4


def _leaf_hashes_traced(cols: GL) -> GL:
    """cols (k, m), k a multiple of 8 (caller pads) -> leaf hashes (4, m).

    The absorb loop over k/8 rate blocks is a lax.scan, so the traced graph
    holds ONE permutation body regardless of column count. (A fori_loop with
    dynamic_update_slice indexing compiled for ~10 minutes on the TPU
    backend; scan with concatenate compiles in seconds.)"""
    k, m = cols.shape
    assert k % RATE == 0
    nblocks = k // RATE
    blocks_lo = cols.lo.reshape(nblocks, RATE, m)
    blocks_hi = cols.hi.reshape(nblocks, RATE, m)

    def body(carry, xs):
        st_lo, st_hi = carry
        bl, bh = xs
        st_lo = jnp.concatenate([bl, st_lo[RATE:]], axis=0)
        st_hi = jnp.concatenate([bh, st_hi[RATE:]], axis=0)
        out = permutation_stacked_fast(GL(st_lo, st_hi))
        return (out.lo, out.hi), 0

    init = (jnp.zeros((12, m), jnp.uint32), jnp.zeros((12, m), jnp.uint32))
    (st_lo, st_hi), _ = jax.lax.scan(body, init, (blocks_lo, blocks_hi))
    return GL(st_lo[:CAP], st_hi[:CAP])


def _node_layer_traced(cur: GL) -> GL:
    """(4, m) -> (4, m/2): hash (left, right) sibling pairs."""
    m = cur.lo.shape[1]
    st = gl.zeros((12, m // 2))
    st_lo = st.lo.at[:CAP].set(cur.lo[:, 0::2]).at[CAP:RATE].set(cur.lo[:, 1::2])
    st_hi = st.hi.at[:CAP].set(cur.hi[:, 0::2]).at[CAP:RATE].set(cur.hi[:, 1::2])
    out = permutation_stacked_fast(GL(st_lo, st_hi))
    return GL(out.lo[:CAP], out.hi[:CAP])


@functools.lru_cache(maxsize=None)
def _leaf_jit(k_padded: int, m: int):
    def f(cols_lo, cols_hi):
        leaves = _leaf_hashes_traced(GL(cols_lo, cols_hi))
        return leaves.lo, leaves.hi

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _node_jit(m: int):
    """One node layer (4, m) -> (4, m/2); shared across every oracle and FRI
    stage with the same layer size (power-of-two sizes repeat heavily)."""

    def f(lo, hi):
        out = _node_layer_traced(GL(lo, hi))
        return out.lo, out.hi

    return jax.jit(f)


_TAIL_FUSE_SIZE = 1 << 12


def _full_fuse_size():
    """Trees at most this many leaves build as ONE dispatch (leaf hashing +
    every node layer in a single program). TPU only: XLA:CPU compile time on
    a 16-deep chain of unrolled Poseidon2 layers is pathological (minutes),
    while on TPU it compiles fast and removes a tunnel roundtrip per layer."""
    import jax
    return _TAIL_FUSE_SIZE if jax.default_backend() == "cpu" else (1 << 20)


@functools.lru_cache(maxsize=None)
def _tail_jit(m: int, cap_size: int):
    """All node layers from size m down to the cap in ONE dispatch — below
    ~2^12 nodes each layer is tiny, so per-layer dispatch latency over the
    tunnel dominates; the fused graph holds log2(m/cap) small perm bodies."""

    def f(lo, hi):
        outs = []
        cur = GL(lo, hi)
        while cur.lo.shape[1] > cap_size:
            cur = _node_layer_traced(cur)
            outs.extend((cur.lo, cur.hi))
        return tuple(outs)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _full_tree_jit(k: int, m: int, cap_size: int):
    """Leaf hashing + EVERY node layer in one program (small/medium trees —
    all FRI-layer oracles; saves one dispatch + tunnel roundtrip per
    layer)."""

    def f(lo, hi):
        leaves = _leaf_hashes_traced(GL(lo, hi))
        outs = [leaves.lo, leaves.hi]
        cur = leaves
        while cur.lo.shape[1] > cap_size:
            cur = _node_layer_traced(cur)
            outs.extend((cur.lo, cur.hi))
        return tuple(outs)

    return jax.jit(f)


def _pad_cols_to_rate(cols: GL):
    k, m = cols.shape
    pad = (-k) % RATE
    if pad:
        lo = jnp.concatenate([cols.lo, jnp.zeros((pad, m), jnp.uint32)])
        hi = jnp.concatenate([cols.hi, jnp.zeros((pad, m), jnp.uint32)])
        return GL(lo, hi)
    return cols


def _tree_from_leaf_cols(cols: GL, cap_size: int) -> "DeviceTree":
    cols = _pad_cols_to_rate(cols)
    k, m = cols.shape
    if m <= _full_fuse_size():
        out = _full_tree_jit(k, m, cap_size)(cols.lo, cols.hi)
        return DeviceTree(list(zip(out[0::2], out[1::2])))
    lo, hi = _leaf_jit(k, m)(cols.lo, cols.hi)
    layers = [(lo, hi)]
    cur_m = m
    while cur_m > max(_TAIL_FUSE_SIZE, cap_size):
        lo, hi = _node_jit(cur_m)(lo, hi)
        layers.append((lo, hi))
        cur_m //= 2
    if cur_m > cap_size:
        tail = _tail_jit(cur_m, cap_size)(lo, hi)
        layers.extend((tl, th) for tl, th in zip(tail[0::2], tail[1::2]))
    return DeviceTree(layers)


def build_device_tree(cols: GL, cap_size: int) -> "DeviceTree":
    """Poseidon2 Merkle-cap tree of device leaf columns (k, m): one rolled
    leaf-hash dispatch + one small dispatch per node layer (jits shared by
    size); layers stay in HBM — see DeviceTree."""
    return _tree_from_leaf_cols(cols, cap_size)


# ---------------------------------------------------------------------------
# Device byte-hash trees (Blake2s256 / Keccak-256)
# ---------------------------------------------------------------------------
# Reference: src/cs/oracle/mod.rs:179 (Blake2s256) / :247 (Keccak256) — the
# reference's actual flagship config (sha256_bench_non_recursive.sh) uses the
# Blake2s tree; these keep that config on the device prover instead of the
# host byte-tree fallback. Layers are (8, m) u32 digest word planes.


@functools.lru_cache(maxsize=None)
def _bytes_full_tree_jit(k: int, m: int, cap_size: int, algo: str):
    from ..hash.device_bytes_hash import LEAF_FNS, NODE_FNS
    leaf_fn, node_fn = LEAF_FNS[algo], NODE_FNS[algo]

    def f(lo, hi):
        cur = leaf_fn(GL(lo, hi))
        outs = [cur]
        while cur.shape[1] > cap_size:
            cur = node_fn(cur[:, 0::2], cur[:, 1::2])
            outs.append(cur)
        return tuple(outs)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _bytes_leaf_jit(k: int, m: int, algo: str):
    from ..hash.device_bytes_hash import LEAF_FNS
    leaf_fn = LEAF_FNS[algo]
    return jax.jit(lambda lo, hi: leaf_fn(GL(lo, hi)))


@functools.lru_cache(maxsize=None)
def _bytes_node_jit(m: int, algo: str):
    from ..hash.device_bytes_hash import NODE_FNS
    node_fn = NODE_FNS[algo]
    return jax.jit(lambda cur: node_fn(cur[:, 0::2], cur[:, 1::2]))


@functools.lru_cache(maxsize=None)
def _bytes_tail_jit(m: int, cap_size: int, algo: str):
    from ..hash.device_bytes_hash import NODE_FNS
    node_fn = NODE_FNS[algo]

    def f(cur):
        outs = []
        while cur.shape[1] > cap_size:
            cur = node_fn(cur[:, 0::2], cur[:, 1::2])
            outs.append(cur)
        return tuple(outs)

    return jax.jit(f)


def build_device_bytes_tree(cols: GL, cap_size: int,
                            algo: str) -> "DeviceBytesTree":
    """Blake2s/Keccak Merkle-cap tree of device leaf columns (k, m); digests
    bit-identical to the host BytesMerkleTree (hash/merkle.py:99).

    Unlike the Poseidon2 tree, big byte trees always take the SPLIT path
    (one leaf program per (k, m) + per-size node programs + a fused tail):
    a full-fuse byte tree is one ~50 s XLA compile PER ORACLE SHAPE, while
    the node programs here are shared by every oracle and FRI stage."""
    k, m = cols.shape
    if m <= _TAIL_FUSE_SIZE:
        layers = _bytes_full_tree_jit(k, m, cap_size, algo)(cols.lo, cols.hi)
        return DeviceBytesTree(list(layers), algo)
    cur = _bytes_leaf_jit(k, m, algo)(cols.lo, cols.hi)
    layers = [cur]
    cur_m = m
    while cur_m > max(_TAIL_FUSE_SIZE, cap_size):
        cur = _bytes_node_jit(cur_m, algo)(cur)
        layers.append(cur)
        cur_m //= 2
    if cur_m > cap_size:
        layers.extend(_bytes_tail_jit(cur_m, cap_size, algo)(cur))
    return DeviceBytesTree(layers, algo)


@functools.lru_cache(maxsize=None)
def _bytes_path_gather_fn(depth):
    """Sibling-path levels + own leaf digests of one byte tree:
    -> (depth+1, 8, nq) u32. ``leaves`` rides separately so depth-0 trees
    (leaf layer == cap) still gather their own leaf digests."""

    def f(idxs, leaves, *layers):
        outs = []
        for level in range(depth):
            sib = (idxs >> level) ^ 1
            src = leaves if level == 0 else layers[level - 1]
            outs.append(src[:, sib])
        outs.append(leaves[:, idxs])
        return jnp.stack(outs)

    f.gather_key = ("bpath", depth)
    return f


class DeviceBytesTree:
    """Byte-digest Merkle-cap tree whose layers stay on device; caps/paths
    cross to host as 32-byte digests (BytesMerkleTree interface)."""

    def __init__(self, layers, algo: str):
        self.layers = layers  # [(8, m) u32 device arrays], leaf..cap
        self.algo = algo
        self._cap_host = None
        self._path_cache = {}

    @staticmethod
    def _to_bytes(words):
        from ..hash.device_bytes_hash import digests_to_bytes
        return digests_to_bytes(np.asarray(words))

    def get_cap(self):
        if self._cap_host is None:
            self._cap_host = self._to_bytes(jax.device_get(self.layers[-1]))
        return self._cap_host

    def prefetch_cap(self, collector: "FetchCollector"):
        if self._cap_host is not None:
            return
        collector.add(self.layers[-1],
                      lambda h: setattr(self, "_cap_host", self._to_bytes(h)))

    def prefetch_proofs(self, leaf_indices, collector: "FetchCollector" = None):
        idxs = np.asarray(sorted(set(int(i) for i in leaf_indices)), np.int64)
        depth = len(self.layers) - 1  # path excludes the cap layer

        def ingest(host):
            arr = np.asarray(host)  # (depth+1, 8, nq)
            for qi, leaf_idx in enumerate(idxs):
                per_q = arr[:, :, qi]
                leaf = self._to_bytes(per_q[depth][:, None])[0]
                path = [self._to_bytes(per_q[level][:, None])[0]
                        for level in range(depth)]
                self._path_cache[int(leaf_idx)] = (leaf, path)

        mini = collector or FetchCollector()
        mini.add_gather(_bytes_path_gather_fn(depth),
                        (idxs, self.layers[0], *self.layers[1:depth]),
                        ingest)
        if collector is None:
            mini.flush()

    def get_proof(self, idx: int):
        if idx not in self._path_cache:
            self.prefetch_proofs([idx])
        return self._path_cache[int(idx)]


def build_any_device_tree(cols: GL, cap_size: int, hasher: str):
    """Dispatch: algebraic (poseidon2 fused / poseidon host-free) vs byte
    (blake2s / keccak256) device trees."""
    if hasher == "poseidon2":
        return build_device_tree(cols, cap_size)
    if hasher in ("blake2s", "keccak256"):
        return build_device_bytes_tree(cols, cap_size, hasher)
    return AlgebraicMerkleTree.from_leaf_columns(cols, cap_size, hasher)


# ---------------------------------------------------------------------------
# Device FRI
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _fold_jit(size: int, k: int):
    """k fold-by-2 steps over flat bitreversed ext arrays of length `size`.

    chs: (k, 2, 2) u32 — challenge (c0, c1) per sub-fold (pre-squared chain);
    cosets: (k, 2) u32 — coset_inv per sub-fold (pre-squared chain);
    roots: inverse-twiddle table of the CURRENT domain (size/2 entries) —
    its prefix serves every halved sub-domain.
    """

    def f(c0l, c0h, c1l, c1h, rl, rh, chs, cosets):
        c0 = GL(c0l, c0h)
        c1 = GL(c1l, c1h)
        for j in range(k):
            m = c0.lo.shape[0] // 2
            fx0, fmx0 = c0[0::2], c0[1::2]
            fx1, fmx1 = c1[0::2], c1[1::2]
            tw = gl.mul(GL(rl[:m], rh[:m]),
                        GL(cosets[j, 0][None], cosets[j, 1][None]))
            d0 = gl.mul(gl.sub(fx0, fmx0), tw)
            d1 = gl.mul(gl.sub(fx1, fmx1), tw)
            # ext mul (d0 + d1·x)·(ch0 + ch1·x), x² = 7
            e0 = GL(chs[j, 0, 0][None], chs[j, 0, 1][None])
            e1 = GL(chs[j, 1, 0][None], chs[j, 1, 1][None])
            v0 = gl.mul(d0, e0)
            v1 = gl.mul(d1, e1)
            m0 = gl.add(v0, gl.mul(v1, gl.from_u64(np.uint64(7))))
            t = gl.mul(gl.add(d0, d1), gl.add(e0, e1))
            m1 = gl.sub(gl.sub(t, v0), v1)
            c0 = gl.add(gl.add(fx0, fmx0), m0)
            c1 = gl.add(gl.add(fx1, fmx1), m1)
        return c0.lo, c0.hi, c1.lo, c1.hi

    return jax.jit(f)


def _u32x2(x: int):
    return np.array([x & 0xFFFFFFFF, x >> 32], np.uint32)


def _fold_traced(c0, c1, rl, rh, chs, cosets, k):
    """k fold-by-2 steps (same math as _fold_jit, shared tracing helper)."""
    for j in range(k):
        m = c0.lo.shape[0] // 2
        fx0, fmx0 = c0[0::2], c0[1::2]
        fx1, fmx1 = c1[0::2], c1[1::2]
        tw = gl.mul(GL(rl[:m], rh[:m]),
                    GL(cosets[j, 0][None], cosets[j, 1][None]))
        d0 = gl.mul(gl.sub(fx0, fmx0), tw)
        d1 = gl.mul(gl.sub(fx1, fmx1), tw)
        e0 = GL(chs[j, 0, 0][None], chs[j, 0, 1][None])
        e1 = GL(chs[j, 1, 0][None], chs[j, 1, 1][None])
        v0 = gl.mul(d0, e0)
        v1 = gl.mul(d1, e1)
        m0 = gl.add(v0, gl.mul(v1, gl.from_u64(np.uint64(7))))
        t = gl.mul(gl.add(d0, d1), gl.add(e0, e1))
        m1 = gl.sub(gl.sub(t, v0), v1)
        c0 = gl.add(gl.add(fx0, fmx0), m0)
        c1 = gl.add(gl.add(fx1, fmx1), m1)
    return c0, c1


@functools.lru_cache(maxsize=None)
def _fold_commit_jit(size: int, k_fold: int, k_leaf: int, cap_size: int,
                     hasher: str = "poseidon2"):
    """ONE program per FRI round: fold the previous layer by 2^k_fold, form
    the next oracle's leaf columns, hash leaves, and build every node layer.
    Output: folded (c0, c1) + all tree layers. Protocol sequencing forces a
    host sync per round (the cap feeds the transcript before the next
    challenges), so fusing everything between syncs minimizes roundtrips.
    Byte hashers (blake2s/keccak256) emit one (8, m) digest plane per
    layer instead of the (lo, hi) pairs of the algebraic tree."""

    def f(c0l, c0h, c1l, c1h, rl, rh, chs, cosets):
        c0, c1 = _fold_traced(GL(c0l, c0h), GL(c1l, c1h), rl, rh,
                              chs, cosets, k_fold)
        folded = size >> k_fold
        e = 1 << k_leaf
        tree_size = folded // e
        cols = GL(
            jnp.concatenate([c0.lo.reshape(tree_size, e).T,
                             c1.lo.reshape(tree_size, e).T], axis=0),
            jnp.concatenate([c0.hi.reshape(tree_size, e).T,
                             c1.hi.reshape(tree_size, e).T], axis=0))
        outs = [c0.lo, c0.hi, c1.lo, c1.hi]
        if hasher == "poseidon2":
            cols = _pad_cols_to_rate(cols)
            cur = _leaf_hashes_traced(cols)
            outs.extend((cur.lo, cur.hi))
            while cur.lo.shape[1] > cap_size:
                cur = _node_layer_traced(cur)
                outs.extend((cur.lo, cur.hi))
        else:
            from ..hash.device_bytes_hash import LEAF_FNS, NODE_FNS
            cur = LEAF_FNS[hasher](cols)
            outs.append(cur)
            while cur.shape[1] > cap_size:
                cur = NODE_FNS[hasher](cur[:, 0::2], cur[:, 1::2])
                outs.append(cur)
        return tuple(outs)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _fri_leaf_cols_jit(size: int, elems_per_leaf: int):
    """Reshape flat FRI layer (c0, c1) into leaf columns (2e, tree_size):
    leaf i = [c0 chunk i .. c1 chunk i]."""
    e = elems_per_leaf
    tree_size = size // e

    def f(c0l, c0h, c1l, c1h):
        cols_lo = jnp.concatenate([c0l.reshape(tree_size, e).T,
                                   c1l.reshape(tree_size, e).T], axis=0)
        cols_hi = jnp.concatenate([c0h.reshape(tree_size, e).T,
                                   c1h.reshape(tree_size, e).T], axis=0)
        return cols_lo, cols_hi

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _final_interp_jit(m: int, final_degree: int, coset: int):
    """Device FRI final interpolation: bitreversed coset evals (m,) ->
    monomials; returns the degree-truncated absorb slices + full arrays."""
    plan = ntt.get_plan(m.bit_length() - 1)

    def f(c0l, c0h, c1l, c1h):
        mono0 = ntt.coset_intt_cols(GL(c0l[:, None], c0h[:, None]),
                                    coset, plan)
        mono1 = ntt.coset_intt_cols(GL(c1l[:, None], c1h[:, None]),
                                    coset, plan)
        return (mono0.lo[:final_degree, 0], mono0.hi[:final_degree, 0],
                mono1.lo[:final_degree, 0], mono1.hi[:final_degree, 0],
                mono0.lo[:, 0], mono0.hi[:, 0],
                mono1.lo[:, 0], mono1.hi[:, 0])

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _inverse_roots_dev(full_size):
    """Device copy of the bitreversed inverse-root table — prove-invariant
    (host build + ~4 MB upload per prove otherwise)."""
    from .fri import _inverse_roots_bitreversed

    roots = _inverse_roots_bitreversed(full_size)
    return (jnp.asarray((roots & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((roots >> np.uint64(32)).astype(np.uint32)))


def do_fri_device(h_a, transcript, schedule: list[int], lde_factor: int,
                  cap_size: int, hasher: str, mesh=None, fuse=None,
                  verbose: bool = False):
    """Device-resident do_fri: with fuse, ONE program per schedule entry
    (fold + leaf hash + whole tree — the cap absorb forces a host sync per
    round anyway); bit-identical to fri.do_fri on the same input."""
    import sys as _sys
    import time as _time

    from .fri import FriResult, _inverse_roots_bitreversed

    _t = [_time.time()]

    def _v(label):
        if verbose:
            now = _time.time()
            print("[fri] %-28s %.3fs" % (label, now - _t[0]),
                  file=_sys.stderr, flush=True)
            _t[0] = now

    assert hasher in ("poseidon2", "blake2s", "keccak256"), \
        "device FRI requires a device-tree hasher"
    c0 = GL(h_a[0], h_a[1])
    c1 = GL(h_a[2], h_a[3])
    full_size = c0.lo.shape[0]
    result = FriResult()

    rl, rh = _inverse_roots_dev(full_size)
    coset_inv = pow(int(MULTIPLICATIVE_GENERATOR), ORDER - 2, ORDER)
    _v("roots+upload")

    def commit(cur0, cur1, k):
        size = cur0.lo.shape[0]
        cl, ch = _fri_leaf_cols_jit(size, 1 << k)(cur0.lo, cur0.hi,
                                                  cur1.lo, cur1.hi)
        if mesh is not None and size // (1 << k) >= mesh.devices.size \
                and hasher == "poseidon2":
            from ..parallel.sharding import build_sharded_tree
            tree = build_sharded_tree(mesh, GL(cl, ch), cap_size)
        else:
            tree = build_any_device_tree(GL(cl, ch), cap_size, hasher)
        return DeviceFlatOracle(cur0, cur1, 1 << k, tree)

    is_dev_ts = getattr(transcript, "IS_DEVICE", False)

    def absorb_cap(oracle):
        if is_dev_ts:
            from ..field.goldilocks import GL as _GL
            transcript.witness_merkle_tree_cap_dev(
                _GL(*oracle.tree.layers[-1]))
        else:
            transcript.witness_merkle_tree_cap(oracle.get_cap())

    def challenge_tables(k):
        """(k, 2, 2) challenge-squaring chain + (k, 2) coset-inv chain for
        the next fold; advances the cross-stage coset_inv chain."""
        nonlocal coset_inv
        cosets = np.zeros((k, 2), np.uint32)
        ci = coset_inv
        for j in range(k):
            cosets[j] = _u32x2(ci)
            ci = ci * ci % ORDER
        coset_inv = ci
        if is_dev_ts:
            from .device_transcript import sq_chain_dev
            chs = sq_chain_dev(transcript.get_ext_challenge(), k)
            return chs, jnp.asarray(cosets)
        ch0 = transcript.get_challenge()
        ch1 = transcript.get_challenge()
        chs = np.zeros((k, 2, 2), np.uint32)
        c = (ch0, ch1)
        for j in range(k):
            chs[j, 0] = _u32x2(c[0])
            chs[j, 1] = _u32x2(c[1])
            # square the ext challenge: (a+bx)² = a²+7b² + 2ab·x
            a, b = c
            c = ((a * a + 7 * b * b) % ORDER, 2 * a * b % ORDER)
        return jnp.asarray(chs), jnp.asarray(cosets)

    cur0, cur1 = c0, c1
    if fuse is None:
        fuse = jax.default_backend() != "cpu"
    # byte hashers: the fused fold+tree program is another ~30-50 s compile
    # per stage shape; their split trees share node programs instead
    fuse = fuse and mesh is None and hasher == "poseidon2"
    chs = cosets = None
    for stage, k in enumerate(schedule):
        if stage == 0 or not fuse:
            if stage > 0:
                size = cur0.lo.shape[0]
                o = _fold_jit(size, schedule[stage - 1])(
                    cur0.lo, cur0.hi, cur1.lo, cur1.hi, rl, rh, chs, cosets)
                cur0, cur1 = GL(o[0], o[1]), GL(o[2], o[3])
            oracle = commit(cur0, cur1, k)
        else:
            # one program: fold previous layer + hash + build this tree
            size = cur0.lo.shape[0]
            out = _fold_commit_jit(size, schedule[stage - 1], k, cap_size,
                                   hasher)(
                cur0.lo, cur0.hi, cur1.lo, cur1.hi, rl, rh, chs, cosets)
            cur0, cur1 = GL(out[0], out[1]), GL(out[2], out[3])
            if hasher == "poseidon2":
                tree = DeviceTree(list(zip(out[4::2], out[5::2])))
            else:
                tree = DeviceBytesTree(list(out[4:]), hasher)
            oracle = DeviceFlatOracle(cur0, cur1, 1 << k, tree)
        _v(f"stage {stage} dispatch")
        absorb_cap(oracle)
        _v(f"stage {stage} cap+absorb")
        if stage == 0:
            result.base_oracle = oracle
        else:
            result.intermediate_oracles.append(oracle)
        chs, cosets = challenge_tables(k)
        _v(f"stage {stage} challenges")
        result.intermediate_sources.append(None)

    # last stage's fold (the loop folds stage i inside stage i+1's program)
    size = cur0.lo.shape[0]
    o = _fold_jit(size, schedule[-1])(
        cur0.lo, cur0.hi, cur1.lo, cur1.hi, rl, rh, chs, cosets)
    cur0, cur1 = GL(o[0], o[1]), GL(o[2], o[3])
    _v("final fold")

    m = int(cur0.lo.shape[0])
    final_degree = m // lde_factor
    coset = int(npgl.inv(np.uint64(coset_inv)))
    if is_dev_ts:
        # final interpolation stays ON DEVICE so the async chain is unbroken
        # (the host-int variant below exists for the host-transcript path,
        # where a sync already happens here anyway)
        o = _final_interp_jit(m, final_degree, coset)(
            cur0.lo, cur0.hi, cur1.lo, cur1.hi)
        transcript.witness_field_elements_dev(o[0], o[1])
        transcript.witness_field_elements_dev(o[2], o[3])
        # device handles; prove() fetches them in the final proof batch and
        # asserts the degree bound there (o[4:] are the FULL coefficient
        # arrays for that check)
        result.monomial_forms = None
        result.monomial_forms_dev = (o[4], o[5], o[6], o[7], final_degree)
        _v("final interpolation (device)")
        return result

    # final interpolation on host (tiny)
    host = jax.device_get((cur0.lo, cur0.hi, cur1.lo, cur1.hi))
    _v("final download")
    f0 = np.asarray(host[0], np.uint64) | \
        (np.asarray(host[1], np.uint64) << np.uint64(32))
    f1 = np.asarray(host[2], np.uint64) | \
        (np.asarray(host[3], np.uint64) << np.uint64(32))
    from .fri import interpolate_final_host
    mono0 = np.asarray(interpolate_final_host(f0, coset), np.uint64)
    mono1 = np.asarray(interpolate_final_host(f1, coset), np.uint64)
    _v("final interpolation")
    assert not mono0[final_degree:].any(), "FRI final poly degree too high"
    assert not mono1[final_degree:].any(), "FRI final poly degree too high"
    transcript.witness_field_elements([int(x) for x in mono0[:final_degree]])
    transcript.witness_field_elements([int(x) for x in mono1[:final_degree]])
    result.monomial_forms = ([int(x) for x in mono0[:final_degree]],
                             [int(x) for x in mono1[:final_degree]])
    return result


class FetchCollector:
    """Batches every pending device-side gather AND device->host transfer of
    the query phase into ONE jitted dispatch + ONE ``jax.device_get``.

    Round-3 profiling: the query phase issued ~25 small gather dispatches
    (4 leaf-row gathers + 10 tree-path gathers + 6 FRI chunk gathers + value
    stacks) at ~20-40 ms tunnel latency each — 1.1 s of the 2.6 s prove.
    Entries registered with ``add_gather(fn, args, cb)`` run their traced
    gather INSIDE one shared jit program (cached per shape signature, so one
    compile serves every prove); ``add(arrays, cb)`` entries pass through
    unchanged. Callbacks receive the host values at ``flush()``."""

    def __init__(self):
        self._items = []

    def add(self, dev_arrays, callback):
        """Identity entry: fetch already-computed device arrays."""
        arrs = (tuple(dev_arrays) if isinstance(dev_arrays, (tuple, list))
                else (dev_arrays,))
        unwrap = not isinstance(dev_arrays, (tuple, list))
        self._items.append((None, arrs, callback, unwrap))

    def add_gather(self, fn, args, callback):
        """Deferred gather: ``fn(*args)`` runs inside the shared program.
        ``fn`` must carry a stable ``gather_key`` attribute (builders below
        are lru_cached, so identical keys imply identical fn objects)."""
        self._items.append((fn, tuple(args), callback, False))

    def flush(self):
        if not self._items:
            return
        key = tuple((getattr(fn, "gather_key", ("id", len(args))),
                     tuple((tuple(np.shape(a)), str(np.asarray(a).dtype)
                            if not hasattr(a, "dtype") else str(a.dtype))
                           for a in args))
                    for (fn, args, _, _) in self._items)
        entry = _COMBINED_GATHERS.get(key)
        if entry is None:
            fns = [fn for (fn, _, _, _) in self._items]
            counts = [len(args) for (_, args, _, _) in self._items]

            def combined(*flat):
                outs = []
                i = 0
                for fn, c in zip(fns, counts):
                    chunk = flat[i:i + c]
                    i += c
                    outs.append(fn(*chunk) if fn is not None else chunk)
                return tuple(outs)

            entry = jax.jit(combined)
            _COMBINED_GATHERS[key] = entry
        flat = [a for (_, args, _, _) in self._items for a in args]
        host = jax.device_get(entry(*flat))
        for (_, _, cb, unwrap), h in zip(self._items, host):
            cb(h[0] if unwrap else h)
        self._items = []


_COMBINED_GATHERS = {}


def _rows_gather_fn(lo, hi, idx):
    """Leaf-row gather for DeviceOracle.query_many: -> (2, q, k)."""
    return jnp.stack((lo[idx], hi[idx]))


_rows_gather_fn.gather_key = ("rows",)


def _rows_gather_t_fn(lo_t, hi_t, idx):
    """Leaf-row gather from the TRANSPOSED (k, L*n) flat: -> (2, q, k)."""
    return jnp.stack((lo_t[:, idx].T, hi_t[:, idx].T))


_rows_gather_t_fn.gather_key = ("rows_t",)


def _chunks_gather_fn(c0l, c0h, c1l, c1h, gidx):
    """FRI leaf-chunk gather: -> (4, q*e)."""
    return jnp.stack((c0l[gidx], c0h[gidx], c1l[gidx], c1h[gidx]))


_chunks_gather_fn.gather_key = ("chunks",)


@functools.lru_cache(maxsize=None)
def _path_gather_fn(depth):
    """All sibling-path levels + own leaves of one algebraic tree:
    (idxs, leaves_lo, leaves_hi, nodes_lo, nodes_hi, ...) ->
    (depth+1, 2, 4, nq) u32 (levels 0..depth-1 are siblings, last is own)."""

    def f(idxs, leaf_lo, leaf_hi, *layers):
        outs = []
        for level in range(depth):
            if level == 0:
                lo, hi = leaf_lo, leaf_hi
            else:
                lo, hi = layers[2 * (level - 1)], layers[2 * level - 1]
            sib = (idxs >> level) ^ 1
            outs.append(jnp.stack((lo[:, sib], hi[:, sib])))
        outs.append(jnp.stack((leaf_lo[:, idxs], leaf_hi[:, idxs])))
        return jnp.stack(outs)

    f.gather_key = ("path", depth)
    return f


class DeviceTree:
    """Merkle-cap tree whose layers STAY on device; only the cap crosses to
    host at commit time, and query paths cross as one small batched gather
    (the full layer stacks are ~30 MB per oracle — transferring them
    dominated the per-oracle wall clock over the tunnel).

    Mirrors AlgebraicMerkleTree's get_cap/get_proof interface."""

    def __init__(self, layers):
        # layers: [leaves (4, m), nodes (4, m/2), ..., cap (4, cap_size)]
        # as (lo, hi) device pairs
        self.layers = layers
        self._cap_host = None
        self._path_cache = {}

    @staticmethod
    def _cap_from_host(l, h):
        arr = np.asarray(l, np.uint64) | \
            (np.asarray(h, np.uint64) << np.uint64(32))
        return [tuple(int(arr[i, j]) for i in range(4))
                for j in range(arr.shape[1])]

    def get_cap(self):
        if self._cap_host is None:
            lo, hi = self.layers[-1]
            self._cap_host = self._cap_from_host(*jax.device_get((lo, hi)))
        return self._cap_host

    def prefetch_cap(self, collector: "FetchCollector"):
        """Ride the cap transfer on a shared batched device_get (the
        device-transcript path defers every host cap fetch to proof
        assembly)."""
        if self._cap_host is not None:
            return

        def ingest(host):
            self._cap_host = self._cap_from_host(host[0], host[1])

        collector.add(self.layers[-1], ingest)

    def prefetch_proofs(self, leaf_indices, collector: FetchCollector = None):
        """Gather every queried leaf + sibling path inside the collector's
        shared program (ONE dispatch + ONE device_get across all trees)."""
        idxs = np.asarray(sorted(set(int(i) for i in leaf_indices)), np.int64)
        depth = len(self.layers) - 1  # path excludes the cap layer
        flat_layers = []
        for level in range(1, depth):
            flat_layers.extend(self.layers[level])

        def ingest(host):
            arr = np.asarray(host)
            u64 = arr[:, 0].astype(np.uint64) | \
                (arr[:, 1].astype(np.uint64) << np.uint64(32))
            for qi, leaf_idx in enumerate(idxs):
                leaf = tuple(int(u64[depth, i, qi]) for i in range(4))
                path = [tuple(int(u64[level, i, qi]) for i in range(4))
                        for level in range(depth)]
                self._path_cache[int(leaf_idx)] = (leaf, path)

        mini = collector or FetchCollector()
        mini.add_gather(_path_gather_fn(depth),
                        (idxs, *self.layers[0], *flat_layers), ingest)
        if collector is None:
            mini.flush()

    def get_proof(self, idx: int):
        if idx not in self._path_cache:
            self.prefetch_proofs([idx])
        return self._path_cache[int(idx)]


class DeviceFlatOracle:
    """FRI-layer oracle whose flat sources and tree stay on device;
    query leaf chunks cross in one batched gather (FlatOracle interface)."""

    def __init__(self, c0, c1, elems_per_leaf: int, tree: DeviceTree):
        self.c0 = c0  # GL (size,)
        self.c1 = c1
        self.elems_per_leaf = elems_per_leaf
        self.tree = tree
        self._chunk_cache = {}

    def get_cap(self):
        return self.tree.get_cap()

    def prefetch(self, flat_indices, collector: FetchCollector = None):
        e = self.elems_per_leaf
        leaf_idxs = sorted(set(int(i) // e for i in flat_indices))
        mini = collector or FetchCollector()
        self.tree.prefetch_proofs(leaf_idxs, mini)
        starts = np.asarray(leaf_idxs, np.int64)[:, None] * e + \
            np.arange(e)[None, :]
        gidx = starts.reshape(-1)

        def ingest(host):
            outs = np.asarray(host)
            v0 = (outs[0].astype(np.uint64) |
                  (outs[1].astype(np.uint64) << np.uint64(32))).reshape(-1, e)
            v1 = (outs[2].astype(np.uint64) |
                  (outs[3].astype(np.uint64) << np.uint64(32))).reshape(-1, e)
            for row, li in enumerate(leaf_idxs):
                self._chunk_cache[li] = ([int(x) for x in v0[row]],
                                         [int(x) for x in v1[row]])

        mini.add_gather(_chunks_gather_fn,
                        (self.c0.lo, self.c0.hi, self.c1.lo, self.c1.hi,
                         gidx), ingest)
        if collector is None:
            mini.flush()

    def query(self, flat_idx: int):
        from .proof import OracleQuery
        leaf_idx = int(flat_idx) // self.elems_per_leaf
        if leaf_idx not in self._chunk_cache:
            self.prefetch([flat_idx])
        leaf, path = self.tree.get_proof(leaf_idx)
        s0, s1 = self._chunk_cache[leaf_idx]
        return OracleQuery(leaf_elements=s0 + s1, proof=path)
