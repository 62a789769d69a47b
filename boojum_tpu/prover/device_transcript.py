"""Device-resident Fiat-Shamir transcript (algebraic sponge over Goldilocks).

Reference behavior: src/cs/implementations/transcript.rs
``AlgebraicSpongeBasedTranscript`` (:48) — EXACTLY the semantics of
transcript.AlgebraicTranscript, but the state, absorbed elements and drawn
challenges are DEVICE arrays. Rationale: each host<->device sync over the
axon tunnel costs ~31 ms and the protocol draws challenges ~10 times per
prove — with the transcript on device the whole prove submits as one async
chain and the host only syncs twice (the PoW/query handoff and the final
proof fetch).

Backend constraint that shapes this file: EAGER jnp ops cost ~20-40 ms each
over the tunnel (each is its own round-trippy dispatch), while cached-jit
calls cost ~0.4 ms. So the transcript NEVER runs an eager op: absorbed data
sits in a tagged piece list, and every flush / challenge extraction is a
single lru-cached jit keyed by the static piece signature.

Byte-identity: the permutation is the same exact jnp Poseidon/Poseidon2 code
used everywhere else; absorb/flush/pad order is structurally mirrored from
the host transcript (asserted byte-identical in tests, and transitively by
the device-transcript prove's byte-identical proofs).

`handoff_to_host()` fetches the sponge state + pending pieces ONCE and
reconstructs a host AlgebraicTranscript mid-stream, so the tail of the
protocol that inherently runs on host (PoW grinding, query-index bit
derivation) reuses the existing exact host code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import extension as ext2
from ..field.extension import GL2
from ..field.goldilocks import GL, ORDER
from ..hash.sponge import RATE, STATE_WIDTH

# buffer piece tags: how a piece linearizes into absorbed field elements
#   flat: (lo, hi) 1-D arrays, in order
#   capT: (lo, hi) (4, c) cap layer, node-major (column-major flatten)
#   ilv:  (lo0, hi0, lo1, hi1) 1-D pairs, interleaved v0c0, v0c1, v1c0, ...
FLAT, CAPT, ILV = "flat", "capT", "ilv"


def _perm_fn(kind: str):
    """1-lane transcript permutation: round loops UNROLLED — at batch 1 each
    fori_loop iteration is its own device kernel launch (~0.1 ms), so a
    rolled 30-round permutation costs ~4 ms and the evals-at-z absorb
    (~45 sequential permutations) measured 187 ms of the round-5 prove.
    Unrolled bodies fuse each permutation into a handful of kernels."""
    import functools as _ft

    if kind == "poseidon2":
        from ..hash.poseidon2 import _permutation_stacked
        return _ft.partial(_permutation_stacked, unroll=11)
    from ..hash.poseidon import _permutation_rolled_gl
    return _ft.partial(_permutation_rolled_gl, unroll=11)


def _linearize_traced(pieces):
    """Traced: tagged piece arrays -> (k,) lo/hi element streams."""
    los, his = [], []
    for piece in pieces:
        tag = piece[0]
        if tag == FLAT:
            los.append(piece[1].reshape(-1))
            his.append(piece[2].reshape(-1))
        elif tag == CAPT:
            los.append(piece[1].T.reshape(-1))
            his.append(piece[2].T.reshape(-1))
        else:  # ILV
            l0, h0, l1, h1 = piece[1:]
            los.append(jnp.stack([l0, l1], axis=1).reshape(-1))
            his.append(jnp.stack([h0, h1], axis=1).reshape(-1))
    return jnp.concatenate(los), jnp.concatenate(his)


def _piece_sig(piece):
    return (piece[0],) + tuple(a.shape for a in piece[1:])


@functools.lru_cache(maxsize=None)
def _flush_jit(kind: str, sig: tuple):
    """Linearize + rescue-prime pad + absorb (overwrite mode), ONE program
    per (transcript kind, piece signature)."""
    perm = _perm_fn(kind)

    def f(st_lo, st_hi, *arrays):
        pieces = []
        i = 0
        for s in sig:
            count = len(s) - 1
            pieces.append((s[0],) + tuple(arrays[i:i + count]))
            i += count
        lo, hi = _linearize_traced(pieces)
        nel = lo.shape[0]
        nblocks = -(-(nel + 1) // RATE)
        pad = nblocks * RATE - nel
        one = jnp.zeros((pad,), jnp.uint32).at[0].set(1)
        lo = jnp.concatenate([lo, one]).reshape(nblocks, RATE)
        hi = jnp.concatenate([hi, jnp.zeros((pad,), jnp.uint32)]
                             ).reshape(nblocks, RATE)

        def body(carry, xs):
            clo, chi = carry
            bl, bh = xs
            st = GL(jnp.concatenate([bl[:, None], clo[RATE:, None]], axis=0),
                    jnp.concatenate([bh[:, None], chi[RATE:, None]], axis=0))
            st = perm(st)
            return (st.lo[:, 0], st.hi[:, 0]), 0

        (olo, ohi), _ = jax.lax.scan(body, (st_lo, st_hi), (lo, hi))
        return olo, ohi

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _perm_jit(kind: str):
    perm = _perm_fn(kind)

    def f(st_lo, st_hi):
        st = perm(GL(st_lo[:, None], st_hi[:, None]))
        return st.lo[:, 0], st.hi[:, 0]

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _ext_extract_jit(pos: int):
    """state -> (2,2) ext challenge from rate positions pos, pos+1."""

    def f(lo, hi):
        return jnp.stack([jnp.stack([lo[pos], hi[pos]]),
                          jnp.stack([lo[pos + 1], hi[pos + 1]])])

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _ext_extract_cross_jit(kind: str):
    """c0 = state[7]; permute; c1 = new_state[0]. Returns new state too."""
    perm = _perm_fn(kind)

    def f(lo, hi):
        c0 = jnp.stack([lo[7], hi[7]])
        st = perm(GL(lo[:, None], hi[:, None]))
        nlo, nhi = st.lo[:, 0], st.hi[:, 0]
        return nlo, nhi, jnp.stack([c0, jnp.stack([nlo[0], nhi[0]])])

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _ext_pow_table_jit(count: int):
    """(2, 2) ext challenge -> (count, 2, 2) powers [1, c, c², ...]."""

    def f(ch):
        c = GL2(GL(ch[0, 0], ch[0, 1]), GL(ch[1, 0], ch[1, 1]))

        def body(carry, _):
            nxt = ext2.mul(carry, c)
            return nxt, jnp.stack(
                [jnp.stack([carry.c0.lo, carry.c0.hi]),
                 jnp.stack([carry.c1.lo, carry.c1.hi])])

        one = GL2(GL(jnp.uint32(1), jnp.uint32(0)),
                  GL(jnp.uint32(0), jnp.uint32(0)))
        _, rows = jax.lax.scan(body, one, None, length=count)
        return rows  # (count, 2, 2) u32

    return jax.jit(f)


def ext_pow_table_dev(ch, count: int):
    return _ext_pow_table_jit(count)(ch)


@functools.lru_cache(maxsize=None)
def _ext_mul_jit():
    def f(a, b):
        x = GL2(GL(a[0, 0], a[0, 1]), GL(a[1, 0], a[1, 1]))
        y = GL2(GL(b[0, 0], b[0, 1]), GL(b[1, 0], b[1, 1]))
        o = ext2.mul(x, y)
        return jnp.stack([jnp.stack([o.c0.lo, o.c0.hi]),
                          jnp.stack([o.c1.lo, o.c1.hi])])

    return jax.jit(f)


def ext_mul_dev(a, b):
    """(2,2)x(2,2) ext mul as one cached-jit dispatch."""
    return _ext_mul_jit()(a, b)


@functools.lru_cache(maxsize=None)
def _sq_chain_jit(k: int):
    """(2,2) ext challenge -> (k, 2, 2) squaring chain [c, c², c⁴, ...]
    (the per-FRI-round fold-challenge table)."""

    def f(ch):
        c = GL2(GL(ch[0, 0], ch[0, 1]), GL(ch[1, 0], ch[1, 1]))
        rows = []
        for _ in range(k):
            rows.append(jnp.stack([jnp.stack([c.c0.lo, c.c0.hi]),
                                   jnp.stack([c.c1.lo, c.c1.hi])]))
            c = ext2.mul(c, c)
        return jnp.stack(rows)

    return jax.jit(f)


def sq_chain_dev(ch, k: int):
    return _sq_chain_jit(k)(ch)


class DeviceTranscript:
    """Mirror of transcript.AlgebraicTranscript with device state."""

    IS_ALGEBRAIC = True
    IS_DEVICE = True

    def __init__(self, kind: str = "poseidon"):
        self.kind = kind
        z = np.zeros(STATE_WIDTH, np.uint32)
        self.state = (z, z)  # numpy until first flush (uploads at jit call)
        self.buffer: list = []  # tagged pieces
        self.buflen = 0
        self.avail_pos = RATE  # RATE = none available

    # -- absorb paths ------------------------------------------------------

    def witness_field_elements_dev(self, lo, hi):
        """Absorb a device/np (k,) u32-limb pair of CANONICAL elements."""
        assert lo.ndim == 1
        self.buffer.append((FLAT, lo, hi))
        self.buflen += int(lo.shape[0])

    def witness_field_elements(self, els):
        """Host-int absorb (public inputs etc.); the arrays upload as part
        of the next flush jit call (no eager transfer)."""
        arr = np.asarray([int(e) % ORDER for e in els], np.uint64)
        self.witness_field_elements_dev(
            (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (arr >> np.uint64(32)).astype(np.uint32))

    def witness_merkle_tree_cap_dev(self, cap: GL):
        """Absorb a device (4, cap_size) cap layer in the host order
        (node-major)."""
        self.buffer.append((CAPT, cap.lo, cap.hi))
        self.buflen += int(cap.lo.shape[0] * cap.lo.shape[1])

    def witness_merkle_tree_cap(self, cap):
        if isinstance(cap, GL):
            self.witness_merkle_tree_cap_dev(cap)
        else:
            for el in cap:
                self.witness_field_elements(el)

    def absorb_interleaved_dev(self, c0_lo, c0_hi, c1_lo, c1_hi):
        """Absorb ext values as v0.c0, v0.c1, v1.c0, ... (the evals-at-z
        absorb order) without an eager interleave."""
        self.buffer.append((ILV, c0_lo, c0_hi, c1_lo, c1_hi))
        self.buflen += 2 * int(c0_lo.shape[0])

    # -- challenge paths -----------------------------------------------------

    def _flush(self):
        sig = tuple(_piece_sig(p) for p in self.buffer)
        arrays = [a for p in self.buffer for a in p[1:]]
        self.state = _flush_jit(self.kind, sig)(*self.state, *arrays)
        self.buffer = []
        self.buflen = 0
        self.avail_pos = 0

    def get_ext_challenge(self):
        """Two consecutive base challenges -> (2, 2) u32 device array
        [[c0_lo, c0_hi], [c1_lo, c1_hi]] (the scalar_ext layout)."""
        if self.buflen:
            self._flush()
        if self.avail_pos >= RATE:
            self.state = _perm_jit(self.kind)(*self.state)
            self.avail_pos = 0
        if self.avail_pos <= RATE - 2:
            out = _ext_extract_jit(self.avail_pos)(*self.state)
            self.avail_pos += 2
            return out
        # one challenge left in this squeeze: cross the permutation
        lo, hi, out = _ext_extract_cross_jit(self.kind)(*self.state)
        self.state = (lo, hi)
        self.avail_pos = 1
        return out

    # -- handoff -------------------------------------------------------------

    def handoff_to_host(self):
        """ONE device fetch -> an exact host AlgebraicTranscript continuing
        from this point (for PoW grinding + query-index derivation)."""
        from ..transcript import AlgebraicTranscript

        fetch = [self.state]
        for p in self.buffer:
            fetch.append(tuple(p[1:]))
        host = jax.device_get(fetch)

        def u64(l, h):
            return (np.asarray(l, np.uint64)
                    | (np.asarray(h, np.uint64) << np.uint64(32)))

        out = AlgebraicTranscript(self.kind)
        st = u64(*host[0])
        out.state = [int(x) for x in st]
        buf = []
        for p, arrs in zip(self.buffer, host[1:]):
            tag = p[0]
            if tag == FLAT:
                buf.extend(int(x) for x in u64(arrs[0].reshape(-1),
                                               arrs[1].reshape(-1)))
            elif tag == CAPT:
                buf.extend(int(x) for x in u64(arrs[0], arrs[1]).T.reshape(-1))
            else:  # ILV
                v = u64(np.stack([arrs[0], arrs[2]], axis=1).reshape(-1),
                        np.stack([arrs[1], arrs[3]], axis=1).reshape(-1))
                buf.extend(int(x) for x in v)
        out.buffer = buf
        out.available = [int(x) for x in st[self.avail_pos:RATE]] \
            if self.avail_pos < RATE else []
        return out
