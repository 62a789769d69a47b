"""Batched Blake2s-256 / Keccak-256 over device u32 word arrays.

Reference behavior: the byte tree hashers at src/cs/oracle/mod.rs:179
(Blake2s256) and :247 (Keccak256) — leaf input is the concatenation of the
leaf's field elements as little-endian u64 bytes, node input is
left_digest || right_digest (64 bytes). The reference runs these on CPU
threads; the reference's actual flagship bench config
(sha256_bench_non_recursive.sh) uses the Blake2s tree + transcript, so these
must be device-resident for the TPU prover to serve that config.

TPU design: both hashes are pure u32 add/xor/rotate/and — ideal VPU work.
A batch of B leaves is hashed as word-plane arrays of shape (W, B): word i
of every leaf lives in one (B,)-vector, so every op in the compression
function is a full-width vector op. Message blocks ride a lax.scan so the
traced graph holds ONE compression body regardless of leaf width.

Digests are (8, B) u32 word planes (the 32-byte digest as 8 little-endian
u32 words) — the byte-tree layer format.

Exactness: bit-identical to hashlib.blake2s / the host keccak256
(tests/test_device_bytes_tree.py checks leaf/node/tree digests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field.goldilocks import GL

# ---------------------------------------------------------------------------
# Blake2s
# ---------------------------------------------------------------------------

_B2S_IV = np.array([
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19], np.uint32)

# param block for unkeyed blake2s-256: digest_length=32, fanout=1, depth=1
_B2S_PARAM0 = np.uint32(0x01010020)

_SIGMA = (
    (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    (14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    (11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    (7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    (9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    (2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    (12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    (13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    (6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    (10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0),
)


def _ror(x, r):
    return (x >> jnp.uint32(r)) | (x << jnp.uint32(32 - r))


_SIGMA_ARR = np.asarray(_SIGMA, np.int32)  # (10, 16)


def _b2s_compress(h, msg, t, last_mask):
    """One Blake2s compression. h: list of 8 u32 arrays; msg: list of 16
    (all same shape); t: u32 byte counter; last_mask: 0 or 0xFFFFFFFF.

    The 10 rounds roll via fori_loop with the SIGMA message schedule as a
    per-round gather — an unrolled compression is 80 G bodies, and a tree
    program holds one compression per node layer, which pushed XLA compile
    of a 2^19-leaf tree to ~70 s on the TPU backend (rolled: a few s)."""
    shape = h[0].shape
    v = jnp.stack(list(h) + [jnp.broadcast_to(jnp.uint32(c), shape)
                             for c in _B2S_IV])
    v = v.at[12].set(v[12] ^ t)
    v = v.at[14].set(v[14] ^ last_mask)
    msg_stack = jnp.stack(list(msg))  # (16, ...)
    sig = jnp.asarray(_SIGMA_ARR)

    def one_round(r, v):
        m = jnp.take(msg_stack, sig[r], axis=0)

        def g(v, a, b, c, d, mx, my):
            va, vb, vc, vd = v[a], v[b], v[c], v[d]
            va = va + vb + mx
            vd = _ror(vd ^ va, 16)
            vc = vc + vd
            vb = _ror(vb ^ vc, 12)
            va = va + vb + my
            vd = _ror(vd ^ va, 8)
            vc = vc + vd
            vb = _ror(vb ^ vc, 7)
            return v.at[a].set(va).at[b].set(vb).at[c].set(vc).at[d].set(vd)

        v = g(v, 0, 4, 8, 12, m[0], m[1])
        v = g(v, 1, 5, 9, 13, m[2], m[3])
        v = g(v, 2, 6, 10, 14, m[4], m[5])
        v = g(v, 3, 7, 11, 15, m[6], m[7])
        v = g(v, 0, 5, 10, 15, m[8], m[9])
        v = g(v, 1, 6, 11, 12, m[10], m[11])
        v = g(v, 2, 7, 8, 13, m[12], m[13])
        v = g(v, 3, 4, 9, 14, m[14], m[15])
        return v

    v = jax.lax.fori_loop(0, 10, one_round, v)
    return [h[i] ^ v[i] ^ v[i + 8] for i in range(8)]


def _b2s_h0(shape):
    h = [jnp.broadcast_to(jnp.uint32(c), shape) for c in _B2S_IV]
    h[0] = h[0] ^ _B2S_PARAM0
    return h


def _interleave_words(cols: GL) -> jnp.ndarray:
    """(k, m) GL -> (2k, m) u32 message-word planes (LE u64 per element)."""
    return jnp.stack([cols.lo, cols.hi], axis=1).reshape(
        2 * cols.lo.shape[0], cols.lo.shape[1])


def blake2s_leaves_traced(cols: GL) -> jnp.ndarray:
    """cols (k, m) -> (8, m) digest word planes: blake2s(leaf bytes) where
    leaf bytes = k little-endian u64 values (src/cs/oracle/mod.rs:179)."""
    k, m = cols.shape
    words = _interleave_words(cols)  # (2k, m)
    total_bytes = 8 * k
    nb = -(-2 * k // 16)
    pad = 16 * nb - 2 * k
    if pad:
        words = jnp.concatenate(
            [words, jnp.zeros((pad, m), jnp.uint32)], axis=0)
    blocks = words.reshape(nb, 16, m)
    ts = np.minimum((np.arange(1, nb + 1) * 64), total_bytes).astype(np.uint32)
    lasts = np.zeros(nb, np.uint32)
    lasts[-1] = 0xFFFFFFFF

    def body(h, xs):
        blk, t, last = xs
        h = _b2s_compress(h, [blk[i] for i in range(16)], t, last)
        return h, 0

    h, _ = jax.lax.scan(body, _b2s_h0((m,)),
                        (blocks, jnp.asarray(ts), jnp.asarray(lasts)))
    return jnp.stack(h)


def blake2s_nodes_traced(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """(8, m) x2 -> (8, m): blake2s(left_digest || right_digest)."""
    msg = [left[i] for i in range(8)] + [right[i] for i in range(8)]
    h = _b2s_compress(_b2s_h0(left[0].shape), msg, jnp.uint32(64),
                      jnp.uint32(0xFFFFFFFF))
    return jnp.stack(h)


# ---------------------------------------------------------------------------
# Keccak-256 (legacy 0x01 padding — Ethereum-style, see hash/keccak.py)
# ---------------------------------------------------------------------------

_K_ROT = np.zeros((5, 5), np.int32)
for _x in range(5):
    for _y in range(5):
        _K_ROT[_x, _y] = __import__(
            "boojum_tpu.hash.keccak", fromlist=["x"])._ROT[_x][_y]

_K_RC = __import__("boojum_tpu.hash.keccak", fromlist=["x"])._RC
_K_RC_LO = np.asarray([c & 0xFFFFFFFF for c in _K_RC], np.uint32)
_K_RC_HI = np.asarray([c >> 32 for c in _K_RC], np.uint32)

_RATE_LANES = 17  # 136-byte rate


def _rol64(lo, hi, s):
    """Rotate a (lo, hi) u32 pair left by static s in [0, 64)."""
    s %= 64
    if s == 0:
        return lo, hi
    if s == 32:
        return hi, lo
    if s < 32:
        return ((lo << jnp.uint32(s)) | (hi >> jnp.uint32(32 - s)),
                (hi << jnp.uint32(s)) | (lo >> jnp.uint32(32 - s)))
    s -= 32
    return ((hi << jnp.uint32(s)) | (lo >> jnp.uint32(32 - s)),
            (lo << jnp.uint32(s)) | (hi >> jnp.uint32(32 - s)))


def _keccak_f(st):
    """st: dict (x, y) -> (lo, hi). Rounds roll via fori_loop (only the iota
    constant differs per round), keeping the traced graph one round deep."""
    rc_lo = jnp.asarray(_K_RC_LO)
    rc_hi = jnp.asarray(_K_RC_HI)
    shape = st[(0, 0)][0].shape

    flat = jnp.stack([st[(x, y)][limb]
                      for x in range(5) for y in range(5)
                      for limb in range(2)])

    def one_round(rnd, flat):
        def get(x, y):
            i = 2 * (5 * x + y)
            return flat[i], flat[i + 1]

        lanes = {(x, y): get(x, y) for x in range(5) for y in range(5)}
        # theta
        c = []
        for x in range(5):
            lo = lanes[(x, 0)][0]
            hi = lanes[(x, 0)][1]
            for y in range(1, 5):
                lo = lo ^ lanes[(x, y)][0]
                hi = hi ^ lanes[(x, y)][1]
            c.append((lo, hi))
        d = []
        for x in range(5):
            r_lo, r_hi = _rol64(*c[(x + 1) % 5], 1)
            d.append((c[(x - 1) % 5][0] ^ r_lo, c[(x - 1) % 5][1] ^ r_hi))
        for x in range(5):
            for y in range(5):
                lo, hi = lanes[(x, y)]
                lanes[(x, y)] = (lo ^ d[x][0], hi ^ d[x][1])
        # rho + pi
        b = {}
        for x in range(5):
            for y in range(5):
                b[(y, (2 * x + 3 * y) % 5)] = _rol64(
                    *lanes[(x, y)], int(_K_ROT[x, y]))
        # chi
        for x in range(5):
            for y in range(5):
                b0 = b[(x, y)]
                b1 = b[((x + 1) % 5, y)]
                b2 = b[((x + 2) % 5, y)]
                lanes[(x, y)] = (b0[0] ^ (~b1[0] & b2[0]),
                                 b0[1] ^ (~b1[1] & b2[1]))
        # iota
        lo, hi = lanes[(0, 0)]
        lanes[(0, 0)] = (lo ^ jnp.broadcast_to(rc_lo[rnd], shape),
                         hi ^ jnp.broadcast_to(rc_hi[rnd], shape))
        return jnp.stack([lanes[(x, y)][limb]
                          for x in range(5) for y in range(5)
                          for limb in range(2)])

    flat = jax.lax.fori_loop(0, 24, one_round, flat)
    return {(x, y): (flat[2 * (5 * x + y)], flat[2 * (5 * x + y) + 1])
            for x in range(5) for y in range(5)}


def _keccak_absorb_blocks(blocks: jnp.ndarray) -> jnp.ndarray:
    """blocks (nb, 34, m) u32 (17 lanes x 2 limbs, already padded) ->
    (8, m) digest word planes."""
    nb, _, m = blocks.shape

    def body(flat, blk):
        st = {}
        for x in range(5):
            for y in range(5):
                i = 2 * (5 * x + y)
                li = 5 * y + x  # byte-lane order: lane i -> (x=i%5, y=i//5)
                lo, hi = flat[i], flat[i + 1]
                if li < _RATE_LANES:
                    lo = lo ^ blk[2 * li]
                    hi = hi ^ blk[2 * li + 1]
                st[(x, y)] = (lo, hi)
        st = _keccak_f(st)
        out = jnp.stack([st[(x, y)][limb]
                         for x in range(5) for y in range(5)
                         for limb in range(2)])
        return out, 0

    init = jnp.zeros((50, m), jnp.uint32)
    flat, _ = jax.lax.scan(body, init, blocks)

    # digest = lanes 0..3 (x = i % 5, y = i // 5) as LE words
    outs = []
    for i in range(4):
        x, y = i % 5, i // 5
        j = 2 * (5 * x + y)
        outs.extend((flat[j], flat[j + 1]))
    return jnp.stack(outs)


def _keccak_pad_words(words: jnp.ndarray, total_bytes: int) -> jnp.ndarray:
    """Zero-extend (W, m) message words to whole 136-byte blocks and inject
    the legacy 0x01 ... 0x80 padding (total_bytes % 4 == 0 always here)."""
    W, m = words.shape
    assert total_bytes == 4 * W
    pad_len = 136 - (total_bytes % 136)
    padded_words = (total_bytes + pad_len) // 4
    ext = jnp.concatenate(
        [words, jnp.zeros((padded_words - W, m), jnp.uint32)], axis=0)
    # 0x01 at byte `total_bytes` (low byte of word W); 0x80 at the last byte
    first = np.zeros(padded_words, np.uint32)
    first[W] ^= 0x01
    first[padded_words - 1] ^= 0x80000000
    return ext ^ jnp.asarray(first)[:, None]


def keccak_leaves_traced(cols: GL) -> jnp.ndarray:
    """cols (k, m) -> (8, m) keccak-256 digest word planes (leaf bytes = k
    LE u64 values; src/cs/oracle/mod.rs:247)."""
    k, m = cols.shape
    words = _keccak_pad_words(_interleave_words(cols), 8 * k)
    blocks = words.reshape(-1, 34, m)
    return _keccak_absorb_blocks(blocks)


def keccak_nodes_traced(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    """(8, m) x2 -> (8, m): keccak256(left || right) — 64 bytes, one block."""
    words = jnp.concatenate([left, right], axis=0)
    padded = _keccak_pad_words(words, 64)
    return _keccak_absorb_blocks(padded.reshape(1, 34, padded.shape[1]))


LEAF_FNS = {"blake2s": blake2s_leaves_traced,
            "keccak256": keccak_leaves_traced}
NODE_FNS = {"blake2s": blake2s_nodes_traced,
            "keccak256": keccak_nodes_traced}


def digests_to_bytes(words: np.ndarray) -> list[bytes]:
    """(8, m) u32 host word planes -> m 32-byte digests."""
    le = np.ascontiguousarray(words.T.astype("<u4"))
    raw = le.tobytes()
    return [raw[32 * i:32 * (i + 1)] for i in range(le.shape[0])]
