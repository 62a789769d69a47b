"""SHA-256 circuit gadget — the flagship benchmark circuit.

Reference behavior: src/gadgets/sha256/mod.rs (:35 padding/blocks/digest) and
round_function.rs — 32-bit words as variables, bitwise ops through 4-bit
chunked lookups (TriXor4 / Ch4 / Maj4), rotations via the
split-at-(r mod 4) decomposition with a Split4BitChunk seam lookup, mod-2^32
additions as free-width field sums range-reduced through 36-bit decomposition
(range_check_36 / split_36_unchecked), deferred 4-bit range checks flushed in
triples through TriXor lookups.

The circuit semantics match the reference; the synthesis is batched where a
step has independent parts (all 8 chunks of a word hit the lookup argument in
one enforce_lookup_batch; deferred range checks flush as one batch).
"""

from __future__ import annotations

import numpy as np

from ..cs.cs import ConstraintSystem
from ..cs.gates import ConstantsAllocatorGate, FmaGate, ReductionGate
from . import tables

SHA256_ROUNDS = 64
SHA256_BLOCK_SIZE = 64
SHA256_DIGEST_SIZE = 32

INITIAL_STATE = [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
                 0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19]

ROUND_CONSTANTS = [
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2]

_MASK4 = 0xF


def add_sha256_tables(cs: ConstraintSystem) -> dict:
    """Add the five bench tables in the reference's order (sha256/mod.rs:388)."""
    ids = {}
    ids["tri_xor"] = cs.add_lookup_table(tables.create_tri_xor_table())
    ids["ch"] = cs.add_lookup_table(tables.create_ch4_table())
    ids["maj"] = cs.add_lookup_table(tables.create_maj4_table())
    ids["split1"] = cs.add_lookup_table(tables.create_4bit_chunk_split_table(1))
    ids["split2"] = cs.add_lookup_table(tables.create_4bit_chunk_split_table(2))
    return ids


class Sha256Gadget:
    def __init__(self, cs: ConstraintSystem, table_ids: dict):
        self.cs = cs
        self.t = table_ids
        self._const_cache = {}
        # value-handle -> 4-bit chunk handles, so words whose decomposition
        # already exists (rotated state words, range-check outputs) are not
        # re-decomposed each round (the reference caches via its
        # decomposition tooling, u32/mod.rs:96)
        self._chunk_cache = {}

    # -- small helpers ------------------------------------------------------

    def constant(self, v: int) -> int:
        return ConstantsAllocatorGate.allocate_constant(self.cs, v)

    def _tri_xor_batch(self, a, b, c):
        """a, b, c: (k,) handle arrays -> xor handle array; performs the
        lookup which also range-checks all inputs to 4 bits."""
        cs = self.cs
        a = np.asarray(a, np.uint64)
        b = np.asarray(b, np.uint64)
        c = np.asarray(c, np.uint64)
        out = cs.alloc_variables(a.shape[0])

        def fn(vals):
            return vals[0] ^ vals[1] ^ vals[2]

        cs.set_values_with_dependencies(np.stack([a, b, c]), out, fn)
        cs.enforce_lookup_batch(self.t["tri_xor"], np.stack([a, b, c, out]))
        return out

    def _table3_batch(self, tid, a, b, c, np_fn):
        cs = self.cs
        a = np.asarray(a, np.uint64)
        out = cs.alloc_variables(a.shape[0])
        cs.set_values_with_dependencies(
            np.stack([a, np.asarray(b, np.uint64), np.asarray(c, np.uint64)]),
            out, np_fn)
        cs.enforce_lookup_batch(tid, np.stack([a, b, c, out]))
        return out

    def ch_batch(self, a, b, c):
        return self._table3_batch(
            self.t["ch"], a, b, c,
            lambda v: ((v[0] & v[1]) ^ ((~v[0]) & v[2])) & np.uint64(_MASK4))

    def maj_batch(self, a, b, c):
        return self._table3_batch(
            self.t["maj"], a, b, c,
            lambda v: (v[0] & v[1]) ^ (v[0] & v[2]) ^ (v[1] & v[2]))

    def range_check_chunks(self, chunks):
        """Range-check a list of 4-bit chunk handles in triples via TriXor
        lookups (reference's deferred-check flush)."""
        zero = self.constant(0)
        chunks = list(chunks)
        while len(chunks) % 3:
            chunks.append(zero)
        arr = np.asarray(chunks, np.uint64).reshape(-1, 3).T
        self._tri_xor_batch(arr[0], arr[1], arr[2])

    # -- decompositions -----------------------------------------------------

    def uint32_into_4bit_chunks(self, v: int) -> np.ndarray:
        cached = self._chunk_cache.get(int(v))
        if cached is not None:
            return cached
        cs = self.cs
        chunks = cs.alloc_variables(8)

        def fn(vals):
            x = vals[0, 0]
            return np.asarray([(int(x) >> (4 * i)) & _MASK4 for i in range(8)],
                              np.uint64)

        cs.set_values_with_dependencies(
            np.asarray([[v]], np.uint64), chunks, fn)
        self._constrain_chunk_recomposition(v, chunks)
        self._chunk_cache[int(v)] = chunks
        return chunks

    def _constrain_chunk_recomposition(self, v: int, chunks):
        """v == Σ chunks[i]·16^i via two reductions + one fma."""
        cs = self.cs
        c16 = [1, 1 << 4, 1 << 8, 1 << 12]
        low = ReductionGate.reduce_terms(cs, c16, list(chunks[:4]))
        high = ReductionGate.reduce_terms(cs, c16, list(chunks[4:8]))
        one = self.constant(1)
        FmaGate.enforce_fma_batch(cs, 1 << 16, ([one], [high]), 1, [low], [v])

    def uint32_from_4bit_chunks(self, chunks) -> int:
        return int(self.uint32_from_4bit_chunks_batch(
            np.asarray(chunks, np.uint64)[None, :])[0])

    def uint32_from_4bit_chunks_batch(self, chunks_2d) -> np.ndarray:
        """(n, 8) chunk handles -> (n,) u32 handles, batched reductions."""
        cs = self.cs
        chunks_2d = np.asarray(chunks_2d, np.uint64)
        c16 = [1, 1 << 4, 1 << 8, 1 << 12]
        low = ReductionGate.reduce_terms_batch(cs, c16, chunks_2d[:, :4].T)
        high = ReductionGate.reduce_terms_batch(cs, c16, chunks_2d[:, 4:8].T)
        one = self.constant(1)
        ones = np.full(low.shape[0], one, np.uint64)
        out = FmaGate.compute_fma_batch(cs, 1 << 16, (ones, high), 1, low)
        for i in range(out.shape[0]):
            self._chunk_cache[int(out[i])] = chunks_2d[i]
        return out

    def split_and_rotate(self, v: int, rotation: int):
        """Right-rotation by ``rotation``: returns (rotated 8 chunks,
        decompose_low, decompose_high). Chunks are range-checked by their
        later lookup uses; the seam (low, high) pair is bound and checked by
        a Split4BitChunk lookup (reference round_function.rs:414)."""
        cs = self.cs
        m = rotation % 4
        k = rotation // 4
        if m == 0:
            chunks = self.uint32_into_4bit_chunks(v)
            rotated = np.roll(chunks, -k)
            # low/high pieces for shift tricks: not meaningful here
            zero = self.constant(0)
            return rotated, zero, zero

        # decompose: low (m bits), 7 aligned 4-bit chunks, high (4-m bits)
        parts = cs.alloc_variables(9)

        def fn(vals):
            x = int(vals[0, 0])
            out = [x & ((1 << m) - 1)]
            x >>= m
            for _ in range(7):
                out.append(x & _MASK4)
                x >>= 4
            out.append(x)
            return np.asarray(out, np.uint64)

        cs.set_values_with_dependencies(np.asarray([[v]], np.uint64), parts, fn)
        low, aligned, high = int(parts[0]), parts[1:8], int(parts[8])

        # recomposition: v == low + Σ aligned[i]·2^{m+4i} + high·2^{m+28}
        t = ReductionGate.reduce_terms(
            cs, [1, 1 << m, 1 << (m + 4), 1 << (m + 8)],
            [low, int(aligned[0]), int(aligned[1]), int(aligned[2])])
        t = ReductionGate.reduce_terms(
            cs, [1, 1 << (m + 12), 1 << (m + 16), 1 << (m + 20)],
            [t, int(aligned[3]), int(aligned[4]), int(aligned[5])])
        zero = self.constant(0)
        t2 = ReductionGate.reduce_terms(
            cs, [1, 1 << (m + 24), 1 << (m + 28), 0],
            [t, int(aligned[6]), high, zero])
        # t2 must equal v
        one = self.constant(1)
        FmaGate.enforce_fma_batch(cs, 1, ([one], [t2]), 0, [zero], [v])

        # seam chunk: merged original-order a = high<<m | low; rotated-order
        # seam = low<<(4-m) | high. Split tables exist for m in {1, 2}; m == 3
        # uses the symmetric table with (low, high) roles swapped.
        seam_key = cs.alloc_variables(1)
        seam_rev = cs.alloc_variables(1)

        if m in (1, 2):
            tid = self.t[f"split{m}"]

            def seam_fn(vals):
                lo, hi = int(vals[0, 0]), int(vals[1, 0])
                key = (hi << m) | lo
                rev = (lo << (4 - m)) | hi
                return np.asarray([key, rev], np.uint64)

            cs.set_values_with_dependencies(
                np.asarray([[low], [high]], np.uint64),
                np.concatenate([seam_key, seam_rev]), seam_fn)
            cs.enforce_lookup_batch(
                tid, np.asarray([[int(seam_key[0])], [low], [high],
                                 [int(seam_rev[0])]], np.uint64))
            seam = int(seam_rev[0])
        else:  # m == 3: use split-at-1 on the rotated-order value
            tid = self.t["split1"]

            def seam_fn(vals):
                lo, hi = int(vals[0, 0]), int(vals[1, 0])
                key = (lo << 1) | hi  # rotated-order value, split at 1
                rev = (hi << 3) | lo  # original-order value
                return np.asarray([key, rev], np.uint64)

            cs.set_values_with_dependencies(
                np.asarray([[low], [high]], np.uint64),
                np.concatenate([seam_key, seam_rev]), seam_fn)
            # table: key -> (key&1, key>>1, (key&1)<<3 | key>>1)
            #        = (high, low, original-order merge)
            cs.enforce_lookup_batch(
                tid, np.asarray([[int(seam_key[0])], [high], [low],
                                 [int(seam_rev[0])]], np.uint64))
            seam = int(seam_key[0])

        # rotated chunks: [aligned[k..7], seam, aligned[0..k]]
        rotated = np.empty(8, np.uint64)
        for i in range(7 - k):
            rotated[i] = aligned[k + i]
        rotated[7 - k] = seam
        for i in range(k):
            rotated[8 - k + i] = aligned[i]
        return rotated, low, high

    def split_36_unchecked(self, v: int):
        """v (< 2^36) == low_u32 + high·2^32; high returned unchecked."""
        cs = self.cs
        parts = cs.alloc_variables(2)

        def fn(vals):
            x = int(vals[0, 0])
            return np.asarray([x & 0xFFFFFFFF, x >> 32], np.uint64)

        cs.set_values_with_dependencies(np.asarray([[v]], np.uint64), parts, fn)
        one = self.constant(1)
        FmaGate.enforce_fma_batch(cs, 1 << 32, ([one], [int(parts[1])]),
                                  1, [int(parts[0])], [v])
        return int(parts[0]), int(parts[1])

    def range_check_36(self, v: int):
        """Full check: v = Σ_{i<9} chunk_i·16^i with all chunks 4-bit."""
        cs = self.cs
        chunks = cs.alloc_variables(9)

        def fn(vals):
            x = int(vals[0, 0])
            return np.asarray([(x >> (4 * i)) & _MASK4 for i in range(9)],
                              np.uint64)

        cs.set_values_with_dependencies(np.asarray([[v]], np.uint64), chunks, fn)
        c16 = [1, 1 << 4, 1 << 8, 1 << 12]
        low = ReductionGate.reduce_terms(cs, c16, [int(x) for x in chunks[:4]])
        high = ReductionGate.reduce_terms(cs, c16, [int(x) for x in chunks[4:8]])
        one = self.constant(1)
        u32_part = FmaGate.compute_fma(cs, 1 << 16, (one, high), 1, low)
        FmaGate.enforce_fma_batch(cs, 1 << 32, ([one], [int(chunks[8])]),
                                  1, [u32_part], [v])
        self._tri_xor_batch(chunks[0::3][:3], chunks[1::3][:3], chunks[2::3][:3])
        self._chunk_cache[int(u32_part)] = np.asarray(chunks[:8], np.uint64)
        return u32_part, chunks

    def range_check_u32(self, v: int):
        chunks = self.uint32_into_4bit_chunks(v)
        self._chunk_cache[int(v)] = np.asarray(chunks, np.uint64)
        a = np.asarray([chunks[0], chunks[3], chunks[6]], np.uint64)
        b = np.asarray([chunks[1], chunks[4], chunks[7]], np.uint64)
        c = np.asarray([chunks[2], chunks[5], chunks[0]], np.uint64)
        self._tri_xor_batch(a, b, c)
        return chunks


def sha256(cs: ConstraintSystem, input_bytes_vars: np.ndarray,
           table_ids: dict) -> np.ndarray:
    """input_bytes_vars: (len,) byte variable handles (range-checked by the
    caller). Returns 32 byte variable handles of the digest.

    Mirrors reference sha256/mod.rs:35: pad, per-block round_function,
    recompose the digest from the final state's 4-bit chunks."""
    g = Sha256Gadget(cs, table_ids)
    msg = [int(v) for v in input_bytes_vars]
    length = len(msg)

    last = length % SHA256_BLOCK_SIZE
    num_zeros = (64 - 1 - 8 - last) if last <= 55 else (128 - 1 - 8 - last)
    msg.append(g.constant(0x80))
    msg.extend([g.constant(0x00)] * num_zeros)
    for byte in (length * 8).to_bytes(8, "big"):
        msg.append(g.constant(byte))
    assert len(msg) % SHA256_BLOCK_SIZE == 0
    num_blocks = len(msg) // SHA256_BLOCK_SIZE

    state = [g.constant(x) for x in INITIAL_STATE]
    final_chunks = None
    one = g.constant(1)

    for blk in range(num_blocks):
        block = msg[blk * 64:(blk + 1) * 64]
        # u32 words from big-endian bytes
        words = []
        for i in range(16):
            b0, b1, b2, b3 = block[4 * i:4 * i + 4]
            t = ReductionGate.reduce_terms(
                cs, [1 << 24, 1 << 16, 1 << 8, 1], [b0, b1, b2, b3])
            words.append(t)
        final_chunks = _round_function(cs, g, state, words,
                                       last_round=(blk == num_blocks - 1))

    # digest bytes from final 4-bit chunks (LE chunk pairs, BE byte order)
    output = []
    for w in range(8):
        word_chunks = final_chunks[8 * w:8 * (w + 1)]
        word_bytes = []
        for i in range(4):
            lo, hi = int(word_chunks[2 * i]), int(word_chunks[2 * i + 1])
            byte = FmaGate.compute_fma(cs, 1 << 4, (one, hi), 1, lo)
            word_bytes.append(byte)
        output.extend(reversed(word_bytes))
    return np.asarray(output, np.uint64)


def _round_function(cs, g: Sha256Gadget, state: list, message_words: list,
                    last_round: bool):
    """One 512-bit block (reference round_function.rs:54)."""
    zero = g.constant(0)
    one = g.constant(1)

    expanded = list(message_words) + [None] * 48
    pending_chunks = []

    for idx in range(16, SHA256_ROUNDS):
        t0 = expanded[idx - 15]
        rot7, _, rot7_high = g.split_and_rotate(t0, 7)
        rot18, _, _ = g.split_and_rotate(t0, 18)
        shifted3 = np.empty(8, np.uint64)
        for i in range(7):
            shifted3[i] = rot7[(7 + i) % 8]
        shifted3[7] = rot7_high
        s0_chunks = g._tri_xor_batch(rot7, rot18, shifted3)

        t1 = expanded[idx - 2]
        rot17, _, _ = g.split_and_rotate(t1, 17)
        rot19, _, _ = g.split_and_rotate(t1, 19)
        rot10, _, rot10_high = g.split_and_rotate(t1, 10)
        shifted10 = rot10.copy()
        shifted10[7] = zero
        shifted10[6] = zero
        shifted10[5] = rot10_high
        s1_chunks = g._tri_xor_batch(rot17, rot19, shifted10)

        s0, s1 = (int(x) for x in g.uint32_from_4bit_chunks_batch(
            np.stack([s0_chunks, s1_chunks])))

        word = ReductionGate.reduce_terms(
            cs, [1, 1, 1, 1], [s0, s1, expanded[idx - 7], expanded[idx - 16]])
        if idx + 2 >= 64:
            u32_part, _ = g.range_check_36(word)
        else:
            u32_part, high = g.split_36_unchecked(word)
            pending_chunks.append(high)
        expanded[idx] = u32_part

    g.range_check_chunks(pending_chunks)
    pending_chunks = []

    a, b, c, d, e, f, gg, h = state

    for rnd in range(SHA256_ROUNDS):
        e_rot6, _, _ = g.split_and_rotate(e, 6)
        e_rot11, _, _ = g.split_and_rotate(e, 11)
        e_rot25, _, _ = g.split_and_rotate(e, 25)
        s1_chunks = g._tri_xor_batch(e_rot6, e_rot11, e_rot25)

        e_d = g.uint32_into_4bit_chunks(e)
        f_d = g.uint32_into_4bit_chunks(f)
        g_d = g.uint32_into_4bit_chunks(gg)
        ch_chunks = g.ch_batch(e_d, f_d, g_d)
        s1, ch = (int(x) for x in g.uint32_from_4bit_chunks_batch(
            np.stack([s1_chunks, ch_chunks])))

        rc = g.constant(ROUND_CONSTANTS[rnd])
        tmp1 = ReductionGate.reduce_terms(cs, [1, 1, 1, 1], [h, s1, ch, rc])
        tmp1 = FmaGate.compute_fma(cs, 1, (one, tmp1), 1, expanded[rnd])
        t = FmaGate.compute_fma(cs, 1, (one, tmp1), 1, d)
        new_e, _ = g.range_check_36(t)

        a_rot2, _, _ = g.split_and_rotate(a, 2)
        a_rot13, _, _ = g.split_and_rotate(a, 13)
        a_rot22 = np.empty(8, np.uint64)
        for i in range(8):
            a_rot22[i] = a_rot2[(i + 5) % 8]
        s0_chunks = g._tri_xor_batch(a_rot2, a_rot13, a_rot22)

        a_d = g.uint32_into_4bit_chunks(a)
        b_d = g.uint32_into_4bit_chunks(b)
        c_d = g.uint32_into_4bit_chunks(c)
        maj_chunks = g.maj_batch(a_d, b_d, c_d)
        s0, maj = (int(x) for x in g.uint32_from_4bit_chunks_batch(
            np.stack([s0_chunks, maj_chunks])))

        t = ReductionGate.reduce_terms(cs, [1, 1, 1, 0], [s0, maj, tmp1, zero])
        new_a, _ = g.range_check_36(t)

        h, gg, f, e, d, c, b, a = gg, f, e, new_e, c, b, a, new_a

    # add into chaining state
    final_d_dec = None
    final_h_dec = None
    for idx, src in enumerate([a, b, c, d, e, f, gg, h]):
        tmp = FmaGate.compute_fma(cs, 1, (one, state[idx]), 1, src)
        tmp, high = g.split_36_unchecked(tmp)
        pending_chunks.append(high)
        if idx == 3:
            final_d_dec = g.range_check_u32(tmp)
        if idx == 7:
            final_h_dec = g.range_check_u32(tmp)
        state[idx] = tmp
    g.range_check_chunks(pending_chunks)

    if not last_round:
        return None

    le_chunks = []
    for idx, el in enumerate(state):
        if idx == 3:
            le_chunks.extend(final_d_dec)
        elif idx == 7:
            le_chunks.extend(final_h_dec)
        else:
            le_chunks.extend(g.uint32_into_4bit_chunks(el))
    # range check the 6 not-yet-checked words' chunks (48 chunks)
    to_check = le_chunks[:24] + le_chunks[32:56]
    g.range_check_chunks([int(x) for x in to_check])
    return np.asarray(le_chunks, np.uint64)
