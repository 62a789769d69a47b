"""Merkle tree with cap, TPU-batched leaf/node hashing.

Reference behavior: src/cs/oracle/merkle_tree.rs — ``construct`` (:78, leaf =
one field element per source poly at a row, rows enumerated coset-major with
per-coset bitreversed order), ``construct_by_chunking`` (:176, leaf = K
consecutive elements per source), ``get_cap`` (:451), ``get_proof`` (:462),
``verify_proof_over_cap`` (:482). The "cap" is the top 2^k layer committed in
VK/transcript instead of a single root.

TPU design: all leaf hashes for the whole tree are computed in one batched
sponge sweep (state lanes = leaves); node layers halve with one batched
permutation per layer. Layers are then pulled to host once for query-phase
indexing (query counts are ~100, so host indexing is free).
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..field import goldilocks as gl
from ..field.goldilocks import GL
from . import sponge
from .keccak import keccak256


class AlgebraicMerkleTree:
    """Merkle-cap tree whose node type is [F; 4] (Poseidon/Poseidon2 sponge)."""

    def __init__(self, leaf_hashes: np.ndarray, layers: list[np.ndarray], cap_size: int,
                 permutation: str):
        self.leaf_hashes = leaf_hashes  # (4, N) u64
        self.layers = layers  # each (4, N>>k) u64, excluding leaf layer; last = cap
        self.cap_size = cap_size
        self.permutation = permutation

    @classmethod
    def from_leaf_columns(cls, columns: GL, cap_size: int, permutation: str = "poseidon2"):
        """columns: GL (num_els_per_leaf, tree_size)."""
        tree_size = columns.shape[1]
        assert tree_size & (tree_size - 1) == 0 and cap_size <= tree_size
        leaf_gl = sponge.hash_leaves(columns, permutation)
        layers_gl = []
        current = leaf_gl
        while current.shape[1] > cap_size:
            left = current[:, 0::2]
            right = current[:, 1::2]
            current = sponge.hash_nodes(left, right, permutation)
            layers_gl.append(current)
        leaf_hashes = np.stack([gl.to_u64(leaf_gl[i]) for i in range(4)])
        layers = [np.stack([gl.to_u64(l[i]) for i in range(4)]) for l in layers_gl]
        return cls(leaf_hashes, layers, cap_size, permutation)

    def get_cap(self) -> list[tuple[int, ...]]:
        src = self.layers[-1] if self.layers else self.leaf_hashes
        return [tuple(int(src[i, j]) for i in range(4)) for j in range(src.shape[1])]

    def get_proof(self, idx: int):
        """Returns (leaf_hash, path) — path excludes the cap layer."""
        leaf = tuple(int(self.leaf_hashes[i, idx]) for i in range(4))
        path = []
        cur = idx
        depth = len(self.layers)
        for i in range(depth):
            pair = cur ^ 1
            src = self.leaf_hashes if i == 0 else self.layers[i - 1]
            path.append(tuple(int(src[j, pair]) for j in range(4)))
            cur >>= 1
        return leaf, path

    @staticmethod
    def verify_proof_over_cap(proof, cap, leaf_hash, idx: int,
                              permutation: str = "poseidon2") -> bool:
        perm = __import__("boojum_tpu.hash.poseidon2", fromlist=["x"]).s_permutation \
            if permutation == "poseidon2" else \
            __import__("boojum_tpu.hash.poseidon", fromlist=["x"]).s_permutation
        current = tuple(leaf_hash)
        cur = idx
        for el in proof:
            if cur & 1 == 0:
                current = tuple(sponge.scalar_hash_into_node(current, el, perm))
            else:
                current = tuple(sponge.scalar_hash_into_node(el, current, perm))
            cur >>= 1
        return tuple(cap[cur]) == current


def _u64_leaves_to_bytes(columns: np.ndarray) -> list[bytes]:
    """columns (num_els, N) u64 -> per-leaf little-endian byte strings."""
    # (N, num_els) u64 -> LE bytes per row
    transposed = np.ascontiguousarray(columns.T.astype("<u8"))
    n = transposed.shape[0]
    raw = transposed.tobytes()
    stride = transposed.shape[1] * 8
    return [raw[i * stride:(i + 1) * stride] for i in range(n)]


class BytesMerkleTree:
    """Merkle-cap tree over 32-byte digests (Blake2s / Keccak256 hashers).

    Host-side; used for the non-recursive transcript/tree configs
    (reference oracle impls at src/cs/oracle/mod.rs:179-313).
    """

    def __init__(self, leaf_hashes: list[bytes], layers: list[list[bytes]],
                 cap_size: int, algo: str):
        self.leaf_hashes = leaf_hashes
        self.layers = layers
        self.cap_size = cap_size
        self.algo = algo

    @staticmethod
    def _digest(algo: str, data: bytes) -> bytes:
        if algo == "blake2s":
            return hashlib.blake2s(data, digest_size=32).digest()
        elif algo == "keccak256":
            return keccak256(data)
        raise ValueError(algo)

    @classmethod
    def from_leaf_columns_u64(cls, columns: np.ndarray, cap_size: int, algo: str = "blake2s"):
        """columns: (num_els_per_leaf, tree_size) u64 canonical values."""
        tree_size = columns.shape[1]
        assert tree_size & (tree_size - 1) == 0 and cap_size <= tree_size
        leaf_bytes = _u64_leaves_to_bytes(columns)
        d = cls._digest
        leaf_hashes = [d(algo, b) for b in leaf_bytes]
        layers = []
        current = leaf_hashes
        while len(current) > cap_size:
            current = [d(algo, current[2 * i] + current[2 * i + 1])
                       for i in range(len(current) // 2)]
            layers.append(current)
        return cls(leaf_hashes, layers, cap_size, algo)

    def get_cap(self) -> list[bytes]:
        return list(self.layers[-1] if self.layers else self.leaf_hashes)

    def get_proof(self, idx: int):
        leaf = self.leaf_hashes[idx]
        path = []
        cur = idx
        for i in range(len(self.layers)):
            pair = cur ^ 1
            src = self.leaf_hashes if i == 0 else self.layers[i - 1]
            path.append(src[pair])
            cur >>= 1
        return leaf, path

    @staticmethod
    def verify_proof_over_cap(proof, cap, leaf_hash: bytes, idx: int,
                              algo: str = "blake2s") -> bool:
        current = leaf_hash
        cur = idx
        for el in proof:
            pair = (current, el) if cur & 1 == 0 else (el, current)
            current = BytesMerkleTree._digest(algo, pair[0] + pair[1])
            cur >>= 1
        return cap[cur] == current
