"""Committed oracles: LDE storage + Merkle-cap tree + query opening.

Reference behavior: the per-oracle flow in prover.rs (LDE columns → tree →
cap → per-query leaf + path; OracleQuery::construct proof.rs:64). Leaf i of
a width-1 oracle holds one value per source poly at flat position i of the
(lde, n) bitreversed-coset layout; FRI oracles chunk 2^k consecutive flat
positions per leaf, c0 block then c1 block.
"""

from __future__ import annotations

import numpy as np

from ..field import goldilocks as gl
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
