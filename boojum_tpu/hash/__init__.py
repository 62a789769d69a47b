"""Hashes: Poseidon/Poseidon2 sponges, Merkle-cap trees, Keccak-256.

TPU equivalents of reference src/implementations/ (permutations),
src/algebraic_props/ (sponges), src/cs/oracle/ (tree hashers, Merkle trees).
"""

from . import merkle, poseidon, poseidon2, sponge  # noqa: F401
