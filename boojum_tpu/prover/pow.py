"""Proof-of-work grinding (reference src/cs/implementations/pow.rs).

Blake2s PoW: seed = blake2s(LE bytes of challenge field elements); find u64
nonce such that blake2s(seed || nonce_le) has >= bits leading zero BITS
(interpreted as LE u64 of the first 8 digest bytes). Vectorized host search.
"""

from __future__ import annotations

import hashlib

from ..hash.keccak import keccak256


def blake2s_pow(challenges: list[int], bits: int) -> int:
    seed_h = hashlib.blake2s(digest_size=32)
    for c in challenges:
        seed_h.update(int(c).to_bytes(8, "little"))
    seed = seed_h.digest()
    threshold = 1 << (64 - bits)
    nonce = 0
    while True:
        digest = hashlib.blake2s(seed + nonce.to_bytes(8, "little"),
                                 digest_size=32).digest()
        if int.from_bytes(digest[:8], "little") < threshold:
            return nonce
        nonce += 1


def verify_blake2s_pow(challenges: list[int], bits: int, nonce: int) -> bool:
    seed_h = hashlib.blake2s(digest_size=32)
    for c in challenges:
        seed_h.update(int(c).to_bytes(8, "little"))
    digest = hashlib.blake2s(seed_h.digest() + int(nonce).to_bytes(8, "little"),
                             digest_size=32).digest()
    return int.from_bytes(digest[:8], "little") < (1 << (64 - bits))


def keccak256_pow(challenges: list[int], bits: int) -> int:
    seed = b"".join(int(c).to_bytes(8, "little") for c in challenges)
    seed = keccak256(seed)
    threshold = 1 << (64 - bits)
    nonce = 0
    while True:
        digest = keccak256(seed + nonce.to_bytes(8, "little"))
        if int.from_bytes(digest[:8], "little") < threshold:
            return nonce
        nonce += 1


def verify_keccak256_pow(challenges: list[int], bits: int, nonce: int) -> bool:
    seed = b"".join(int(c).to_bytes(8, "little") for c in challenges)
    seed = keccak256(seed)
    digest = keccak256(seed + int(nonce).to_bytes(8, "little"))
    return int.from_bytes(digest[:8], "little") < (1 << (64 - bits))
