"""Resolve the production circuit's general-purpose gate order.

The VK's selectors_placement tree pins gate_idx -> (num_constants, degree)
but five gates share (0, 2); this script tries every assignment of the
five candidates to those slots (and each UIntXAdd width) and checks the
quotient identity of the shipped /root/reference/proof.json. Exactly one
assignment should satisfy it.
"""

import itertools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from boojum_tpu.compat import era
from boojum_tpu.verifier import verifier

FIXED = {
    0: ("constants_allocator", None),
    2: ("poseidon2_flattened", None),
    5: ("fma", None),
    9: ("nop", None),
    10: ("reduction", 4),
}
OPEN_SLOTS = [1, 3, 4, 7, 8]
CANDIDATES = [
    ("u8x4_fma", None),
    ("dot_product", 4),
    ("zero_check", False),
    ("selection", None),
    ("parallel_selection", 4),
]


def main():
    proof = era.proof_from_reference_json("/root/reference/proof.json")
    tried = 0
    t0 = time.time()
    hits = []
    for width in (32, 16, 8):
        for perm in itertools.permutations(CANDIDATES):
            specs = [None] * 11
            for idx, spec in FIXED.items():
                specs[idx] = spec
            specs[6] = ("uintx_add", width)
            for slot, spec in zip(OPEN_SLOTS, perm):
                specs[slot] = spec
            cfg = era.EraGateConfig(
                evaluator_specs=tuple(specs),
                specialized_evaluator_specs=(("boolean", None),),
                gate_spec_layout=(("boolean", 0, 1),),
            )
            vk = era.vk_from_reference_json("/root/reference/vk.json", cfg)
            tried += 1
            try:
                ok = verifier.verify(vk, proof, _identity_only=True)
            except Exception as e:
                ok = False
            if ok:
                hits.append((width, perm))
                print("HIT width", width, "order:",
                      {s: p for s, p in zip(OPEN_SLOTS, perm)})
    print(f"tried {tried} in {time.time()-t0:.1f}s, hits: {len(hits)}")


if __name__ == "__main__":
    main()
