"""Regenerate tests/fixtures/{proof,vk}.json (internal format-stability
fixtures). Run after any change that alters proof bytes — e.g. a gate
relation fix — and commit the new fixtures together with the change.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from tests.test_prove_verify import build_small_circuit

    from boojum_tpu.cs.setup import create_base_setup
    from boojum_tpu.prover import ProofConfig, create_setup_and_vk, prove
    from boojum_tpu.prover import serialization as ser
    from boojum_tpu.prover.proof import proof_to_json
    from boojum_tpu.verifier import verify

    cs = build_small_circuit(with_lookup=True)
    sb = create_base_setup(cs)
    cfg = ProofConfig(fri_lde_factor=8, merkle_tree_cap_size=8)
    art = create_setup_and_vk(cs, sb, cfg, "poseidon2")
    proof = prove(cs, art, cfg, "poseidon2", "poseidon2")
    assert verify(art.vk, proof, "poseidon2", "poseidon2")
    fdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures")
    os.makedirs(fdir, exist_ok=True)
    with open(os.path.join(fdir, "vk.json"), "w") as f:
        f.write(ser.vk_to_json(art.vk))
    with open(os.path.join(fdir, "proof.json"), "w") as f:
        f.write(proof_to_json(proof))
    print("fixtures written to", fdir)


if __name__ == "__main__":
    main()
