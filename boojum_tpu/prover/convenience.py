"""One-call proving / verification helpers.

Reference behavior: src/cs/implementations/convenience.rs:34-198
(`prove_one_shot`, `prepare_base_setup_with_precomputations_and_vk`,
`prove_from_precomputations`, `verify_circuit`).
"""

from __future__ import annotations

from ..cs.cs import ConstraintSystem
from ..cs.setup import create_base_setup
from .prover import ProofConfig, ProvingArtifacts, create_setup_and_vk, prove


def prepare_setup_and_vk(cs: ConstraintSystem, proof_config: ProofConfig,
                         hasher: str = "poseidon2") -> ProvingArtifacts:
    """Base setup + committed setup + VK in one call. The CS must already be
    pad_and_shrink'ed."""
    setup_base = create_base_setup(cs)
    return create_setup_and_vk(cs, setup_base, proof_config, hasher)


def prove_one_shot(cs: ConstraintSystem, proof_config: ProofConfig = None,
                   transcript_kind: str = "poseidon2",
                   hasher: str = "poseidon2", device: bool = False):
    """Finalize (if needed) + setup + prove; returns (proof, vk).

    device=True routes through the device-resident prover (TPU path).
    """
    proof_config = proof_config or ProofConfig()
    if getattr(cs, "final_trace_len", None) is None:
        cs.pad_and_shrink()
    if device:
        from .device_prover import DeviceProver, create_device_setup
        setup_base = create_base_setup(cs)
        art = create_device_setup(cs, setup_base, proof_config, hasher)
        dp = DeviceProver(cs, art, proof_config)
        return dp.prove(transcript_kind, hasher), art.vk
    art = prepare_setup_and_vk(cs, proof_config, hasher)
    return prove(cs, art, proof_config, transcript_kind, hasher), art.vk


def verify_circuit(vk, proof, transcript_kind: str = "poseidon2",
                   hasher: str = "poseidon2") -> bool:
    from ..verifier.verifier import verify
    return verify(vk, proof, transcript_kind, hasher)
