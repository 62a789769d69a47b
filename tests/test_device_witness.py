"""On-device witness materialization (prover/device_witness.py).

Reference behavior: take_witness_using_hints
(src/cs/implementations/witness.rs:325) — the reference copies host-resolved
values into column polys; here the recorded witness program executes on
device and must produce the SAME columns (and therefore byte-identical
proofs).
"""

import hashlib

import numpy as np
import pytest

from boojum_tpu.cs.setup import create_base_setup
from boojum_tpu.prover.device_witness import DeviceWitnessProgram
from boojum_tpu.prover.prover import (ProofConfig, create_setup_and_vk,
                                      materialize_witness_columns, prove)
from boojum_tpu.verifier.verifier import verify

from tests.test_sha256 import build_sha256_circuit

RNG = np.random.default_rng(3)


def _host_lagrange(cs, n):
    variables, wits, mults = materialize_witness_columns(cs, n)
    return np.concatenate([variables, wits, mults], axis=0).T  # (n, K)


def test_device_witness_columns_match_host():
    data = bytes(RNG.integers(0, 256, 40, dtype=np.uint8))
    cs, _ = build_sha256_circuit(data)
    cs.pad_and_shrink()
    n = cs.final_trace_len
    assert DeviceWitnessProgram.supported(cs)
    prog = DeviceWitnessProgram(cs, n)
    lag = prog()
    dev = np.asarray(lag.lo, np.uint64) | \
        (np.asarray(lag.hi, np.uint64) << np.uint64(32))
    host = _host_lagrange(cs, n)
    assert dev.shape == host.shape
    assert np.array_equal(dev, host)


def test_device_witness_replay_matches_host():
    """replay_witness(overrides) and the device program agree."""
    data = bytes(RNG.integers(0, 256, 40, dtype=np.uint8))
    cs, out = build_sha256_circuit(data)
    cs.pad_and_shrink()
    n = cs.final_trace_len
    prog = DeviceWitnessProgram(cs, n)

    data2 = bytes(RNG.integers(0, 256, 40, dtype=np.uint8))
    overrides = {int(v): int(b) for v, b in zip(cs.input_variables, data2)}
    cs.replay_witness(overrides)
    digest = bytes(int(cs.get_value(int(v))) for v in out)
    assert digest == hashlib.sha256(data2).digest()
    assert cs.check_if_satisfied()

    lag = prog(cs.witness_overrides)
    dev = np.asarray(lag.lo, np.uint64) | \
        (np.asarray(lag.hi, np.uint64) << np.uint64(32))
    host = _host_lagrange(cs, n)
    assert np.array_equal(dev, host)


def test_keccak_device_witness_columns_match_host():
    """The keccak circuit (grouped rotations, table3 twins) materializes
    identically on device."""
    from tests.test_keccak_gadget import build

    data = bytes(RNG.integers(0, 256, 64, dtype=np.uint8))
    cs, _ = build(data, max_trace=1 << 15)
    cs.pad_and_shrink()
    n = cs.final_trace_len
    assert DeviceWitnessProgram.supported(cs)
    prog = DeviceWitnessProgram(cs, n)
    lag = prog()
    dev = np.asarray(lag.lo, np.uint64) | \
        (np.asarray(lag.hi, np.uint64) << np.uint64(32))
    assert np.array_equal(dev, _host_lagrange(cs, n))


@pytest.mark.slow
def test_device_prove_with_device_witness_byte_identical():
    """Full device prove with the on-device witness program enabled is
    byte-identical to the host prover's proof."""
    from boojum_tpu.prover.device_prover import (DeviceProver,
                                                 create_device_setup)
    from boojum_tpu.prover.proof import proof_to_json

    data = bytes(RNG.integers(0, 256, 16, dtype=np.uint8))
    cs, _ = build_sha256_circuit(data)
    cs.pad_and_shrink()
    sb = create_base_setup(cs)
    cfg = ProofConfig(fri_lde_factor=4, merkle_tree_cap_size=4)
    host_art = create_setup_and_vk(cs, sb, cfg, "poseidon2")
    host_proof = prove(cs, host_art, cfg, "poseidon2", "poseidon2")
    dev_art = create_device_setup(cs, sb, cfg, "poseidon2")
    dp = DeviceProver(cs, dev_art, cfg)
    dev_proof = dp.prove("poseidon2", "poseidon2")
    assert dp._prove_invariant["dev_witness"] is not None
    assert verify(dev_art.vk, dev_proof, "poseidon2", "poseidon2")
    assert proof_to_json(host_proof) == proof_to_json(dev_proof)
