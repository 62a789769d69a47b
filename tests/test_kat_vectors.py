"""Known-answer vectors for the protocol-critical primitives (round-1
VERDICT item 1b).

Provenance: era-boojum ships NO absolute vectors — its tests cross-check
implementations against each other on random inputs
(src/implementations/poseidon2/state_generic_impl.rs:333, fft tests
src/fft/mod.rs:1298-1712), and no Rust toolchain exists in this image to
execute the reference. The golden values below were therefore produced by
this repo's exact scalar twins (pure-Python big-int implementations of the
algorithms hand-derived from the Rust), and their fidelity to era-boojum is
anchored END-TO-END by tests/test_era_compat.py: the reference's shipped
production proof.json verifies against its vk.json, which transitively
exercises the same Poseidon2 permutation, transcript absorption/padding,
challenge stream, NTT/bitreversal conventions, selector-tree placement and
query-index derivation pinned here. The role of this file is to pin each
primitive INDIVIDUALLY so a regression is localized, not discovered as an
opaque proof mismatch.

Algorithm sources (behavioral specs):
- Poseidon2: src/implementations/poseidon2/state_generic_impl.rs:221,
  params.rs:8,35 (Plonky2-compatible round constants).
- Poseidon (classic): src/implementations/poseidon_goldilocks.rs:374.
- Transcript: src/cs/implementations/transcript.rs:48 (overwrite sponge,
  rate 8, rescue-prime style 1||0* padding), :155 (blake2s), :264 (keccak).
- NTT: src/fft/mod.rs:659 (natural -> bitreversed CT), coset via
  distribute_powers (:308) with the multiplicative generator 7.
- PoW: src/cs/implementations/pow.rs:51,140.
- FRI schedule: src/cs/implementations/prover.rs:2281.
"""

import numpy as np

from boojum_tpu.field import goldilocks as gl
from boojum_tpu.hash.poseidon import s_permutation as poseidon_perm
from boojum_tpu.hash.poseidon2 import s_permutation as poseidon2_perm
from boojum_tpu.ntt import ntt
from boojum_tpu import transcript as tr

P = gl.ORDER

P2_ZERO = [8712332397803324243, 14177677218821280696, 14098193006101732060,
           17798101841915205831, 3475309236125460583, 5096467811544405638,
           4340648441155505290, 10730383339525868324, 846941241873001857,
           6024974798409923380, 646128927142969144, 2965682219593109086]
P2_SEQ = [6738160660086030232, 3915228014772683645, 9421903558548905872,
          5562382035983677326, 16938716504506636605, 11269100344090829297,
          4364628458412850357, 11772205662039517400, 8680456906984113577,
          11403296415040674338, 15696433593817306654, 7338062005930624341]
P1_ZERO = [4107711164043914042, 12918300686590982670, 12948882733923532430,
           15242803725500147433, 2219915279425718635, 6183651180196145887,
           77341197034095004, 7692729836901853678, 4459473664794040965,
           9468975109017324707, 5179849531572166569, 2149305158688838257]
P1_SEQ = [7212359399681542117, 4094562377213571860, 3852584902194125001,
          2079320855443491788, 9237503873804841298, 13526218723192979696,
          1955007960478007802, 11231017953957561345, 4778870037553814941,
          178454756109117866, 7186328268767451252, 13235415070861370855]

TR_POSEIDON = [3992857965039569800, 13000323989856785728,
               5348892496263909980, 12716340964622309829]
TR_POSEIDON2 = [11072543984774353056, 8323430468618033757,
                12163308038281721595, 15813221286003558131,
                15445671691438354917, 3734817776661269694]
TR_BLAKE2S = [13688387863956792368, 2216678820440478964]
TR_KECCAK = [10185103184198438700, 3715146784539674416]

NTT16 = [136, 18446744069414584313, 18444492269600899065, 2251799813685240,
         18444501065828136953, 18444483473373661177, 2260596040923128,
         2243003586447352, 9185100786013534200, 9257157276228155385,
         9185082089752463353, 9257140787580274680, 9189603281834309625,
         9261661979662120952, 9189586793186428920, 9261643283401050105]
COSET16 = [87698011225336, 18446677084288904969, 3740326673134451798,
           14706397403349101851, 12042968443894562104, 634695977696661061,
           12266465146235776691, 11949357851462719154, 4510986951736355687,
           1152904130564158421, 9615818414838658023, 4624067515321175552,
           6930188345370832662, 9231151807605758901, 4307704423409680029,
           14967410618982068024]


def test_poseidon2_permutation_kat():
    assert poseidon2_perm([0] * 12) == P2_ZERO
    assert poseidon2_perm(list(range(12))) == P2_SEQ


def test_poseidon_permutation_kat():
    assert poseidon_perm([0] * 12) == P1_ZERO
    assert poseidon_perm(list(range(12))) == P1_SEQ


def test_batched_permutations_match_kat():
    """The jnp (device) permutations reproduce the scalar KATs exactly."""
    from boojum_tpu.hash import poseidon, poseidon2

    for perm, kat in ((poseidon2.permutation, P2_SEQ),
                      (poseidon.permutation, P1_SEQ)):
        state = [gl.from_u64(np.asarray([i], np.uint64)) for i in range(12)]
        out = perm(state)
        assert [int(gl.to_u64(out[i])[0]) for i in range(12)] == kat


def test_transcript_challenge_streams_kat():
    t = tr.AlgebraicTranscript("poseidon")
    t.witness_field_elements([1, 2, 3])
    assert t.get_multiple_challenges(4) == TR_POSEIDON

    t = tr.AlgebraicTranscript("poseidon2")
    t.witness_field_elements([1, 2, 3])
    got = t.get_multiple_challenges(4)
    t.witness_field_elements([7])  # re-absorb mid-stream (prover pattern)
    got += t.get_multiple_challenges(2)
    assert got == TR_POSEIDON2

    t = tr.Blake2sTranscript()
    t.witness_field_elements([1, 2, 3])
    assert t.get_multiple_challenges(2) == TR_BLAKE2S

    t = tr.Keccak256Transcript()
    t.witness_field_elements([1, 2, 3])
    assert t.get_multiple_challenges(2) == TR_KECCAK


def test_ntt_kat_and_naive_dft():
    """Golden NTT vectors + an in-test naive DFT cross-check with exact
    Python ints (so the golden values are not merely self-referential)."""
    vals = np.arange(1, 17, dtype=np.uint64)
    plan = ntt.get_plan(4)
    out = gl.to_u64(ntt.ntt_cols(gl.from_u64(vals).reshape(16, 1),
                                 plan)).reshape(16)
    assert [int(x) for x in out] == NTT16

    # naive DFT: output is bitreversed evaluation order
    omega = int(gl.domain_generator(4))
    rev = [int(x) for x in ntt.bitreverse_indices(4)]
    for i in [0, 1, 5, 15]:
        x = pow(omega, rev[i], P)
        want = sum(int(vals[j]) * pow(x, j, P) for j in range(16)) % P
        assert int(out[i]) == want

    cos = gl.to_u64(ntt.coset_ntt_cols(
        gl.from_u64(vals).reshape(16, 1),
        int(gl.MULTIPLICATIVE_GENERATOR), plan)).reshape(16)
    assert [int(x) for x in cos] == COSET16
    x = (7 * pow(omega, rev[3], P)) % P  # generator-shifted coset
    want = sum(int(vals[j]) * pow(x, j, P) for j in range(16)) % P
    assert int(cos[3]) == want


def test_pow_nonce_kat():
    from boojum_tpu.prover import pow as pw
    assert pw.blake2s_pow([1, 2, 3, 4], 8) == 49
    assert pw.verify_blake2s_pow([1, 2, 3, 4], 8, 49)
    assert pw.keccak256_pow([1, 2, 3, 4], 8) == 110
    assert pw.verify_keccak256_pow([1, 2, 3, 4], 8, 110)


def test_fri_schedule_kat():
    """compute_fri_schedule reproduces prover.rs:2281 for the bench and the
    production shapes (the latter matches the shipped proof.json: 100
    queries, folds [3,3,3,3,3,1], 16 final monomials)."""
    from boojum_tpu.prover.fri import compute_fri_schedule
    assert compute_fri_schedule(100, 16, 0, 3, 16) == (0, 34,
                                                       [3, 3, 3, 3, 3], 2)
    assert compute_fri_schedule(100, 32, 0, 1, 20) == \
        (0, 100, [3, 3, 3, 3, 3, 1], 16)
