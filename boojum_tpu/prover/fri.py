"""FRI: schedule, folding, oracles, final monomials.

Reference behavior: src/cs/implementations/fri/mod.rs (do_fri :49,
fold_multiple :362 — fold g = f(x)+f(-x)+α·(f(x)-f(-x))/x without the /2
normalization, challenge squared per sub-fold) and compute_fri_schedule
(prover.rs:2281). The flattened (lde-coset-major, per-coset bitreversed)
value layout is the bitreversed enumeration of the full domain over
g·<ω_{lde·n}>, so adjacent pairs are (f(x), f(-x)) and one inverse-twiddle
table serves every fold (its prefix is the table of the squared domain).

Folding here is vectorized host numpy (arrays are small after the first
fold; the base layer is produced on device by the DEEP stage).
"""

from __future__ import annotations

import numpy as np

from ..field.goldilocks import ORDER, domain_generator, MULTIPLICATIVE_GENERATOR
from ..ntt import ntt
from ..utils import npgl
from .oracles import FlatOracle


def compute_fri_schedule(security_bits: int, cap_size: int, pow_bits: int,
                         rate_log_two: int, initial_degree_log_two: int):
    """Exact reproduction of prover.rs:2281. Returns
    (new_pow_bits, num_queries, folding_schedule, final_degree)."""
    assert security_bits > pow_bits
    raw = security_bits - pow_bits
    new_pow_bits = pow_bits
    if raw % rate_log_two != 0:
        if new_pow_bits >= rate_log_two - (raw % rate_log_two):
            new_pow_bits -= rate_log_two - (raw % rate_log_two)
    raw = security_bits - new_pow_bits
    num_queries = raw // rate_log_two + (1 if raw % rate_log_two else 0)

    stop_degree = max(1, cap_size >> rate_log_two)
    stop_log2 = stop_degree.bit_length() - 1
    cap_log2 = cap_size.bit_length() - 1

    degree = initial_degree_log_two
    schedule = []
    while degree > stop_log2:
        if degree + rate_log_two <= cap_log2:
            break
        if degree - stop_log2 >= 3:
            degree -= 3
            schedule.append(3)
        elif degree - stop_log2 == 2:
            degree -= 2
            schedule.append(2)
        else:
            degree -= 1
            schedule.append(1)
            break
        if degree + rate_log_two <= cap_log2:
            break
    assert degree + rate_log_two >= cap_log2
    return new_pow_bits, num_queries, schedule, 1 << degree


# -- host ext helpers -------------------------------------------------------

_NR = np.uint64(7)


def _ext_mul(a0, a1, b0, b1):
    v0 = npgl.mul(a0, b0)
    v1 = npgl.mul(a1, b1)
    c0 = npgl.add(v0, npgl.mul(v1, _NR))
    t = npgl.mul(npgl.add(a0, a1), npgl.add(b0, b1))
    c1 = npgl.sub(npgl.sub(t, v0), v1)
    return c0, c1


def _fold_step(c0, c1, roots_inv, coset_inv, ch0, ch1):
    """One fold-by-2 over flat bitreversed arrays."""
    fx0, fmx0 = c0[0::2], c0[1::2]
    fx1, fmx1 = c1[0::2], c1[1::2]
    d0 = npgl.mul(npgl.mul(npgl.sub(fx0, fmx0), roots_inv), coset_inv)
    d1 = npgl.mul(npgl.mul(npgl.sub(fx1, fmx1), roots_inv), coset_inv)
    m0, m1 = _ext_mul(d0, d1, np.uint64(ch0), np.uint64(ch1))
    return (npgl.add(npgl.add(fx0, fmx0), m0),
            npgl.add(npgl.add(fx1, fmx1), m1))


def _inverse_roots_bitreversed(full_size: int) -> np.ndarray:
    """roots[i] = ω_full^{-bitrev_{full/2}(i)}, length full/2."""
    log_full = full_size.bit_length() - 1
    omega = domain_generator(log_full)
    omega_inv = pow(omega, ORDER - 2, ORDER)
    tbl = npgl.powers(omega_inv, full_size // 2)
    rev = ntt.bitreverse_indices(log_full - 1)
    return tbl[rev]


class FriResult:
    def __init__(self):
        self.base_oracle = None
        self.intermediate_oracles = []
        self.intermediate_sources = []  # list[(c0 np, c1 np)]
        self.monomial_forms = ([], [])


def interpolate_final_host(vals_bitrev: np.ndarray, coset: int) -> list[int]:
    """Exact host-int inverse coset-NTT for the tiny final FRI layer
    (m ≤ ~64): mono[j] = m⁻¹ · coset⁻ʲ · Σᵢ nat[i]·ω⁻ⁱʲ. Bit-identical to
    ntt.coset_intt_cols on bitreversed input, without a device dispatch —
    two tiny tunnel roundtrips used to cost more than whole FRI rounds."""
    m = int(vals_bitrev.shape[0])
    log_m = m.bit_length() - 1
    from ..field import goldilocks as gl
    rev = np.asarray(ntt.bitreverse_indices(log_m))
    nat = [int(x) for x in np.asarray(vals_bitrev, np.uint64)[rev]]
    omega_inv = pow(int(gl.domain_generator(log_m)), ORDER - 2, ORDER)
    m_inv = pow(m, ORDER - 2, ORDER)
    coset_inv = pow(int(coset) % ORDER, ORDER - 2, ORDER)
    out = []
    cj = 1
    for j in range(m):
        w = pow(omega_inv, j, ORDER)
        acc = 0
        x = 1
        for i in range(m):
            acc = (acc + nat[i] * x) % ORDER
            x = x * w % ORDER
        out.append(acc * m_inv % ORDER * cj % ORDER)
        cj = cj * coset_inv % ORDER
    return out


def do_fri(h_c0: np.ndarray, h_c1: np.ndarray, transcript, schedule: list[int],
           lde_factor: int, cap_size: int, hasher: str) -> FriResult:
    full_size = h_c0.shape[0]
    result = FriResult()

    result.base_oracle = FlatOracle([h_c0, h_c1], 1 << schedule[0],
                                    cap_size, hasher)
    transcript.witness_merkle_tree_cap(result.base_oracle.get_cap())

    roots = _inverse_roots_bitreversed(full_size)
    coset_inv = np.uint64(pow(MULTIPLICATIVE_GENERATOR, ORDER - 2, ORDER))

    cur_c0, cur_c1 = h_c0, h_c1
    for stage, k in enumerate(schedule):
        if stage > 0:
            oracle = FlatOracle([cur_c0, cur_c1], 1 << k, cap_size, hasher)
            transcript.witness_merkle_tree_cap(oracle.get_cap())
            result.intermediate_oracles.append(oracle)
        ch0 = transcript.get_challenge()
        ch1 = transcript.get_challenge()
        c = (ch0, ch1)
        for _ in range(k):
            m = cur_c0.shape[0] // 2
            cur_c0, cur_c1 = _fold_step(cur_c0, cur_c1, roots[:m],
                                        coset_inv, c[0], c[1])
            coset_inv = npgl.mul(coset_inv, coset_inv)
            s0, s1 = _ext_mul(np.uint64(c[0]), np.uint64(c[1]),
                              np.uint64(c[0]), np.uint64(c[1]))
            c = (int(s0), int(s1))
        result.intermediate_sources.append((cur_c0, cur_c1))

    # final interpolation: bitreversed flat values of a low-degree poly over
    # coset (coset_inv)^-1 of size m
    m = cur_c0.shape[0]
    final_degree = m // lde_factor
    coset = int(npgl.inv(coset_inv))
    mono_c0 = np.asarray(interpolate_final_host(cur_c0, coset), np.uint64)
    mono_c1 = np.asarray(interpolate_final_host(cur_c1, coset), np.uint64)
    assert not mono_c0[final_degree:].any(), "FRI final poly degree too high"
    assert not mono_c1[final_degree:].any(), "FRI final poly degree too high"
    transcript.witness_field_elements([int(x) for x in mono_c0[:final_degree]])
    transcript.witness_field_elements([int(x) for x in mono_c1[:final_degree]])
    result.monomial_forms = ([int(x) for x in mono_c0[:final_degree]],
                             [int(x) for x in mono_c1[:final_degree]])
    return result
