"""NTT parity tests vs a naive exact DFT (mirrors src/fft/mod.rs:1298-1712)."""

import jax
import numpy as np
import pytest

from boojum_tpu.field import goldilocks as gl
from boojum_tpu.ntt import ntt

P = gl.ORDER
RNG = np.random.default_rng(42)


def naive_dft(coeffs, coset, log_n):
    """Exact evals at coset*ω^k, natural k order, via Python ints."""
    n = 1 << log_n
    omega = gl.domain_generator(log_n)
    out = []
    for k in range(n):
        x = (coset * pow(omega, k, P)) % P
        acc, xp = 0, 1
        for c in coeffs:
            acc = (acc + int(c) * xp) % P
            xp = (xp * x) % P
        out.append(acc)
    return np.array(out, dtype=np.uint64)


@pytest.mark.parametrize("log_n", [3, 4, 6])
def test_ntt_matches_naive_dft(log_n):
    n = 1 << log_n
    B = 3
    coeffs = RNG.integers(0, P, size=(n, B), dtype=np.uint64)
    plan = ntt.get_plan(log_n)
    got = gl.to_u64(ntt.ntt_cols(gl.from_u64(coeffs), plan))
    rev = ntt.bitreverse_indices(log_n)
    for b in range(B):
        want = naive_dft(coeffs[:, b], 1, log_n)
        assert np.array_equal(got[:, b], want[rev]), f"col {b}"


def test_coset_ntt_matches_naive_dft():
    log_n = 4
    n = 1 << log_n
    coeffs = RNG.integers(0, P, size=(n, 2), dtype=np.uint64)
    plan = ntt.get_plan(log_n)
    coset = gl.MULTIPLICATIVE_GENERATOR
    got = gl.to_u64(ntt.coset_ntt_cols(gl.from_u64(coeffs), coset, plan))
    rev = ntt.bitreverse_indices(log_n)
    for b in range(2):
        want = naive_dft(coeffs[:, b], coset, log_n)
        assert np.array_equal(got[:, b], want[rev])


@pytest.mark.parametrize("log_n", [1, 5, 10])
def test_roundtrip(log_n):
    n = 1 << log_n
    coeffs = RNG.integers(0, P, size=(n, 4), dtype=np.uint64)
    plan = ntt.get_plan(log_n)
    x = gl.from_u64(coeffs)
    back = ntt.intt_cols(ntt.ntt_cols(x, plan), plan)
    assert np.array_equal(gl.to_u64(back), coeffs)


def test_coset_roundtrip():
    log_n = 6
    n = 1 << log_n
    coeffs = RNG.integers(0, P, size=(n, 2), dtype=np.uint64)
    plan = ntt.get_plan(log_n)
    x = gl.from_u64(coeffs)
    coset = 12345
    back = ntt.coset_intt_cols(ntt.coset_ntt_cols(x, coset, plan), coset, plan)
    assert np.array_equal(gl.to_u64(back), coeffs)


def test_lde_is_full_domain_bitreversed():
    """Concatenated per-coset LDE evals == bitreversed evals of f over the
    full lde-sized coset g·<ω_{n·lde}> — the reference's storage invariant."""
    log_n, lde = 3, 4
    n = 1 << log_n
    coeffs = RNG.integers(0, P, size=(n, 1), dtype=np.uint64)
    out = gl.to_u64(ntt.lde_from_monomials(gl.from_u64(coeffs), log_n, lde))
    # full-domain naive eval
    full_log = log_n + 2
    g = gl.MULTIPLICATIVE_GENERATOR
    want_nat = naive_dft(
        np.concatenate([coeffs[:, 0], np.zeros(n * (lde - 1), dtype=np.uint64)]),
        g, full_log)
    rev_full = ntt.bitreverse_indices(full_log)
    flat = out[:, :, 0].reshape(-1)
    assert np.array_equal(flat, want_nat[rev_full])


def test_materialize_powers():
    pw = gl.to_u64(ntt.materialize_powers(7, 100))
    want = np.array([pow(7, i, P) for i in range(100)], dtype=np.uint64)
    assert np.array_equal(pw, want)


def test_ntt_jit_under_mesh_batch():
    """ntt_cols is jit-compatible and shape-stable."""
    log_n = 8
    plan = ntt.get_plan(log_n)
    f = jax.jit(lambda x: ntt.ntt_cols(x, plan))
    coeffs = RNG.integers(0, P, size=(1 << log_n, 8), dtype=np.uint64)
    a = f(gl.from_u64(coeffs))
    b = ntt.ntt_cols(gl.from_u64(coeffs), plan)
    assert np.array_equal(gl.to_u64(a), gl.to_u64(b))


def test_fourstep_cols_matches_direct():
    import numpy as np
    from boojum_tpu.field import goldilocks as gl
    from boojum_tpu.ntt import ntt
    from boojum_tpu.utils import npgl

    rng = np.random.default_rng(5)
    for log_n in (8, 11):
        n = 1 << log_n
        vals = rng.integers(0, npgl.ORDER, (n, 3), dtype=np.uint64)
        x = gl.from_u64(vals)
        ref = np.asarray(gl.to_u64(ntt.ntt_cols(x, ntt.get_plan(log_n))))
        got = np.asarray(gl.to_u64(ntt.ntt_fourstep_cols(x)))
        assert np.array_equal(got, ref)


def test_intt_fourstep_cols_matches_direct():
    import numpy as np
    from boojum_tpu.field import goldilocks as gl
    from boojum_tpu.ntt import ntt
    from boojum_tpu.utils import npgl

    rng = np.random.default_rng(9)
    log_n = 10
    n = 1 << log_n
    vals = rng.integers(0, npgl.ORDER, (n, 2), dtype=np.uint64)
    y = gl.from_u64(vals)
    ref = np.asarray(gl.to_u64(ntt.coset_intt_cols(y, 7, ntt.get_plan(log_n))))
    got = np.asarray(gl.to_u64(ntt.coset_intt_fourstep_cols(y, 7)))
    assert np.array_equal(got, ref)


def test_fourstep_at_prover_scale():
    """log 16 — the size where the device prover switches to four-step."""
    import numpy as np
    from boojum_tpu.field import goldilocks as gl
    from boojum_tpu.ntt import ntt
    from boojum_tpu.utils import npgl

    rng = np.random.default_rng(4)
    n = 1 << 16
    vals = rng.integers(0, npgl.ORDER, (n, 2), dtype=np.uint64)
    x = gl.from_u64(vals)
    plan = ntt.get_plan(16)
    assert np.array_equal(
        np.asarray(gl.to_u64(ntt.ntt_fourstep_cols(x))),
        np.asarray(gl.to_u64(ntt.ntt_cols(x, plan))))
    assert np.array_equal(
        np.asarray(gl.to_u64(ntt.intt_fourstep_cols(x))),
        np.asarray(gl.to_u64(ntt.intt_cols(x, plan))))


def test_interpolate_final_host_matches_device_path():
    """fri.interpolate_final_host (host Python ints, no dispatch) is
    bit-identical to the coset_intt_cols device path on the final-FRI-layer
    shape (bitreversed coset evaluations of a low-degree poly)."""
    from boojum_tpu.field import goldilocks as gl
    from boojum_tpu.ntt import ntt as _ntt
    from boojum_tpu.prover.fri import interpolate_final_host

    rng = np.random.default_rng(5)
    for m, coset in ((16, 7), (32, 12345678901234567)):
        vals = rng.integers(0, gl.ORDER, m, dtype=np.uint64)
        plan = _ntt.get_plan(m.bit_length() - 1)
        want = gl.to_u64(_ntt.coset_intt_cols(
            gl.from_u64(vals).reshape(m, 1), coset, plan)).reshape(m)
        got = interpolate_final_host(vals, coset)
        assert [int(x) for x in np.asarray(want)] == got


def test_fourstep_batch_layout_paths():
    """All three four-step lane layouts (b == 1 / 1 < b < 128 batch-major /
    b >= 128 wide-trailing) must agree with the direct plan path — they pick
    different twiddle-expansion strategies (round-5 TPU layout rule)."""
    import numpy as np
    from boojum_tpu.field import goldilocks as gl
    from boojum_tpu.ntt import ntt
    from boojum_tpu.utils import npgl

    rng = np.random.default_rng(12)
    log_n = 10
    n = 1 << log_n
    plan = ntt.get_plan(log_n)
    for b in (1, 2, 128):
        vals = rng.integers(0, npgl.ORDER, (n, b), dtype=np.uint64)
        x = gl.from_u64(vals)
        assert np.array_equal(
            np.asarray(gl.to_u64(ntt.ntt_fourstep_cols(x))),
            np.asarray(gl.to_u64(ntt.ntt_cols(x, plan)))), b
        assert np.array_equal(
            np.asarray(gl.to_u64(ntt.intt_fourstep_cols(x))),
            np.asarray(gl.to_u64(ntt.intt_cols(x, plan)))), b
