"""Testing-tools parity (reference src/cs/gates/testing_tools.rs +
gates/mod.rs:360-390 assertion helpers): every evaluator registered by the
test circuits pushes exactly its claimed term count and stays inside its
declared instance width.
"""

import numpy as np
import pytest

from boojum_tpu.cs.gates.testing import (assert_no_placeholders,
                                         assert_not_placeholder,
                                         test_evaluator)
from boojum_tpu.cs import places

from tests.test_prove_verify import build_small_circuit


def _all_evaluators(cs):
    evs = list(cs.evaluators_general)
    evs += list(cs.evaluators_specialized)
    return [e for e in evs if e.num_quotient_terms > 0]


def test_small_circuit_evaluators():
    cs = build_small_circuit(with_lookup=True, n_fma=4)
    evs = _all_evaluators(cs)
    assert evs
    for ev in evs:
        test_evaluator(ev)


def test_sha256_circuit_evaluators():
    from tests.test_sha256 import build_sha256_circuit

    data = bytes(np.random.default_rng(0).integers(0, 256, 8, dtype=np.uint8))
    cs, _ = build_sha256_circuit(data)
    for ev in _all_evaluators(cs):
        test_evaluator(ev)


def test_poseidon_gate_evaluators():
    """The widest evaluators (flattened Poseidon/Poseidon2 gates)."""
    from boojum_tpu.cs import ConstraintSystem, CSConfig, CSGeometry
    from boojum_tpu.gadgets.poseidon2_circuit import allow_poseidon2_gates
    from boojum_tpu.gadgets.recursion.primitives import allow_poseidon_gates

    geom = CSGeometry(num_columns_under_copy_permutation=132,
                      num_witness_columns=0, num_constant_columns=8,
                      max_allowed_constraint_degree=8)
    cs = ConstraintSystem(geom, 1 << 6, CSConfig.dev())
    allow_poseidon2_gates(cs, flattened=True)
    allow_poseidon_gates(cs, flattened=True)
    for ev in _all_evaluators(cs):
        test_evaluator(ev)


def test_term_count_mismatch_detected():
    """A lying evaluator is caught (the property the reference harness
    exists to check)."""
    from boojum_tpu.cs.gates.base import GateEvaluator

    class Liar(GateEvaluator):
        name = "liar"
        num_variables = 2
        num_quotient_terms = 2
        max_constraint_degree = 1

        def evaluate(self, src, ops):
            return [src.var(0)]  # claims 2, pushes 1

    with pytest.raises(AssertionError, match="claims 2 terms"):
        test_evaluator(Liar())


def test_width_overrun_detected():
    from boojum_tpu.cs.gates.base import GateEvaluator

    class Wide(GateEvaluator):
        name = "wide"
        num_variables = 1
        num_quotient_terms = 1
        max_constraint_degree = 1

        def evaluate(self, src, ops):
            return [ops.add(src.var(0), src.var(1))]  # reads past width

    with pytest.raises(AssertionError, match="beyond claimed width"):
        test_evaluator(Wide())


def test_placeholder_asserts():
    assert_not_placeholder(places.variable(3))
    assert_no_placeholders([places.variable(0), places.witness(1)])
    with pytest.raises(AssertionError):
        assert_not_placeholder(places.PLACEHOLDER)
    with pytest.raises(AssertionError):
        assert_no_placeholders([places.variable(0), places.PLACEHOLDER])
