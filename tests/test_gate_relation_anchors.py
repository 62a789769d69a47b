"""Semantic anchors for evaluators with no other test coverage
(docs/GATE_ANCHORS.md; round-2 VERDICT weak item 8).

Witness values are derived from PLAIN integer semantics (python ints mod p),
never from the evaluator's own field formula; check_if_satisfied then runs
the constraint terms scalar-wise — all must vanish, and corrupting one
output must break exactly that relation. Reference relations:
parallel_selection.rs:106, quadratic_combination.rs:97,
reduction_by_powers_gate.rs:103.
"""

import numpy as np

from boojum_tpu.cs.cs import ConstraintSystem, CSConfig
from boojum_tpu.cs.gates import ConstantsAllocatorGate, NopGate
from boojum_tpu.cs.gates.simple import (ParallelSelectionGate,
                                        QuadraticCombinationGate,
                                        ReductionByPowersGate)
from boojum_tpu.cs.geometry import CSGeometry

P = (1 << 64) - (1 << 32) + 1
RNG = np.random.default_rng(23)


def _make_cs():
    cs = ConstraintSystem(
        CSGeometry(num_columns_under_copy_permutation=32,
                   num_witness_columns=0, num_constant_columns=4,
                   max_allowed_constraint_degree=8),
        256, CSConfig.dev())
    cs.allow_gate(ConstantsAllocatorGate)
    cs.allow_gate(NopGate)
    return cs


def test_parallel_selection_relation():
    """per lane: sel·a_i + (1-sel)·b_i == out_i (shared boolean sel)."""
    cs = _make_cs()
    n = 4
    cs.allow_evaluator(ParallelSelectionGate.make_evaluator(n))
    for sel_val in (0, 1):
        a = RNG.integers(0, P, n, dtype=np.uint64)
        b = RNG.integers(0, P, n, dtype=np.uint64)
        out = a if sel_val else b  # integer semantics, not the field formula
        sel = cs.alloc_variables_with_values([sel_val])[0]
        av = cs.alloc_variables_with_values(a)
        bv = cs.alloc_variables_with_values(b)
        ov = cs.alloc_variables_with_values(out)
        row = [int(sel)]
        for i in range(n):
            row.extend((int(av[i]), int(bv[i]), int(ov[i])))
        cs.place_general_gate_batch(f"parallel_selection_{n}", None, [],
                                    np.asarray([row], np.uint64))
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()
    cs.resolver.values[int(ov[0])] = (int(out[0]) + 1) % P
    assert not cs.check_if_satisfied(verbose=False)


def test_quadratic_combination_relation():
    """Σ a_i·b_i == 0 over the 2n placed variables."""
    cs = _make_cs()
    n = 4
    cs.allow_evaluator(QuadraticCombinationGate.make_evaluator(n))
    a = [int(x) for x in RNG.integers(1, P, n, dtype=np.uint64)]
    b = [int(x) for x in RNG.integers(1, P, n - 1, dtype=np.uint64)]
    # choose the last b so the combination vanishes (integer semantics)
    partial = sum(x * y for x, y in zip(a, b)) % P
    b.append((-partial) * pow(a[-1], P - 2, P) % P)
    assert sum(x * y for x, y in zip(a, b)) % P == 0
    row = []
    for x, y in zip(a, b):
        row.append(int(cs.alloc_variables_with_values([x])[0]))
        row.append(int(cs.alloc_variables_with_values([y])[0]))
    cs.place_general_gate_batch(f"quadratic_combination_{n}", None, [],
                                np.asarray([row], np.uint64))
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()
    cs.resolver.values[row[0]] = (a[0] + 1) % P
    assert not cs.check_if_satisfied(verbose=False)


def test_reduction_by_powers_relation():
    """Σ term_i · c^i == result, c a row-shared constant."""
    cs = _make_cs()
    n = 4
    cs.allow_evaluator(ReductionByPowersGate.make_evaluator(n))
    c = 0x1234567890
    terms = [int(x) for x in RNG.integers(0, P, n, dtype=np.uint64)]
    result = sum(t * pow(c, i, P) for i, t in enumerate(terms)) % P
    tv = cs.alloc_variables_with_values(terms)
    rv = cs.alloc_variables_with_values([result])[0]
    row = [int(x) for x in tv] + [int(rv)]
    cs.place_general_gate_batch(f"reduction_by_powers_{n}", (c,), [c],
                                np.asarray([row], np.uint64))
    cs.pad_and_shrink()
    assert cs.check_if_satisfied()
    cs.resolver.values[int(rv)] = (result + 1) % P
    assert not cs.check_if_satisfied(verbose=False)
