"""Blanket physical-plan anti-pattern gate over the FULL registry.

tests/test_plans.py pins specific plan shapes for flagship queries; this
test is the catch-all: every one of the ~129 registry queries' physical
plans must be free of CartesianProduct (un-broadcast cross join) and
BatchEvalPython (row-at-a-time pickled Python UDF). Both are scale
killers that can be introduced silently by a refactor — e.g. dropping a
broadcast() hint or switching a pandas_udf back to F.udf — and neither
shows up in correctness parity or a small-SF benchmark."""

import os

import pytest

from tools.planlint import lint_registry

# sf0.001: plan SHAPES are scale-independent (same operators, same joins)
# and the smallest dataset minimizes the eager plan-time work a few
# queries do (scalar probes, quantizer training), keeping the suite fast.
SF = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.exists(SF), reason="driver testdata not present"
)


@needs_testdata
def test_no_cartesian_or_rowwise_python_anywhere(spark):
    violations, exchanges, errors = lint_registry(spark, SF)
    assert errors == {}, errors
    assert violations == [], violations
    # sanity: the lint actually walked the registry
    assert len(exchanges) >= 120
