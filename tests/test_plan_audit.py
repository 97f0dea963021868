"""Whole-registry physical-plan audit (SURVEY scale rules, enforced):

For EVERY query in the driver registry, the executed plan must contain
- no ``CartesianProduct`` (unbounded pair blowup — broadcast-1-row
  cross joins compile to BroadcastNestedLoopJoin and stay allowed), and
- no ``BatchEvalPython`` (row-at-a-time Python UDF — everything Python
  must be Arrow-batched: ArrowEvalPython / MapInPandas /
  FlatMapGroupsInPandas).

This is the anti-regression net for the two easiest ways to silently
wreck 100 TB scalability when touching an operator.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")

# Queries whose build MATERIALIZES work (streaming replays / stateful
# folds): their returned frame is a post-hoc local/checkpointed result,
# so the interesting plans already ran — auditing the residual plan is
# meaningless. Every operator inside them is audited via its batch twin
# (a6/c1-c3) or its own plan test.
MATERIALIZING = {"c4_watermark", "c6_cdc_apply", "c7_stateful_lww"}


@pytest.mark.parametrize(
    "name", [q for q in entrymod.queries() if q not in MATERIALIZING]
)
def test_no_forbidden_physical_operators(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for op in FORBIDDEN:
        assert op not in plan, f"{name}: {op} in physical plan\n{plan[:2000]}"
