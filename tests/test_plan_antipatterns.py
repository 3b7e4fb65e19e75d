"""Registry-wide static scale-killer gate.

Two plan nodes are absolute anti-patterns at 100 TB and must never appear
in ANY registered query's physical plan, with no allowlist:

- ``CartesianProduct`` — an unguarded all-pairs join. Every intentional
  scalar join in this engine (totals, n_nodes, query vectors, thresholds)
  crosses a **1-row broadcast** and therefore plans as
  ``BroadcastNestedLoopJoin`` (constant per-row work), never as a
  CartesianProduct; the brute-force dedup twin auto-switches to its banded
  plan above a row threshold (operators/dedup.py) precisely so this node
  can stay forbidden.
- ``BatchEvalPython`` — a row-at-a-time Python UDF. The only permitted
  Python data paths are Arrow-batched (``ArrowEvalPython`` /
  ``MapInPandas`` / ``FlatMapGroupsInPandas``), which move columnar
  batches, not pickled rows.

``BroadcastNestedLoopJoin`` itself is NOT gated: with a 1-row build side
it is the correct scalar-join plan (measured: 33 registry queries use it
exactly this way), and its row-count is a runtime property a static plan
string cannot verify.

This pins in CI what VERDICT r7's manual anti-pattern scan verified by
hand ("zero row UDFs, zero unguarded cartesians").
"""

from __future__ import annotations

import pytest

from scala_etl_test_spark.plans.queries import QUERIES

FORBIDDEN_NODES = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_has_no_scale_killers(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for node in FORBIDDEN_NODES:
        assert node not in plan, (
            f"{name} plans a {node} — an unguarded all-pairs join or a "
            f"row-at-a-time Python UDF cannot ship at scale:\n{plan}"
        )
