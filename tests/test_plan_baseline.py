"""Registry-wide plan-shape regression gate.

Every registered query's compile-time plan shape (scans, exchanges, join
strategies, windows, Python nodes) must match the committed baseline —
hand-written gates in test_plans.py cover the headline properties; this
catches silent regressions everywhere else (a lost broadcast, an extra
shuffle, a rescan) the moment they appear. When a plan change is
INTENTIONAL, regenerate with ``python tools/plan_snapshot.py`` and review
the baseline diff in the commit.
"""

from __future__ import annotations

import json
import pathlib

import pytest

from scala_etl_test_spark.plans.queries import QUERIES

from tools.plan_snapshot import shape

BASELINE = json.loads(
    (pathlib.Path(__file__).parent / "plan_baseline.json").read_text()
)


def test_baseline_covers_every_query():
    assert set(BASELINE) == set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_shape_matches_baseline(spark, sf_dir, name):
    # clear BEFORE planning too: persisted frames leaked by earlier test
    # modules (session-scoped spark) would otherwise substitute
    # InMemoryTableScans into this plan and drift it from baseline
    spark.catalog.clearCache()
    got = shape(QUERIES[name](spark, sf_dir)._jdf.queryExecution())
    spark.catalog.clearCache()
    assert got == BASELINE[name], (
        f"{name} plan shape drifted from baseline.\n"
        f"  baseline: {BASELINE[name]}\n"
        f"  current:  {got}\n"
        "If intentional: python tools/plan_snapshot.py and review the diff."
    )
