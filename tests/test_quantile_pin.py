"""Empirical pin of quantile rank conventions across engines (SURVEY §5.2):

- Spark ``approxQuantile(..., relativeError=0.0)`` (the reference's exact
  formulation, ApplaudoETL.scala:250-257)
  == Spark ``percentile_approx(..., accuracy=INT_MAX)`` (the engine's
  single-pass rewrite)
  == DuckDB ``quantile_disc`` (discrete / lower-element convention);
- Spark ``percentile`` == DuckDB ``quantile_cont`` (linear interpolation) —
  the convention used by the oracle-checked quantile queries.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

PROBS = [0.25, 0.5, 0.75]


def _duck(vals, fn):
    con = duckdb.connect()
    con.execute("create table t(x int)")
    con.executemany("insert into t values (?)", [(v,) for v in vals])
    out = con.sql(f"select {fn}(x, [0.25,0.5,0.75]) from t").fetchone()[0]
    con.close()
    return [float(v) for v in out]


@pytest.mark.slow
@given(st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=12))
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_discrete_convention_pin(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    aq = df.stat.approxQuantile("x", PROBS, 0.0)
    pa = [
        float(v)
        for v in df.selectExpr(
            "percentile_approx(x, array(0.25,0.5,0.75), 2147483647) p"
        ).first()["p"]
    ]
    assert aq == pa == _duck(vals, "quantile_disc"), vals


@pytest.mark.slow
@given(st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=12))
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_continuous_convention_pin(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    pct = [
        float(v)
        for v in df.selectExpr("percentile(x, array(0.25,0.5,0.75)) p").first()["p"]
    ]
    assert pct == pytest.approx(_duck(vals, "quantile_cont")), vals
