"""Gap-fill / LOCF temporal regularization (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from scala_etl_test_spark.operators.timeseries import gap_fill_daily


def _df(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, key long, v double")


def _t(day, hour=12):
    return dt.datetime(2024, 1, day, hour, 0, 0)


def test_grid_is_dense_and_states_distinguished(spark):
    # key 1: days 1 and 3 (gap on 2); key 2: only day 2
    df = _df(spark, [(_t(1), 1, 10.0), (_t(3), 1, 5.0), (_t(3, 13), 1, 5.0), (_t(2), 2, 7.0)])
    out = {(r["key"], r["day"]): r for r in gap_fill_daily(df, "ts", "key", "v").collect()}
    assert len(out) == 6  # 2 keys x 3 days
    # observed day
    r = out[(1, "2024-01-01")]
    assert (r["n_events"], r["day_value"], r["filled_value"]) == (1, 10.0, 10.0)
    # gap day: absence (NULL day_value) but LOCF fills
    r = out[(1, "2024-01-02")]
    assert (r["n_events"], r["day_value"], r["filled_value"]) == (0, None, 10.0)
    # two events aggregate
    r = out[(1, "2024-01-03")]
    assert (r["n_events"], r["day_value"], r["filled_value"]) == (2, 10.0, 10.0)
    # leading missing days stay NULL (not-yet-observed != zero)
    r = out[(2, "2024-01-01")]
    assert (r["n_events"], r["day_value"], r["filled_value"]) == (0, None, None)
    r = out[(2, "2024-01-03")]
    assert (r["n_events"], r["day_value"], r["filled_value"]) == (0, None, 7.0)


def test_global_calendar_covers_all_keys(spark):
    df = _df(spark, [(_t(5), 1, 1.0), (_t(9), 2, 1.0)])
    out = gap_fill_daily(df, "ts", "key", "v")
    days = sorted({r["day"] for r in out.collect()})
    assert days[0] == "2024-01-05" and days[-1] == "2024-01-09" and len(days) == 5
    assert out.count() == 10
