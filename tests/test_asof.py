"""As-of join semantics: most-recent-at-or-before match, NULL when no prior
row, tolerance bound, per-key isolation — pinned on hand-built frames (the
sf-data oracle check runs via asof_last_purchase vs DuckDB's native ASOF)."""

from __future__ import annotations

import datetime as dt

import pytest

from scala_etl_test_spark.operators.asof import as_of_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01 10:00:00")),  # before any right row
            (2, 100, _ts("2024-01-01 12:00:00")),  # matches 11:00
            (3, 100, _ts("2024-01-01 13:00:00")),  # matches 13:00 exactly (<=)
            (4, 200, _ts("2024-01-01 12:30:00")),  # other user, matches 12:00
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2024-01-01 11:00:00"), 10.0),
            (100, _ts("2024-01-01 13:00:00"), 30.0),
            (200, _ts("2024-01-01 12:00:00"), 99.0),
        ],
        "user_id long, ts timestamp, price double",
    )
    return left, right


def _result(df):
    return {r["event_id"]: r["price"] for r in df.collect()}


def test_most_recent_at_or_before(frames):
    left, right = frames
    out = as_of_join(left, right, ["user_id"], "ts", "ts", ["price"])
    assert out.count() == left.count()
    assert _result(out) == {1: None, 2: 10.0, 3: 30.0, 4: 99.0}


def test_tolerance_voids_stale_matches(frames):
    left, right = frames
    out = as_of_join(
        left, right, ["user_id"], "ts", "ts", ["price"], tolerance_seconds=1800
    )
    # event 2 is 60 min after its match → voided; event 3 is exact → kept
    assert _result(out) == {1: None, 2: None, 3: 30.0, 4: 99.0}


def test_value_col_collision_raises(frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        as_of_join(left, right.withColumnRenamed("price", "ts2"), ["user_id"], "ts", "ts", ["user_id"])


def test_left_columns_preserved(frames):
    left, right = frames
    out = as_of_join(left, right, ["user_id"], "ts", "ts", ["price"])
    assert out.columns == ["event_id", "user_id", "ts", "price"]
