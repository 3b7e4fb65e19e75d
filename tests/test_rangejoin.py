"""Bin-blocked range join: containment semantics, bin-width independence,
left join NULL fill — pinned on hand-built frames."""

from __future__ import annotations

import datetime as dt

import pytest

from scala_etl_test_spark.operators.rangejoin import range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def frames(spark):
    points = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01 10:30:00")),  # inside iv A
            (2, 1, _ts("2024-01-01 12:00:00")),  # exactly iv A end (closed)
            (3, 1, _ts("2024-01-01 18:00:00")),  # in no interval
            (4, 2, _ts("2024-01-01 10:30:00")),  # same time, other key → iv B
            (5, 1, _ts("2024-01-02 09:00:00")),  # inside iv C (spans midnight)
        ],
        "point_id long, k long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("A", 1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 12:00:00")),
            ("B", 2, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
            ("C", 1, _ts("2024-01-01 20:00:00"), _ts("2024-01-02 10:00:00")),
        ],
        "iv_id string, k long, start timestamp, end timestamp",
    )
    return points, intervals


def _matches(df):
    return {(r["point_id"], r["iv_id"]) for r in df.collect()}


@pytest.mark.parametrize("bin_width", [60, 3600, 86400])
def test_containment_independent_of_bin_width(frames, bin_width):
    points, intervals = frames
    out = range_join(
        points, intervals, "ts", "start", "end", ["k"], bin_width_seconds=bin_width
    )
    assert _matches(out) == {(1, "A"), (2, "A"), (4, "B"), (5, "C")}


def test_left_join_keeps_unmatched_points(frames):
    points, intervals = frames
    out = range_join(points, intervals, "ts", "start", "end", ["k"], how="left")
    assert _matches(out) == {(1, "A"), (2, "A"), (4, "B"), (5, "C"), (3, None)}
    assert out.count() == 5


def test_overlapping_intervals_multi_match(spark):
    points = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:30:00"))], "point_id long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
            ("B", _ts("2024-01-01 10:15:00"), _ts("2024-01-01 10:45:00")),
        ],
        "iv_id string, start timestamp, end timestamp",
    )
    out = range_join(points, intervals, "ts", "start", "end", bin_width_seconds=600)
    # one row per matching interval, never duplicated per spanned bin
    assert _matches(out) == {(1, "A"), (1, "B")}
    assert out.count() == 2
