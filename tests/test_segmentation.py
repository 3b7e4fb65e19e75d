from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from scala_etl_test_spark.operators.segmentation import (
    SEGMENT_BABY,
    SEGMENT_FRIEND,
    SEGMENT_OFFERS,
    SEGMENT_UNDEFINED,
    clients_segmentation,
    exact_quantiles_per_group,
)

SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("order_number", T.IntegerType()),
        T.StructField("order_dow", T.IntegerType()),
        T.StructField("days_since_prior_order", T.IntegerType()),
        T.StructField("number_of_products", T.IntegerType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_exact_quantiles_match_approx_quantile_loop(spark):
    # pin: one-pass groupBy percentile_approx(acc=INT_MAX) == per-group
    # approxQuantile(..., 0.0) driver loop (the reference formulation)
    rows = []
    oid = 0
    for dow in range(3):
        for q in [1, 2, 2, 3, 5, 8, 8, 8, 13, 21][: 4 + dow * 3]:
            rows.append((oid, oid % 7, 1, dow, 3, q + dow))
            oid += 1
    df = _df(spark, rows)
    got = {
        r["order_dow"]: (r["first_q"], r["second_q"], r["third_q"])
        for r in exact_quantiles_per_group(df, "number_of_products", "order_dow").collect()
    }
    for dow in range(3):
        ref = df.filter(F.col("order_dow") == dow).stat.approxQuantile(
            "number_of_products", [0.25, 0.5, 0.75], 0.0
        )
        assert got[dow] == tuple(ref), (dow, got[dow], ref)


def test_segment_rules_and_gaps(spark):
    # Probe users across every rule branch and the dspo gaps {8,9,20};
    # expected segments are recomputed with an independent Python
    # implementation of the reference rules (ApplaudoETL.scala:237-243)
    # fed by Spark's own exact quantiles over the same data.
    rows = []
    oid = 0
    for q in range(1, 9):  # background distribution for dow 0
        rows.append((oid, 100 + q, 1, 0, 8, q))
        oid += 1
    probes = [(1, 7, 99), (2, 7, 1), (3, 15, 60), (4, 21, 60), (5, 8, 50), (6, 9, 50), (7, 20, 50)]
    for user, dspo, qty in probes:
        rows.append((oid, user, 1, 0, dspo, qty))
        oid += 1
    df = _df(spark, rows)
    q1, q2, q3 = df.filter(F.col("order_dow") == 0).stat.approxQuantile(
        "number_of_products", [0.25, 0.5, 0.75], 0.0
    )

    def expected(dspo, total):
        if dspo <= 7 and total > q3:
            return SEGMENT_FRIEND
        if 10 <= dspo <= 19 and total > q2:
            return SEGMENT_BABY
        if dspo > 20 and total > q1:
            return SEGMENT_OFFERS
        return SEGMENT_UNDEFINED

    got = {r["user_id"]: r["client_segment"] for r in clients_segmentation(df).collect()}
    for user, dspo, qty in probes:
        assert got[user] == expected(dspo, qty), (user, dspo, qty, q1, q2, q3)
    # rule-branch coverage: the probes must actually hit every segment
    assert {got[1], got[3], got[4], got[5]} == {
        SEGMENT_FRIEND,
        SEGMENT_BABY,
        SEGMENT_OFFERS,
        SEGMENT_UNDEFINED,
    }
    # gaps always Undefined regardless of total
    assert got[5] == got[6] == got[7] == SEGMENT_UNDEFINED


def test_deterministic_pick_is_max_order_number(spark):
    # user 1 has two rows with different segments; deterministic mode must
    # keep the max-order_number row's segment
    rows = [
        # background rows to fix quantiles at q1=2,q2=4,q3=6 for dow 0
        *[(i, 100 + i, 1, 0, 8, i + 1) for i in range(8)],
        (50, 1, 1, 0, 7, 40),   # FRIEND if chosen
        (51, 1, 2, 0, 8, 40),   # UNDEFINED if chosen (max order_number)
    ]
    df = _df(spark, rows)
    got = {r["user_id"]: r["client_segment"] for r in clients_segmentation(df, deterministic=True).collect()}
    assert got[1] == SEGMENT_UNDEFINED
