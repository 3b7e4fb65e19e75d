"""Item-kNN collaborative filtering (operators/recsys.py)."""

from __future__ import annotations

import math

from scala_etl_test_spark.operators.recsys import item_item_cosine


def _df(spark, baskets):
    rows = [(b, i) for b, items in baskets.items() for i in items]
    return spark.createDataFrame(rows, "basket long, item long")


def test_cosine_values_and_ranks(spark):
    # items 1,2 co-occur in baskets 10,11; item 3 joins 1 once (below support)
    baskets = {10: [1, 2], 11: [1, 2], 12: [1, 3], 13: [2], 14: [3]}
    out = item_item_cosine(_df(spark, baskets), "basket", "item", min_support=2).collect()
    got = {(r["item"], r["neighbor"]): (r["co_baskets"], r["cosine"], r["rank"]) for r in out}
    # n1=3, n2=3, co=2 -> 2/3; symmetric; (1,3) pruned by support
    expect = round(2 / math.sqrt(9), 6)
    assert got == {(1, 2): (2, expect, 1), (2, 1): (2, expect, 1)}


def test_basket_cap_excludes_mega_baskets(spark):
    small = {1: [1, 2], 2: [1, 2]}
    mega = {9: list(range(100, 150))}
    both = {**small, **mega}
    out = item_item_cosine(_df(spark, both), "basket", "item", min_support=1, basket_cap=10)
    items = {r["item"] for r in out.collect()}
    # mega-basket items never pair; the small pair survives with full counts
    assert items == {1, 2}
    r = out.filter("item = 1").collect()[0]
    assert r["co_baskets"] == 2 and r["cosine"] == 1.0


def test_top_k_per_item_with_id_tiebreak(spark):
    # item 1 co-occurs once with each of 2..5 in single-item-pair baskets
    baskets = {i: [1, i + 1] for i in range(2, 6)}
    out = item_item_cosine(
        _df(spark, baskets), "basket", "item", min_support=1, top_k=2
    ).filter("item = 1")
    rows = sorted((r["rank"], r["neighbor"]) for r in out.collect())
    # all cosines tie (co=1, n=1 each side vs n1=4 -> 0.5) -> id ascending
    assert rows == [(1, 3), (2, 4)]


def test_duplicate_rows_in_basket_counted_once(spark):
    df = _df(spark, {1: [7, 8, 8, 7], 2: [7, 8]})
    out = item_item_cosine(df, "basket", "item", min_support=1).filter("item = 7").collect()
    assert out[0]["co_baskets"] == 2 and out[0]["cosine"] == 1.0
