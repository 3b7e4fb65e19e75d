from __future__ import annotations

import random

from pyspark.sql import functions as F

from scala_etl_test_spark.operators.allocate import largest_remainder_allocation


def _run(spark, rows):
    df = spark.createDataFrame(rows, "grp long, line int, amt long, w long")
    return largest_remainder_allocation(
        df, "grp", F.col("amt"), F.col("w"), "line"
    ).collect()


def test_hand_computed_allocation(spark):
    # amount 100 cents over weights 1:1:1 -> floors 33,33,33, leftover 1
    # goes to the largest remainder; remainders equal -> line 1 wins
    out = {r["line"]: r["alloc_cents"] for r in _run(
        spark, [(1, 1, 100, 5), (1, 2, 100, 5), (1, 3, 100, 5)]
    )}
    assert out == {1: 34, 2: 33, 3: 33}


def test_remainder_goes_to_largest_fraction(spark):
    # amount 10 over weights 1,2: shares 3.33 and 6.67 -> floors 3,6;
    # leftover 1 cent goes to line 2 (remainder 2/3 > 1/3)
    out = {r["line"]: r["alloc_cents"] for r in _run(
        spark, [(1, 1, 10, 1), (1, 2, 10, 2)]
    )}
    assert out == {1: 3, 2: 7}


def test_zero_weight_group_gives_all_to_first(spark):
    out = {r["line"]: r["alloc_cents"] for r in _run(
        spark, [(1, 1, 55, 0), (1, 2, 55, 0)]
    )}
    assert out == {1: 55, 2: 0}


def test_conservation_on_random_groups(spark):
    """Σ alloc == amount EXACTLY for every random group; allocations differ
    from naive rounding by at most one cent per member."""
    rng = random.Random(9)
    rows = []
    amounts = {}
    for g in range(15):
        amt = rng.randrange(1, 10**7)
        amounts[g] = amt
        for line in range(rng.randint(1, 9)):
            rows.append((g, line, amt, rng.randrange(0, 10**5)))
    got = _run(spark, rows)
    sums: dict[int, int] = {}
    for r in got:
        sums[r["grp"]] = sums.get(r["grp"], 0) + r["alloc_cents"]
        assert r["alloc_cents"] >= 0
    assert sums == amounts


def test_negative_amount_conserves_exactly(spark):
    # credit/refund group: -100 over 1:1:1 -> floors -34 each (floor, not
    # trunc), leftover 2 cents -> first two lines get +1: sums to -100
    out = {r["line"]: r["alloc_cents"] for r in _run(
        spark, [(1, 1, -100, 1), (1, 2, -100, 1), (1, 3, -100, 1)]
    )}
    assert out == {1: -33, 2: -33, 3: -34}
    assert sum(out.values()) == -100


def test_null_weight_treated_as_zero(spark):
    # ADVICE r4: a NULL weight used to poison the member's share while the
    # window sum skipped it, so the group allocated < amount. NULL == 0 now.
    out = {r["line"]: r["alloc_cents"] for r in _run(
        spark, [(1, 1, 90, 1), (1, 2, 90, None), (1, 3, 90, 2)]
    )}
    assert out == {1: 30, 2: 0, 3: 60}
    assert sum(out.values()) == 90


def test_all_null_weights_degenerate_to_first(spark):
    out = {r["line"]: r["alloc_cents"] for r in _run(
        spark, [(2, 1, 77, None), (2, 2, 77, None)]
    )}
    assert out == {1: 77, 2: 0}
