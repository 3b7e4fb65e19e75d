"""Per-user segmentation rule engine driven by exact per-group quantiles.

Reference: ``getClientsSegmentation`` (ApplaudoETL.scala:229-264) — a driver
loop of 7 ``approxQuantile(..., relativeError=0.0)`` jobs (exact quantiles of
per-line-item ``number_of_products`` for each ``order_dow``), the resulting
Map serialized into a UDF closure, then a whole-partition window sum and
``dropDuplicates("user_id")``.

Spark-first rebuild
-------------------
- The 7 driver jobs become **one** ``groupBy(order_dow).percentile_approx``
  pass (7× fewer scans); ``percentile_approx`` with accuracy
  ``INT_MAX`` reproduces ``approxQuantile(..., 0.0)`` exactly (both are the
  Greenwald-Khanna sketch at zero error: the returned value is a real element
  of the group).
- The UDF closure becomes a **broadcast join** of the 7-row quantile table on
  ``order_dow`` + a native ``when`` chain — no Python in the hot path, and at
  100 TB the quantile table is still 7 rows.

Semantics trap (SURVEY.md §2.8 Trap 2): the segment depends on the row's
``order_dow``/``days_since_prior_order``, which vary within a user, yet the
reference collapses with ``dropDuplicates("user_id")`` — partition-order
nondeterminism. :func:`clients_segmentation` offers ``deterministic=True``
(documented deviation: keep the row with max ``order_number``, tie-broken by
``order_id``) and ``deterministic=False`` (reference-faithful arbitrary row).

Rules (ApplaudoETL.scala:237-243), with q1/q2/q3 the 25/50/75-pct for the
row's dow: ``dspo <= 7 and total > q3`` → "You've Got a Friend in Me";
``10 <= dspo <= 19 and total > q2`` → "Baby come Back"; ``dspo > 20 and
total > q1`` → "Special Offers"; else "Undefined" (gaps dspo ∈ {8,9,20}).
Note the threshold is a *line-item* statistic compared against the
*user-level* total — faithful to the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SEGMENT_FRIEND = "You've Got a Friend in Me"
SEGMENT_BABY = "Baby come Back"
SEGMENT_OFFERS = "Special Offers"
SEGMENT_UNDEFINED = "Undefined"

# percentile_approx at this accuracy is exact (= approxQuantile(..., 0.0)).
_EXACT_ACCURACY = 2147483647


def exact_quantiles_per_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    probabilities: tuple[float, ...] = (0.25, 0.5, 0.75),
    names: tuple[str, ...] = ("first_q", "second_q", "third_q"),
) -> DataFrame:
    """Exact quantiles per group in ONE pass (vs the reference's per-group
    driver loop, ApplaudoETL.scala:250-257). Returns one row per group with
    one column per requested probability."""
    probs = ", ".join(str(p) for p in probabilities)
    agg = F.expr(
        f"percentile_approx({value_col}, array({probs}), {_EXACT_ACCURACY})"
    ).alias("_qs")
    out = df.groupBy(group_col).agg(agg)
    for i, name in enumerate(names):
        out = out.withColumn(name, F.col("_qs").getItem(i).cast("double"))
    return out.drop("_qs")


def segment_expr(
    dspo: str = "days_since_prior_order",
    total: str = "total_products_bought",
    q1: str = "first_q",
    q2: str = "second_q",
    q3: str = "third_q",
) -> F.Column:
    """The segmentation rules as one native expression
    (ApplaudoETL.scala:237-243)."""
    return (
        F.when((F.col(dspo) <= 7) & (F.col(total) > F.col(q3)), F.lit(SEGMENT_FRIEND))
        .when(
            (F.col(dspo) >= 10) & (F.col(dspo) <= 19) & (F.col(total) > F.col(q2)),
            F.lit(SEGMENT_BABY),
        )
        .when((F.col(dspo) > 20) & (F.col(total) > F.col(q1)), F.lit(SEGMENT_OFFERS))
        .otherwise(F.lit(SEGMENT_UNDEFINED))
    )


def clients_segmentation(df_products: DataFrame, deterministic: bool = True) -> DataFrame:
    """``getClientsSegmentation`` equivalent → ``user_id, client_segment``.

    The quantile table (7 rows) is broadcast-joined on ``order_dow`` — the
    closure-free formulation of the reference's quantile Map.
    """
    quantiles = exact_quantiles_per_group(
        df_products, "number_of_products", "order_dow"
    )
    w = Window.partitionBy("user_id")
    labeled = (
        df_products.withColumn("total_products_bought", F.sum("number_of_products").over(w))
        .join(F.broadcast(quantiles), on="order_dow", how="left")
        .withColumn("client_segment", segment_expr())
    )
    if deterministic:
        # Documented deviation from the reference's arbitrary-row collapse:
        # keep each user's row with max order_number (tie-break order_id).
        pick = Window.partitionBy("user_id").orderBy(
            F.col("order_number").desc(), F.col("order_id").desc()
        )
        return (
            labeled.withColumn("_rn", F.row_number().over(pick))
            .filter(F.col("_rn") == 1)
            .select("user_id", "client_segment")
        )
    return labeled.select("user_id", "client_segment").dropDuplicates(["user_id"])
