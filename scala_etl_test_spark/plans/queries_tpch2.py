"""TPC-H classics, second tranche: the join/subquery patterns not covered by
the first-tranche headliners (Q1/Q3/Q5/Q6/Q10/Q14/Q18 in
:mod:`scala_etl_test_spark.plans.queries`).

Covered here: correlated-min via window rank (Q2), EXISTS semi-join
aggregation (Q4), nation-pair disjunctive join (Q7), market-share conditional
ratio (Q8), HAVING-above-scalar-fraction (Q11), derived-bucket two-way
conditional count (Q12), outer-join count distribution (Q13), max-equality
selection via a scalar aggregate (Q15), distinct-count with NOT-IN exclusion
(Q16), correlated scalar-average subquery (Q17), disjunctive multi-predicate
join (Q19), two-granularity aggregate comparison (Q20), multi-EXISTS sole-
latest-shipper (Q21), and anti-join + global-scalar threshold (Q22).

The driver testdata (TESTDATA.md) is TPC-H-ish but lacks ``partsupp``,
``l_commitdate``/``l_receiptdate``/``l_shipmode`` and customer phone columns,
so queries that reference those are adapted (documented per query) while
keeping the *pattern* — the join shape, subquery structure, and aggregation
style — intact.

Scale notes (100 TB stance): every scalar subquery is computed as a 1-row
DataFrame and broadcast (never collected into a driver literal inside the
plan-building hot path); the per-part averages of Q17 broadcast because the
filtered part list is small; Q13's outer join shuffles on the customer key
once, and the second aggregation is a tiny rollup of at most ``max(c_count)``
groups. All money math follows the exact-decimal determinism contract from
:mod:`scala_etl_test_spark.plans.queries`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from scala_etl_test_spark.caching import tracked_persist


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from scala_etl_test_spark.sources.parquet_source import read_table

    return read_table(spark, sf_dir, name)


def _dec(col: str | F.Column, scale: int = 2) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(12,{scale})")


def _revenue() -> F.Column:
    one = F.lit(1).cast("decimal(12,2)")
    return _dec("l_extendedprice") * (one - _dec("l_discount"))


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"
)


# --------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS semi-join feeding an aggregate)
# --------------------------------------------------------------------------

def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 pattern: orders in a quarter-year window that have at least
    one "late" lineitem, counted by priority. Adapted: the reference predicate
    ``l_commitdate < l_receiptdate`` becomes "shipped more than 30 days after
    the order date" (those columns don't exist in the testdata).

    The semi join never widens rows, so the aggregate input stays one row per
    qualifying order — at scale this is a shuffle on the order key plus a tiny
    5-group aggregate.
    """
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


SQL_TPCH_Q4 = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations (disjunctive nation-pair join)
# --------------------------------------------------------------------------

def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: revenue flow between two nations in either direction,
    grouped by (supplier nation, customer nation, ship year). The two nation
    dims broadcast; the disjunctive pair filter is applied after the cheap
    dim joins so the fact tables join only on their keys.
    """
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk")
    )
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") <= F.lit("1997-12-31"))
    )
    orders = _t(spark, sf_dir, "orders")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


SQL_TPCH_Q7 = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM({_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER)
"""


# --------------------------------------------------------------------------
# Q8 — national market share (conditional-sum ratio per group)
# --------------------------------------------------------------------------

def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_5's share of PROMO-part revenue sold to ASIA
    customers, per order year. Both sums stay exact decimal; the single
    ratio division happens once per output row in double.
    """
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation_c = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("c_nk"))
    nation_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cust = _t(spark, sf_dir, "customer").join(F.broadcast(nation_c), F.col("c_nationkey") == F.col("c_nk"))
    supp = _t(spark, sf_dir, "supplier").join(F.broadcast(nation_s), F.col("s_nationkey") == F.col("s_nk"))
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") <= F.lit("1997-12-31"))
    )
    li = _t(spark, sf_dir, "lineitem")
    vol = _revenue()
    nation_vol = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    agg = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(nation_vol).alias("_nat"),
            F.sum(vol).alias("_tot"),
        )
    )
    return agg.select(
        "o_year",
        (F.col("_nat").cast("double") / F.col("_tot").cast("double")).alias("mkt_share"),
    )


SQL_TPCH_Q8 = f"""
WITH flat AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
         {_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')} AS volume,
         n1.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  JOIN region r ON n2.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM flat GROUP BY o_year
"""


# --------------------------------------------------------------------------
# Q12 — shipping buckets (derived-bucket conditional counts)
# --------------------------------------------------------------------------

def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 pattern: per shipping bucket, count critical- vs
    normal-priority orders. Adapted: ``l_shipmode`` doesn't exist, so the
    group key is a derived ship-delay bucket (days from order to ship).
    """
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "0-30").when(delay <= 60, "31-60").otherwise(">60").alias("delay_bucket")
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(bucket)
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


SQL_TPCH_Q12 = """
SELECT CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) <= 30 THEN '0-30'
            WHEN datediff('day', o.o_orderdate, l.l_shipdate) <= 60 THEN '31-60'
            ELSE '>60' END AS delay_bucket,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
         AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join + double aggregation)
# --------------------------------------------------------------------------

def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of orders-per-customer including zero-order
    customers (LEFT OUTER preserves them; COUNT of the null-extended column
    yields 0). First agg shuffles on the customer key; the second input is
    at most ~50 distinct counts — negligible at any scale.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


SQL_TPCH_Q13 = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) GROUP BY c_count
"""


# --------------------------------------------------------------------------
# Q15 — top supplier (scalar MAX selection with exact-decimal equality)
# --------------------------------------------------------------------------

def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) whose quarter revenue equals the maximum.
    The revenue-per-supplier aggregate is computed once; its 1-row MAX is
    cross-joined back (broadcast of a single row — never a driver collect),
    and equality is tested in exact decimal so ties are engine-independent.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("_max_rev"))
        .join(supp, F.col("supplier_no") == supp["s_suppkey"])
        .select(
            "supplier_no",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


SQL_TPCH_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, SUM({_REV_SQL}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT r.supplier_no, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM revenue r JOIN supplier s ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


# --------------------------------------------------------------------------
# Q16 — parts/supplier relationship (distinct count + exclusion anti-join)
# --------------------------------------------------------------------------

def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 pattern: how many distinct suppliers can supply each
    (brand, type, size) combo, excluding flagged suppliers. Adapted: the
    part↔supplier association comes from observed ``lineitem`` pairs (no
    ``partsupp`` table), and the "customer complaints" exclusion becomes
    suppliers with negative account balance.

    The exclusion list is tiny → broadcast anti-join; the distinct count
    shuffles once on the (brand, type, size) grouping key.
    """
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    assoc = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        assoc.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_TPCH_Q16 = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type NOT LIKE 'PROMO%'
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated scalar-average subquery)
# --------------------------------------------------------------------------

def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost if sub-20%-of-average-quantity orders were
    dropped, for one brand. The correlated ``avg(l_quantity)`` per part is a
    pre-aggregate joined back (the filtered part list is small → broadcast).

    Determinism: the 20%-of-average comparison is multiplied through
    (``qty * (5*n) < sum_qty``) so both engines compare exact decimals —
    no decimal-division scale differences. ``5*n`` stays in bigint and is
    cast once to decimal(20,0): the product is decimal(33,2), inside the
    38-digit cap for any count below 1.8e18 (chained ``dec * 5 * bigint``
    would promote to precision 44 and, with ANSI off, silently null on
    overflow). The single final division by 7 happens in double.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem")
    branded = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    per_part = branded.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum(_dec("l_quantity")).alias("_sum_qty"),
        F.count(F.lit(1)).alias("_n"),
    )
    small = branded.join(F.broadcast(per_part), F.col("l_partkey") == F.col("_pk")).filter(
        _dec("l_quantity") * (F.lit(5) * F.col("_n")).cast("decimal(20,0)") < F.col("_sum_qty")
    )
    total = small.agg(F.sum(_dec("l_extendedprice")).alias("_tot"))
    return total.select((F.col("_tot").cast("double") / F.lit(7.0)).alias("avg_yearly"))


SQL_TPCH_Q17 = """
WITH branded AS (
  SELECT l.* FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = 'Brand#3'
), per_part AS (
  SELECT l_partkey AS pk,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM branded GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(b.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM branded b JOIN per_part a ON b.l_partkey = a.pk
WHERE CAST(b.l_quantity AS DECIMAL(12,2)) * CAST(5 * a.n AS DECIMAL(20,0)) < a.sum_qty
"""


# --------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive multi-predicate join)
# --------------------------------------------------------------------------

def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: one join, three OR'd (brand, size-range, quantity-range)
    predicate groups. Catalyst extracts the common ``l_partkey = p_partkey``
    conjunct as the join key and leaves the disjunction as a post-join
    filter; the part side broadcasts.
    """
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return joined.filter(cond).agg(F.sum(_revenue()).cast("double").alias("revenue"))


SQL_TPCH_Q19 = f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
"""


# --------------------------------------------------------------------------
# Q22 — global-acquisition opportunity (scalar threshold + anti-join)
# --------------------------------------------------------------------------

def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: customers with above-average positive balance and no
    recent orders, grouped by nation. Adapted twice for the testdata:
    ``c_nationkey`` replaces the phone country code (no phone column), and
    "no orders" becomes "no orders since 1999" (every synthetic customer has
    at least one lifetime order, which would make the anti-join degenerate).

    The global average is a 1-row broadcast; the threshold comparison is
    multiplied through (``bal * n > sum``) to stay in exact decimal —
    decimal(12,2) * decimal(20,0) is decimal(33,2), inside the 38-digit cap
    for any customer count (bigint), so no overflow-null is possible here.
    """
    cust = _t(spark, sf_dir, "customer")
    thr = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).alias("_sum_bal"),
        F.count(F.lit(1)).alias("_n_bal"),
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(thr))
        .filter(_dec("c_acctbal") * F.col("_n_bal") > F.col("_sum_bal"))
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


SQL_TPCH_Q22 = """
WITH thr AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS sum_bal,
         CAST(COUNT(*) AS BIGINT) AS n_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey AS cntrycode,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer c, thr
WHERE CAST(c.c_acctbal AS DECIMAL(12,2)) * thr.n_bal > thr.sum_bal
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c.c_nationkey
"""


# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier per part (correlated-min via window rank)
# --------------------------------------------------------------------------

def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 pattern: per qualifying part, the single best supplier in a
    region. Adapted: the part↔supplier association is observed ``lineitem``
    pairs (no ``partsupp``), and "minimum supply cost" becomes minimum
    ``s_acctbal`` (tie-break ``s_suppkey`` for a total order).

    The correlated ``MIN`` subquery of the reference formulation is a
    ``row_number`` window over the part key — one shuffle on ``p_partkey``
    instead of a rescan-per-part; the dim joins all broadcast.
    """
    assoc = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    from pyspark.sql import Window

    win = Window.partitionBy("p_partkey").orderBy(F.col("s_acctbal").asc(), F.col("s_suppkey").asc())
    return (
        assoc.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_name",
        )
    )


SQL_TPCH_Q2 = """
WITH assoc AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, nation, p_partkey, p_name
FROM (
  SELECT s.s_acctbal, s.s_name, n.n_name AS nation, p.p_partkey, p.p_name,
         row_number() OVER (PARTITION BY p.p_partkey
                            ORDER BY s.s_acctbal, s.s_suppkey) AS rn
  FROM assoc a
  JOIN part p ON a.l_partkey = p.p_partkey
  JOIN supplier s ON a.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE p.p_size <= 10 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Q9 — product-type profit (LIKE-filtered 5-way join, profit arithmetic)
# --------------------------------------------------------------------------

def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on a product line by supplier nation and year.
    Adapted: ``ps_supplycost`` (no ``partsupp``) becomes ``p_retailprice``,
    so profit = discounted revenue − quantity × retail price — the join
    shape, LIKE filter, and group-by are the reference pattern.

    Determinism: both profit terms are decimal products (no double sums,
    no decimal *rounding* — the product's widened scale is exact in both
    engines); the part dim broadcasts after the LIKE filter.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    profit = _revenue() - _dec("l_quantity") * _dec("p_retailprice")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


SQL_TPCH_Q9 = """
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))
                - CAST(l.l_quantity AS DECIMAL(12,2))
                  * CAST(p.p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER)
"""


# --------------------------------------------------------------------------
# Q11 — important part value concentration (HAVING > scalar fraction)
# --------------------------------------------------------------------------

def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 pattern: parts representing a significant fraction of one
    nation's shipped value. Adapted: value is shipped ``l_extendedprice``
    from NATION_3 suppliers (no ``partsupp`` stock value).

    The grand total is a 1-row broadcast; the HAVING fraction is multiplied
    through (``val * 300 > total``) so both engines compare exact decimals.
    """
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    val = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("_val"))
        # persisted subtree dedup: the per-part aggregate feeds BOTH the
        # 1-row grand total and the HAVING filter, and Catalyst does not
        # dedupe the self-referencing subtree — without this the lineitem
        # scan + broadcast join + aggregate would execute twice.
        # tracked_persist, NOT localCheckpoint(eager=False): under AQE even
        # a "lazy" checkpoint materializes upstream stages at plan-BUILD
        # time, before the query's own action.
        .transform(tracked_persist)
    )
    total = val.agg(F.sum("_val").alias("_total"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("_val") * 300 > F.col("_total"))
        .select("l_partkey", F.col("_val").cast("double").alias("part_value"))
    )


SQL_TPCH_Q11 = """
WITH v AS (
  SELECT l.l_partkey, SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS val
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY l.l_partkey
)
SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
FROM v, (SELECT SUM(val) AS t FROM v) tot
WHERE v.val * 300 > tot.t
"""


# --------------------------------------------------------------------------
# Q20 — dominant suppliers (two-granularity aggregate comparison)
# --------------------------------------------------------------------------

def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 pattern: suppliers holding an outsized share of a part
    family's volume. Adapted: "availqty > half of shipped qty" (no
    ``partsupp``) becomes "shipped more than half of a SMALL-type part's
    total 1996 volume".

    Two aggregates at different granularity — per (part, supplier) and per
    part. The per-part total is a window SUM over the per-(part, supplier)
    aggregate (decimal addition is associative, so the total is
    bit-identical to a separate GROUP BY), which keeps the fact table to a
    SINGLE scan and a single lineage — the naive formulation reads and
    broadcast-joins lineitem twice, and the earlier persist()-based variant
    leaked a cached table into long-lived sessions. The share comparison is
    multiplied through in exact decimal.
    """
    from pyspark.sql import Window

    small = _t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL").select("p_partkey")
    li96 = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"))
    )
    # the per-part total is a window aggregate over the per-(part, supplier)
    # rollup: one fact scan, one lineage — no persist() needed (Catalyst
    # does not structurally dedupe a self-join on the aggregate, so the
    # two-branch formulation would either rescan lineitem or leak a cached
    # table into long-lived sessions)
    per_ps = li96.groupBy("l_partkey", "l_suppkey").agg(F.sum(_dec("l_quantity")).alias("_q"))
    per_part_win = Window.partitionBy("l_partkey")
    supp = _t(spark, sf_dir, "supplier")
    return (
        per_ps.withColumn("_qtot", F.sum("_q").over(per_part_win))
        .filter(F.col("_q") * 2 > F.col("_qtot"))
        .select("l_suppkey")
        .distinct()
        .join(supp, F.col("l_suppkey") == supp["s_suppkey"])
        .select(F.col("s_suppkey"), F.col("s_name"))
    )


SQL_TPCH_Q20 = """
WITH small_parts AS (SELECT p_partkey FROM part WHERE p_type = 'SMALL'),
li96 AS (
  SELECT l_partkey, l_suppkey, l_quantity
  FROM lineitem JOIN small_parts ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
),
per_ps AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS q
  FROM li96 GROUP BY l_partkey, l_suppkey
),
per_p AS (
  SELECT l_partkey AS pk, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qtot
  FROM li96 GROUP BY l_partkey
)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM per_ps a JOIN per_p b ON a.l_partkey = b.pk
JOIN supplier s ON a.l_suppkey = s.s_suppkey
WHERE a.q * 2 > b.qtot
"""


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (multi-EXISTS via grouped twins)
# --------------------------------------------------------------------------

def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 pattern: suppliers who were the *sole* latest shipper on a
    multi-supplier finished order. Adapted: with no commit/receipt dates,
    "failed to meet the committed date" becomes "attained the order's max
    ship date"; the EXISTS (another supplier on the order) and NOT EXISTS
    (no other supplier also late) pair survives as grouped counts.

    The per-order rollups (order max, supplier count, count-at-max) are
    same-spec window functions over the per-(order, supplier) aggregate —
    the fact table is scanned ONCE and the ``l_orderkey`` partitioning is
    computed once (the naive self-join formulation rescans the aggregate
    subtree three times; the oracle SQL keeps that shape for readability,
    DuckDB materializes the CTE).
    """
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    ps = (
        li.join(orders.select("o_orderkey"), li["l_orderkey"] == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("_s_max"))
    )
    win = Window.partitionBy("l_orderkey")
    annotated = ps.select(
        "l_orderkey",
        "l_suppkey",
        "_s_max",
        F.max("_s_max").over(win).alias("_o_max"),
        F.count(F.lit(1)).over(win).alias("_n_supp"),
    ).select(
        "*",
        F.sum(F.when(F.col("_s_max") == F.col("_o_max"), 1).otherwise(0))
        .over(win)
        .alias("_n_at_max"),
    )
    supp = _t(spark, sf_dir, "supplier")
    # group by s_name AFTER the supplier join, exactly as the oracle SQL
    # does: grouping by l_suppkey and then selecting s_name would diverge
    # from the SQL if two suppliers ever shared a name (two rows vs one
    # merged row) and make the numwait/s_name tie-break ambiguous
    return (
        annotated.filter(
            (F.col("_s_max") == F.col("_o_max"))
            & (F.col("_n_supp") >= 2)
            & (F.col("_n_at_max") == 1)
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


SQL_TPCH_Q21 = """
WITH ps AS (
  SELECT l.l_orderkey, l.l_suppkey, MAX(l.l_shipdate) AS s_max
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey, l.l_suppkey
),
po AS (
  SELECT l_orderkey AS ok, MAX(s_max) AS o_max, CAST(COUNT(*) AS BIGINT) AS n_supp
  FROM ps GROUP BY l_orderkey
),
ps_o AS (
  SELECT ps.* FROM ps JOIN po ON ps.l_orderkey = po.ok WHERE ps.s_max = po.o_max
),
pm AS (
  SELECT l_orderkey AS ok2, CAST(COUNT(*) AS BIGINT) AS n_at_max
  FROM ps_o GROUP BY l_orderkey
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM ps_o
JOIN po ON ps_o.l_orderkey = po.ok
JOIN pm ON ps_o.l_orderkey = pm.ok2
JOIN supplier s ON ps_o.l_suppkey = s.s_suppkey
WHERE po.n_supp >= 2 AND pm.n_at_max = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 10
"""


TPCH2_QUERIES = {
    "tpch_q2": q_tpch_q2,
    "tpch_q9": q_tpch_q9,
    "tpch_q11": q_tpch_q11,
    "tpch_q20": q_tpch_q20,
    "tpch_q21": q_tpch_q21,
    "tpch_q4": q_tpch_q4,
    "tpch_q7": q_tpch_q7,
    "tpch_q8": q_tpch_q8,
    "tpch_q12": q_tpch_q12,
    "tpch_q13": q_tpch_q13,
    "tpch_q15": q_tpch_q15,
    "tpch_q16": q_tpch_q16,
    "tpch_q17": q_tpch_q17,
    "tpch_q19": q_tpch_q19,
    "tpch_q22": q_tpch_q22,
}

TPCH2_ORACLE_SQL = {
    "tpch_q2": SQL_TPCH_Q2,
    "tpch_q9": SQL_TPCH_Q9,
    "tpch_q11": SQL_TPCH_Q11,
    "tpch_q20": SQL_TPCH_Q20,
    "tpch_q21": SQL_TPCH_Q21,
    "tpch_q4": SQL_TPCH_Q4,
    "tpch_q7": SQL_TPCH_Q7,
    "tpch_q8": SQL_TPCH_Q8,
    "tpch_q12": SQL_TPCH_Q12,
    "tpch_q13": SQL_TPCH_Q13,
    "tpch_q15": SQL_TPCH_Q15,
    "tpch_q16": SQL_TPCH_Q16,
    "tpch_q17": SQL_TPCH_Q17,
    "tpch_q19": SQL_TPCH_Q19,
    "tpch_q22": SQL_TPCH_Q22,
}
