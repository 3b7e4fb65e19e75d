"""Per-user category rule engine.

Reference: ``getClientsCategory`` (ApplaudoETL.scala:194-224) — four window
sums over ``Window.partitionBy("user_id")`` followed by a row-level UDF.
Rebuilt as pure native Column expressions: the UDF disappears (the whole
pipeline stays inside whole-stage codegen), and Catalyst collapses the four
same-spec window aggregates into a single Window physical node → one shuffle.

Semantics trap (SURVEY.md §2.8 Trap 1 — load-bearing): the reference UDF
computes ``mom / total`` on Scala Ints ⇒ **integer division**, so
``mom / total > 0.5`` is true iff ``mom == total`` (the ratio is 0 or 1).
The rules therefore mean "100 % of the user's items are in the category's
departments", priority Mom > Single > Pet Friendly > "A complete mystery" —
confirmed by the production distribution (122,451 of 131,209 users are
"A complete mystery", reference ipynb cell 27). We replicate with SQL ``DIV``.
Edge: ``total == 0`` throws in Scala but yields NULL under ``DIV``; NULL
comparisons are false, so such users fall through to "A complete mystery"
(pinned by tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MOM_ITEMS = ["dairy eggs", "bakery", "household", "babies"]
SINGLE_ITEMS = ["canned goods", "meat seafood", "alcohol", "snacks", "beverages"]
PET_FRIENDLY_ITEMS = ["canned goods", "pets", "frozen"]

CATEGORY_MYSTERY = "A complete mystery"
CATEGORY_MOM = "Mom"
CATEGORY_SINGLE = "Single"
CATEGORY_PET = "Pet Friendly"


def with_department_sums(df: DataFrame) -> DataFrame:
    """Whole-partition window sums per user (ApplaudoETL.scala:213-221):
    total + three conditional (filtered) sums over the same unbounded
    ``partitionBy(user_id)`` spec — one Window node, one shuffle."""
    w = Window.partitionBy("user_id")

    def cond_sum(departments: list[str]):
        return F.sum(
            F.when(F.col("department").isin(departments), F.col("number_of_products")).otherwise(0)
        ).over(w)

    return (
        df.withColumn("total_products_bought", F.sum("number_of_products").over(w))
        .withColumn("mom_products", cond_sum(MOM_ITEMS))
        .withColumn("single_products", cond_sum(SINGLE_ITEMS))
        .withColumn("pet_friendly_products", cond_sum(PET_FRIENDLY_ITEMS))
    )


def category_expr(
    total: str = "total_products_bought",
    mom: str = "mom_products",
    single: str = "single_products",
    pet: str = "pet_friendly_products",
) -> F.Column:
    """The category rules as one native expression, integer-division-faithful.

    Divide-by-zero yields NULL (vs a Scala throw — and vs an ANSI-mode Spark 4
    ``DIV`` throw); NULL > 0.5 is NULL ⇒ branch not taken ⇒ "A complete
    mystery". :func:`int_div` is truncation-toward-zero like Scala ``Int /``,
    and never raises, so the pipeline is safe under ANSI mode on dirty data.
    """
    from scala_etl_test_spark.functions.cleaning import int_div

    int_ratio = lambda a, b: int_div(F.col(a), F.col(b))  # noqa: E731
    return (
        F.when(int_ratio(mom, total) > 0.5, F.lit(CATEGORY_MOM))
        .when(int_ratio(single, total) > 0.6, F.lit(CATEGORY_SINGLE))
        .when(int_ratio(pet, total) > 0.3, F.lit(CATEGORY_PET))
        .otherwise(F.lit(CATEGORY_MYSTERY))
    )


def clients_category(df_products: DataFrame) -> DataFrame:
    """``getClientsCategory`` equivalent → ``user_id, category``.

    The reference collapses per-row labels with ``dropDuplicates("user_id")``
    (ApplaudoETL.scala:224); that is safe here because every input to the
    rule is a user-level window aggregate, so all rows of a user agree.
    """
    return (
        with_department_sums(df_products)
        .withColumn("category", category_expr())
        .select("user_id", "category")
        .dropDuplicates(["user_id"])
    )
