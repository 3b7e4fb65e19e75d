"""Declarative data-quality expectations (beyond-reference).

The contract layer every production pipeline runs before trusting a table:
a rule set is declared once and evaluated in ONE pass — each row-local rule
compiles to a conditional count inside a single aggregate, so checking 50
rules on a 100 TB table costs one scan, not 50. Uniqueness rules are the
exception (they are group-by questions, not row questions) and run as one
additional aggregate per declared key.

This generalizes the reference's hand-rolled validation
(``ApplaudoETL.scala:199-205``: drop malformed rows, ``number_of_products``
invariant) into a reusable report: instead of silently filtering, emit
(rule, n_violations, n_rows, pass) so a gate can fail loudly and the
violation counts land in monitoring.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Rule:
    """One named expectation: ``condition`` must hold for every row."""

    name: str
    condition: Column


def not_null(col: str) -> Rule:
    return Rule(f"{col}_not_null", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Rule:
    return Rule(f"{col}_in_range", F.col(col).between(lo, hi))


def matches(col: str, pattern: str) -> Rule:
    return Rule(f"{col}_matches", F.col(col).rlike(pattern))


def non_negative(col: str) -> Rule:
    return Rule(f"{col}_non_negative", F.col(col) >= 0)


def check_rules(
    df: DataFrame, rules: list[Rule], unique_keys: list[str] | None = None
) -> DataFrame:
    """(rule, n_rows, n_violations, pass) — row-local rules in ONE scan/
    aggregate; each ``unique_keys`` entry adds one groupBy aggregate
    counting rows beyond the first per key value.

    NULL semantics: a NULL condition counts as a violation (an unknown is
    not a pass) — except for explicit ``not_null`` rules where NULL is the
    thing being counted anyway. An EMPTY table passes vacuously (counts
    coalesce to 0 — a NULL ``pass`` would spuriously fail an empty
    partition-day gate and silently vanish from a ``pass = false`` alert
    filter). Duplicate rule names are rejected up front; arbitrary rule/
    column names (spaces, quotes) are supported.
    """
    names = [r.name for r in rules]
    dupes = sorted({n for n in names if names.count(n) > 1})
    if dupes:
        raise ValueError(f"duplicate rule names: {dupes} — name rules uniquely")
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for r in rules:
        aggs.append(
            F.coalesce(F.sum(F.when(r.condition, 0).otherwise(1)), F.lit(0)).alias(
                f"_viol_{r.name}"
            )
        )
    wide = df.agg(*aggs)
    per_rule = None
    if rules:
        # melt the 1-row wide aggregate with stack — ONE consumption of the
        # aggregate subtree. A per-rule union of selects over `wide` would
        # re-execute the aggregate (and rescan the table) once per rule:
        # Catalyst does not dedupe self-referencing subplans
        def _lit(s: str) -> str:
            return "'" + s.replace("'", "''") + "'"

        def _ident(s: str) -> str:
            return "`" + s.replace("`", "``") + "`"

        stack_args = ", ".join(f"{_lit(r.name)}, {_ident(f'_viol_{r.name}')}" for r in rules)
        per_rule = wide.selectExpr(
            f"stack({len(rules)}, {stack_args}) AS (rule, _viol)", "_n_rows"
        ).select(
            "rule",
            F.col("_n_rows").cast("long").alias("n_rows"),
            F.col("_viol").cast("long").alias("n_violations"),
        )
    for key in unique_keys or []:
        dup = df.groupBy(key).agg(F.count(F.lit(1)).alias("_c"))
        row = dup.agg(
            F.lit(f"{key}_unique").alias("rule"),
            F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_rows"),
            F.coalesce(F.sum("_c") - F.count(F.lit(1)), F.lit(0))
            .cast("long")
            .alias("n_violations"),
        )
        per_rule = row if per_rule is None else per_rule.unionByName(row)
    if per_rule is None:  # no rules, no keys: empty report, correct schema
        return df.sparkSession.createDataFrame(
            [], "rule string, n_rows long, n_violations long, pass boolean"
        )
    return per_rule.withColumn("pass", F.col("n_violations") == 0)
