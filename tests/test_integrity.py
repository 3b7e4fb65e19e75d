"""Order-independent table checksums (operators/integrity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_etl_test_spark.operators.integrity import table_checksum


def _cs(df, cols):
    return tuple(table_checksum(df, cols).collect()[0])


def test_invariant_under_partitioning_and_order(spark):
    df = spark.createDataFrame(
        [(i, f"name{i}", float(i) * 1.5) for i in range(500)], "id long, name string, v double"
    )
    cols = ["id", "name", "v"]
    a = _cs(df, cols)
    b = _cs(df.repartition(13, "name").sortWithinPartitions("v"), cols)
    c = _cs(df.orderBy(F.col("id").desc()), cols)
    assert a == b == c and a[0] == 500


def test_detects_single_value_change(spark):
    base = [(1, "a"), (2, "b"), (3, "c")]
    df1 = spark.createDataFrame(base, "id long, s string")
    df2 = spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], "id long, s string")
    assert _cs(df1, ["id", "s"]) != _cs(df2, ["id", "s"])


def test_sum31_catches_even_duplicate_cancellation(spark):
    """XOR alone is blind to a row duplicated twice; the sum component
    moves — the (xor, sum) pair must differ."""
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    df2 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b"), (2, "b")], "id long, s string"
    )
    n1, x1, s1 = _cs(df1, ["id", "s"])
    n2, x2, s2 = _cs(df2, ["id", "s"])
    assert x1 == x2  # the documented XOR blind spot...
    assert (n1, s1) != (n2, s2)  # ...covered by count and sum


def test_null_distinct_from_empty_string(spark):
    df1 = spark.createDataFrame([(1, None)], "id long, s string")
    df2 = spark.createDataFrame([(1, "")], "id long, s string")
    assert _cs(df1, ["id", "s"]) != _cs(df2, ["id", "s"])


def test_empty_table_checksums_to_zero(spark):
    df = spark.createDataFrame([], "id long, s string")
    assert _cs(df, ["id", "s"]) == (0, 0, 0)


def test_delimiter_injection_does_not_alias(spark):
    """('a|b','c') and ('a','b|c') must checksum differently — per-column
    fixed-width digests close the joined-encoding injection."""
    df1 = spark.createDataFrame([("a|b", "c")], "x string, y string")
    df2 = spark.createDataFrame([("a", "b|c")], "x string, y string")
    assert _cs(df1, ["x", "y"]) != _cs(df2, ["x", "y"])


class TestSnapshotDiff:
    """snapshot_diff / snapshot_diff_summary: per-id release diff via
    row-local digests + one thin full-outer join."""

    def _diff(self, spark, old_rows, new_rows):
        from scala_etl_test_spark.operators.integrity import snapshot_diff

        old = spark.createDataFrame(old_rows, "doc_id long, text string, source string")
        new = spark.createDataFrame(new_rows, "doc_id long, text string, source string")
        return snapshot_diff(old, new, "doc_id", ["text", "source"])

    def test_four_way_classification(self, spark):
        got = {
            r["doc_id"]: r["status"]
            for r in self._diff(
                spark,
                [(1, "a", "web"), (2, "b", "web"), (3, "c", "book")],
                [(1, "a", "web"), (2, "B", "web"), (4, "d", "web")],
            ).collect()
        }
        assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}

    def test_any_content_col_counts_as_change(self, spark):
        got = {
            r["doc_id"]: r["status"]
            for r in self._diff(
                spark, [(1, "a", "web")], [(1, "a", "book")]
            ).collect()
        }
        assert got == {1: "changed"}  # source moved, text identical

    def test_null_vs_value_is_a_change(self, spark):
        got = {
            r["doc_id"]: r["status"]
            for r in self._diff(
                spark, [(1, None, "web"), (2, "<NULL>", "web")],
                [(1, "x", "web"), (2, None, "web")],
            ).collect()
        }
        assert got[1] == "changed"
        # the documented sentinel collision: a literal '<NULL>' string and a
        # NULL hash identically (integrity.py module docstring caveat)
        assert got[2] == "unchanged"

    def test_summary_counts(self, spark):
        from scala_etl_test_spark.operators.integrity import snapshot_diff_summary

        d = self._diff(
            spark,
            [(i, f"t{i}", "web") for i in range(10)],
            [(i, f"t{i}" if i % 2 else "edited", "web") for i in range(2, 12)],
        )
        got = {r["status"]: r["n_docs"] for r in snapshot_diff_summary(d).collect()}
        assert got == {"removed": 2, "added": 2, "changed": 4, "unchanged": 4}

    def test_join_carries_digests_not_payloads(self, spark):
        """The full-outer join must ship (id, 60-bit digest), never text —
        at 100 TB the diff's shuffle is thin regardless of document size."""
        d = self._diff(spark, [(1, "x" * 100, "web")], [(1, "x" * 100, "web")])
        plan = d._jdf.queryExecution().executedPlan().toString()
        import re

        for m in re.finditer(r"Exchange hashpartitioning\([^)]*\)", plan):
            assert "text" not in m.group(0)

    def test_randomized_vs_python_reference(self, spark):
        """Seeded-random cross-check against an independent Python
        reference: ids present on either side, every classification, and
        the summary counts."""
        import random

        from scala_etl_test_spark.operators.integrity import snapshot_diff_summary

        rng = random.Random(4177)
        for _ in range(3):
            ids = list(range(40))
            old_rows = [
                (i, f"t{rng.randint(0, 5)}", rng.choice(["web", "book"]))
                for i in ids
                if rng.random() < 0.8
            ]
            new_rows = [
                (i, f"t{rng.randint(0, 5)}", rng.choice(["web", "book"]))
                for i in ids
                if rng.random() < 0.8
            ]
            om, nm = {r[0]: r[1:] for r in old_rows}, {r[0]: r[1:] for r in new_rows}
            want = {}
            for i in set(om) | set(nm):
                if i not in om:
                    want[i] = "added"
                elif i not in nm:
                    want[i] = "removed"
                else:
                    want[i] = "unchanged" if om[i] == nm[i] else "changed"
            diff = self._diff(spark, old_rows, new_rows)
            got = {r["doc_id"]: r["status"] for r in diff.collect()}
            assert got == want
            summary = {
                r["status"]: r["n_docs"] for r in snapshot_diff_summary(diff).collect()
            }
            from collections import Counter

            assert summary == dict(Counter(want.values()))


def test_release_diff_oracle_null_parity(spark, tmp_path):
    """ADVICE r10: the release_diff DuckDB oracle classified with
    null-unsafe equality (NULL text ⇒ 'changed') while the Spark path
    digests NULLs via NULL_SENTINEL (NULL vs NULL ⇒ 'unchanged') — latent
    because the driver's testdata has no NULLs. Pin the agreement on a
    documents table that DOES carry NULL text and NULL source."""
    import duckdb

    from scala_etl_test_spark.plans.queries_data import SQL_RELEASE_DIFF, q_release_diff

    rows = [
        (i, None if i % 4 == 0 else f"text {i} aa", None if i % 5 == 0 else "web")
        for i in range(80)
    ]
    data = tmp_path / "nulls"
    spark.createDataFrame(rows, "doc_id long, text string, source string").coalesce(
        1
    ).write.parquet(str(data / "documents.parquet"))

    got = {r["status"]: r["n_docs"] for r in q_release_diff(spark, str(data)).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{data}/documents.parquet/*.parquet')"
    )
    want = dict(con.execute(SQL_RELEASE_DIFF).fetchall())
    assert got == want
    # the NULL rows really exercise the null-safe branch: docs with NULL
    # text outside the added/removed/edited buckets must be 'unchanged'
    assert got.get("unchanged", 0) > 0
