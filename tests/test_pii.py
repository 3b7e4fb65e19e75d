"""PII detection/redaction: known identifiers are counted per class,
redaction replaces them with class placeholders and leaves no residue."""

from __future__ import annotations

from scala_etl_test_spark.operators.pii import detect_pii


def test_counts_redaction_and_flag(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.io and c.d+x@e-f.org, call 555-123-4567, host 10.0.0.1"),
            (2, "nothing sensitive here"),
            (3, "ip 192.168.001.255 only"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in detect_pii(df, "text", "doc_id").collect()}
    assert (rows[1]["n_email"], rows[1]["n_phone"], rows[1]["n_ipv4"]) == (2, 1, 1)
    assert rows[1]["has_pii"] and rows[3]["has_pii"] and not rows[2]["has_pii"]
    assert rows[2]["redacted"] == "nothing sensitive here"
    red = rows[1]["redacted"]
    assert red == "mail <EMAIL> and <EMAIL>, call <PHONE>, host <IPV4>"
    # audit property the registered query aggregates: redacted text re-scans clean
    clean = detect_pii(
        detect_pii(df, "text", "doc_id").select("doc_id", "redacted"), "redacted", "doc_id"
    ).collect()
    assert all(not r["has_pii"] for r in clean)


def test_null_text_propagates_null_profile(spark):
    """NULL text → NULL counts/flag/redaction (Spark's NULL-propagating
    regexp/size semantics, matching the oracle SQL's len(NULL) = NULL).
    Curation pipelines filter NULL text upstream; this pins that the
    operator neither crashes nor invents zeros."""
    df = spark.createDataFrame([(1, None), (2, "a@b.io")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in detect_pii(df, "text", "doc_id").collect()}
    assert rows[1]["n_email"] is None
    assert rows[1]["redacted"] is None
    assert rows[1]["has_pii"] is None
    assert rows[2]["n_email"] == 1 and rows[2]["has_pii"]
