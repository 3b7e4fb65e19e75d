"""PSI drift: zero for identical halves, flags a shifted distribution."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from scala_etl_test_spark.operators.drift import psi_drift


def _t(i):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=i)


def test_identical_halves_no_drift(spark):
    # same value pattern in both halves -> psi ~ 0
    rows = [("a", float(i % 10), _t(i)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, value double, ts timestamp")
    got = psi_drift(df, "g", "value", "ts").collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_early"] == 100 and r["n_late"] == 100
    assert abs(r["psi"]) < 0.01
    assert not r["drifted"]


def test_shifted_distribution_flags_drift(spark):
    # early half in [0,10), late half in [90,100) -> massive shift
    rows = [("a", float(i % 10), _t(i)) for i in range(100)] + [
        ("a", 90.0 + float(i % 10), _t(100 + i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, value double, ts timestamp")
    r = psi_drift(df, "g", "value", "ts").collect()[0]
    assert r["drifted"] and r["psi"] > 1.0


def test_partitioning_invariant(spark):
    rows = [
        ("a", float((i * 7) % 23), _t(i)) for i in range(300)
    ] + [("b", float((i * 3) % 17), _t(i)) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, value double, ts timestamp")
    a = {r["g"]: r["psi"] for r in psi_drift(df, "g", "value", "ts").collect()}
    b = {
        r["g"]: r["psi"]
        for r in psi_drift(df.repartition(13), "g", "value", "ts").collect()
    }
    assert a == b


def test_events_trend_recovers_planted_slope(spark, tmp_path):
    """y = 2·x_days + 3 exactly -> slope 2.0, r 1.0; y constant -> slope 0."""
    import datetime

    from scala_etl_test_spark.plans.queries import q_events_trend

    base = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    rows = []
    for i in range(200):
        ts = base + datetime.timedelta(hours=i)
        x_days = i / 24.0
        rows.append((i, ts, 1, "linear", 2.0 * x_days + 3.0, "{}"))
        rows.append((1000 + i, ts, 2, "flat", 7.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    got = {r["event_type"]: r for r in q_events_trend(spark, str(tmp_path)).collect()}
    assert got["linear"]["slope_per_day"] == 2.0
    assert got["linear"]["pearson_r"] == 1.0
    assert got["flat"]["slope_per_day"] == 0.0


def test_constant_metric_no_division_error(spark):
    rows = [("a", 5.0, _t(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, value double, ts timestamp")
    r = psi_drift(df, "g", "value", "ts").collect()[0]
    assert r["psi"] == 0.0 and not r["drifted"]


def test_null_value_and_ts_rows_excluded(spark):
    rows = [("a", float(i % 10), _t(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, value double, ts timestamp")
    with_nulls = df.unionByName(
        spark.createDataFrame(
            [("a", None, _t(1)), ("a", 3.0, None)],
            "g string, value double, ts timestamp",
        )
    )
    clean = psi_drift(df, "g", "value", "ts").collect()[0]
    noisy = psi_drift(with_nulls, "g", "value", "ts").collect()[0]
    assert tuple(clean) == tuple(noisy)


def test_unbalanced_halves_count_empty_bins(spark):
    """Bins empty in BOTH halves still contribute their smoothed term when
    the half sizes differ — all values land in one bin but psi > 0."""
    rows = [("a", 1.0, _t(i)) for i in range(10)] + [
        ("a", 1.0, _t(1000 + i)) for i in range(90)
    ]
    # constant metric -> bin 0 only; halves 10 vs 90
    df = spark.createDataFrame(rows, "g string, value double, ts timestamp")
    r = psi_drift(df, "g", "value", "ts").collect()[0]
    # p0=(10.5/15), q0=(90.5/95): occupied-bin term plus 9 empty-bin terms
    import math

    expect = sum(
        (p - q) * math.log(p / q)
        for p, q in [
            ((10 + 0.5) / 15.0, (90 + 0.5) / 95.0),
            *[((0.5) / 15.0, (0.5) / 95.0)] * 9,
        ]
    )
    assert abs(r["psi"] - round(expect, 6)) < 1e-9


class TestSourceKlDivergence:
    def _brute(self, docs, alpha=0.5):
        """Full-grid reference KL (no absent-mass fold): per group, sum the
        smoothed-p * log2(p/q) term over the ENTIRE corpus vocab."""
        import math, re
        from collections import Counter

        tok = {}
        corpus = Counter()
        for g, text in docs:
            ws = [w for w in re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split() if w]
            tok.setdefault(g, Counter()).update(ws)
            corpus.update(ws)
        n = sum(corpus.values())
        vocab = sorted(corpus)
        out = {}
        for g, cnt in tok.items():
            n_g = sum(cnt.values())
            kl = 0.0
            for w in vocab:
                p = (cnt.get(w, 0) + alpha) / (n_g + alpha * len(vocab))
                q = corpus[w] / n
                kl += p * math.log2(p / q)
            out[g] = (n_g, len(cnt), kl)
        return out

    def test_matches_full_grid_reference(self, spark):
        """The folded absent-mass algebra equals the naive (group × vocab)
        sum, including groups missing most of the vocab."""
        from scala_etl_test_spark.operators.drift import source_kl_divergence

        docs = [
            ("a", "the cat sat on the mat"),
            ("a", "the dog sat on the log"),
            ("b", "quantum flux capacitors need plutonium cores"),
            ("c", "the the the the"),
        ]
        df = spark.createDataFrame(docs, "src string, text string")
        got = {
            r["src"]: (r["n_tokens"], r["n_distinct_words"], r["kl_bits"])
            for r in source_kl_divergence(df, "text", "src").collect()
        }
        want = self._brute(docs)
        assert set(got) == set(want)
        for g in want:
            n_g, nd, kl = want[g]
            assert got[g][0] == n_g and got[g][1] == nd
            assert abs(got[g][2] - kl) < 1e-6, (g, got[g][2], kl)

    def test_identical_groups_near_zero(self, spark):
        """Groups with the corpus distribution diverge only by smoothing."""
        from scala_etl_test_spark.operators.drift import source_kl_divergence

        docs = [("a", "x y z"), ("b", "x y z")]
        df = spark.createDataFrame(docs, "src string, text string")
        rows = source_kl_divergence(df, "text", "src").collect()
        assert all(abs(r["kl_bits"]) < 0.01 for r in rows)

    def test_divergent_group_scores_higher(self, spark):
        from scala_etl_test_spark.operators.drift import source_kl_divergence

        base = [("a", "common words shared by every source " * 3)] * 3
        odd = [("b", "zygomorphic quixotic phlogiston xenoliths")]
        df = spark.createDataFrame(base + odd, "src string, text string")
        kl = {r["src"]: r["kl_bits"] for r in source_kl_divergence(df, "text", "src").collect()}
        assert kl["b"] > kl["a"]


class TestKsTwoSample:
    def _run(self, spark, early, late):
        from scala_etl_test_spark.operators.drift import ks_two_sample

        rows = [("x", float(v), True) for v in early] + [("x", float(v), False) for v in late]
        df = spark.createDataFrame(rows, ["g", "value", "early"])
        return ks_two_sample(df, "g", "value", "early").collect()[0]

    def test_hand_computed_d(self, spark):
        # F1 jumps at 1,2,3; F2 at 2,3,4 -> max gap 1/3 at x in {1,2,3}
        r = self._run(spark, [1, 2, 3], [2, 3, 4])
        assert r["ks_stat"] == round(1 / 3, 6)
        assert r["n_true"] == 3 and r["n_false"] == 3

    def test_ties_use_right_continuous_ecdf(self, spark):
        # pooled jump points {1,2}: |2/3-1/3| = 1/3, |1-1| = 0 -> D = 1/3;
        # a ROWS frame would split the ties and report a larger D
        r = self._run(spark, [1, 1, 2], [1, 2, 2])
        assert r["ks_stat"] == round(1 / 3, 6)

    def test_disjoint_samples_drift(self, spark):
        r = self._run(spark, [0, 0, 0, 0], [10, 10, 10, 10])
        assert r["ks_stat"] == 1.0
        assert r["drifted"] is True

    def test_identical_samples_do_not_drift(self, spark):
        r = self._run(spark, [1, 2, 3, 4], [1, 2, 3, 4])
        assert r["ks_stat"] == 0.0
        assert r["drifted"] is False

    def test_one_sided_group_is_maximal_drift_not_a_crash(self, spark):
        # a group with rows in only ONE sample (new-type-appeared case)
        # must report ks=1.0/drifted rather than dividing by zero
        from scala_etl_test_spark.operators.drift import ks_two_sample

        rows = [("only_early", 1.0, True), ("only_early", 2.0, True),
                ("normal", 1.0, True), ("normal", 2.0, False)]
        df = spark.createDataFrame(rows, ["g", "value", "early"])
        out = {r["g"]: r for r in ks_two_sample(df, "g", "value", "early").collect()}
        one = out["only_early"]
        assert one["ks_stat"] == 1.0
        assert one["drifted"] is True
        assert one["ks_crit_05"] is None
        assert out["normal"]["ks_crit_05"] is not None
