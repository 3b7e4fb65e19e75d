"""Registry-wide static scale-killer gate.

Two plan nodes are absolute anti-patterns at 100 TB and must never appear
in ANY registered query's physical plan, with no allowlist:

- ``CartesianProduct`` — an unguarded all-pairs join. Every intentional
  scalar join in this engine (totals, n_nodes, query vectors, thresholds)
  crosses a **1-row broadcast** and therefore plans as
  ``BroadcastNestedLoopJoin`` (constant per-row work), never as a
  CartesianProduct; the brute-force dedup twin auto-switches to its banded
  plan above a row threshold (operators/dedup.py) precisely so this node
  can stay forbidden.
- ``BatchEvalPython`` — a row-at-a-time Python UDF. The only permitted
  Python data paths are Arrow-batched (``ArrowEvalPython`` /
  ``MapInPandas`` / ``FlatMapGroupsInPandas``), which move columnar
  batches, not pickled rows.

``BroadcastNestedLoopJoin`` IS gated, structurally: a BNLJ is legal only
when its build side is provably bounded — a global aggregate (exactly one
row), a limit ≤ 1, a ≤1-row local relation, a small ``Range``/literal
grid, or (by named allowlist, because the bound is a cardinality
assumption the plan cannot prove) a GROUPED aggregate whose key is a
documented low-cardinality dimension (sources, gate checks, sketch
columns). A BNLJ whose build bottoms out in a raw scan or a join is the
unguarded-cross failure mode and has no allowlist.

This pins in CI what VERDICT r7's manual anti-pattern scan verified by
hand ("zero row UDFs, zero unguarded cartesians"), upgraded from
"documented as 1-row" to "verified from the plan tree".
"""

from __future__ import annotations

import pytest

from scala_etl_test_spark.plans.queries import QUERIES

FORBIDDEN_NODES = ("CartesianProduct", "BatchEvalPython")

# BNLJ builds that are GROUPED aggregates or driver-literal tables: bounded
# by a documented low-cardinality dimension, not provable from the plan.
# Each entry carries a RUNTIME CAP (VERDICT r8 item 5): the build side's
# actual row count, read from the executed plan's BroadcastExchange
# metrics at the fixture SF, must stay under it — a silently grown
# dimension (a 10k-threshold sweep grid, an exploding source taxonomy)
# fails CI instead of shipping an unbounded broadcast. Caps are several
# times the observed cardinality, small enough that anything failing them
# is no longer "low-cardinality by design".
BNLJ_BOUNDED_BY_DESIGN: dict[str, tuple[str, int]] = {
    "source_overlap_matrix": ("per-source sketch table (|sources| rows)", 64),
    "corpus_release_report": ("per-check gate rows + per-source sketches", 64),
    "quality_filter_sweep": ("per-threshold sweep grid", 64),
    "quantile_sketch_merge": ("per-column merged-sketch rows", 64),
    "approx_overlap_sketch": ("nested cross of two 1-row sketch scalars", 4),
    "pareto_revenue": ("literal cutoff-threshold table (createDataFrame)", 16),
}


def _children(node):
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        return [node.initialPlan()]
    if name == "InMemoryTableScan":  # recurse into the cached plan
        try:
            return [node.relation().cachedPlan()]
        except Exception:
            return []
    if name == "ReusedExchange":
        try:
            return [node.child()]
        except Exception:
            return []
    return [node.children().apply(i) for i in range(node.children().length())]


def _walk(node, out=None):
    if out is None:
        out = []
    out.append(node)
    for c in _children(node):
        _walk(c, out)
    return out


def _classify_build(node):
    """Classify a BNLJ build subtree by walking its single-child spine:
    'scalar' (provably ≤1 row), 'bounded' (small plan-time-known literal),
    'by_design' (grouped agg / literal table — needs the allowlist), or
    'fail' (raw scan / join / anything unbounded)."""
    while True:
        name = node.nodeName()
        if "Aggregate" in name:
            try:
                grouped = node.groupingExpressions().length() > 0
            except Exception:
                grouped = True
            return ("by_design", f"{name} grouped") if grouped else ("scalar", name)
        if name in ("GlobalLimit", "LocalLimit"):
            try:
                if node.limit() <= 1:
                    return "scalar", "limit<=1"
            except Exception:
                pass
        if name == "LocalTableScan":
            try:
                sz = node.rows().size()
            except Exception:
                sz = 2
            return ("scalar", "1-row local") if sz <= 1 else ("bounded", f"local {sz} rows")
        if name == "Range":
            try:
                ne = int(str(node.numElements()))
            except Exception:
                return "fail", "range of unknown size"
            return ("bounded", f"range {ne}") if ne <= 4096 else ("fail", f"range {ne}")
        if name == "Scan ExistingRDD":
            return "by_design", "driver-literal table"
        if "BroadcastNestedLoop" in name:
            sub = [_classify_build(node.left())[0], _classify_build(node.right())[0]]
            if all(c != "fail" for c in sub):
                return "by_design", "nested scalar cross"
            return "fail", "nested BNLJ over unbounded side"
        kids = _children(node)
        if len(kids) != 1:
            return "fail", f"bottoms out at {name} ({len(kids)} children)"
        node = kids[0]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_has_no_scale_killers(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    qe = df._jdf.queryExecution()
    plan_str = qe.executedPlan().toString()
    for node in FORBIDDEN_NODES:
        assert node not in plan_str, (
            f"{name} plans a {node} — an unguarded all-pairs join or a "
            f"row-at-a-time Python UDF cannot ship at scale:\n{plan_str}"
        )
    for n in _walk(qe.executedPlan()):
        if "BroadcastNestedLoop" not in n.nodeName():
            continue
        side = n.buildSide().toString()
        build = n.left() if "Left" in side else n.right()
        cls, detail = _classify_build(build)
        if cls in ("scalar", "bounded"):
            continue
        if cls == "by_design":
            assert name in BNLJ_BOUNDED_BY_DESIGN, (
                f"{name} broadcasts a cardinality-bound build ({detail}) in a "
                "BNLJ without a BNLJ_BOUNDED_BY_DESIGN entry — add it with "
                "the dimension that bounds it, or make the build scalar"
            )
            continue
        pytest.fail(
            f"{name} plans a BroadcastNestedLoopJoin whose build side is "
            f"UNBOUNDED ({detail}) — this is an unguarded cross at scale:\n"
            + plan_str
        )


def test_bnlj_allowlist_names_are_registered():
    assert set(BNLJ_BOUNDED_BY_DESIGN) <= set(QUERIES), sorted(
        set(BNLJ_BOUNDED_BY_DESIGN) - set(QUERIES)
    )


def _final_children(node):
    """Like _children, but follows AQE to the FINAL executed plan and
    into query-stage wrappers — required to read runtime metrics."""
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        try:
            return [node.finalPhysicalPlan()]
        except Exception:
            return [node.initialPlan()]
    if "QueryStage" in name:
        try:
            return [node.plan()]
        except Exception:
            pass
    if name == "InMemoryTableScan":
        try:
            return [node.relation().cachedPlan()]
        except Exception:
            return []
    if name == "ReusedExchange":
        # an AQE-reused broadcast build would otherwise bottom out childless
        # and escape the cap read (r9 review finding #5)
        try:
            return [node.child()]
        except Exception:
            return []
    return [node.children().apply(i) for i in range(node.children().length())]


def _walk_final(node, out=None):
    if out is None:
        out = []
    out.append(node)
    for c in _final_children(node):
        _walk_final(c, out)
    return out


def _metric(node, key):
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        if kv._1() == key:
            return int(kv._2().value())
    return None


def bnlj_build_rows(df) -> list[int]:
    """EXECUTE ``df`` and return the actual broadcast row count of every
    BroadcastNestedLoopJoin build side, read from the final adaptive
    plan's BroadcastExchange metrics."""
    df.write.mode("overwrite").format("noop").save()
    rows = []
    for n in _walk_final(df._jdf.queryExecution().executedPlan()):
        if "BroadcastNestedLoop" not in n.nodeName():
            continue
        side = n.buildSide().toString()
        build = n.left() if "Left" in side else n.right()
        for b in _walk_final(build):
            if "BroadcastExchange" in b.nodeName():
                got = _metric(b, "numOutputRows")
                if got is not None:
                    rows.append(got)
                break
    return rows


@pytest.mark.parametrize("name", sorted(BNLJ_BOUNDED_BY_DESIGN))
def test_bnlj_by_design_builds_respect_runtime_caps(spark, sf_dir, name):
    """VERDICT r8 item 5: the allowlist's 'low-cardinality by design'
    claims are now enforced at runtime — every BNLJ build in the query's
    executed plan must broadcast at most the declared cap's rows."""
    why, cap = BNLJ_BOUNDED_BY_DESIGN[name]
    spark.catalog.clearCache()
    rows = bnlj_build_rows(QUERIES[name](spark, sf_dir))
    spark.catalog.clearCache()
    assert rows, (
        f"{name} is allowlisted for a by-design BNLJ build but its executed "
        "plan has none — stale allowlist entry, remove it"
    )
    assert max(rows) <= cap, (
        f"{name}'s BNLJ build broadcast {max(rows)} rows, over its declared "
        f"cap {cap} ({why}) — the bounding dimension grew; this is no "
        "longer a bounded broadcast"
    )


def test_bnlj_runtime_cap_detects_a_grown_dimension(spark):
    """The red path: a deliberately over-grown grouped-aggregate build
    must be measured at its true size (what a cap violation looks like)."""
    from pyspark.sql import functions as F

    grid = spark.range(5000).groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    df = spark.range(10).crossJoin(F.broadcast(grid.select(F.col("id").alias("g"), "n")))
    rows = bnlj_build_rows(df)
    assert rows and max(rows) == 5000, rows
    cap = 64
    assert max(rows) > cap  # the gate above would fail exactly here
