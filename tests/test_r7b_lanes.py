"""Round-7 batch-B lane tests: plan budgets plus the per-lane
semantic invariants the oracle compare can't express (exact-N
allocation, bipartite BFS parity, regex witness consistency)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from team_02_spark.plans.inspect import shuffle_count, uses_python_udf
from team_02_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _q(spark, name):
    return QUERIES[name].fn(spark, SF_SMOKE)


def test_r7b_lane_plans(spark):
    """Batch-B lanes stay JVM-side inside small fixed shuffle budgets.
    q_allocation's larger budget is all source-cardinality traffic
    (the corpus collapses to |sources| rows in its first aggregate);
    q_bucketed_join's single exchange is the final agg — the join
    itself is shuffle-free by bucket layout (test_scale pins that
    property on the operator)."""
    budgets = {
        "q_shortest_path": 2,
        "q_interval_coverage": 3,
        "q_match_recognize": 1,
        "q_bucketed_join": 2,
        "q_allocation": 8,
        "q_window_exclude": 1,
    }
    for name, budget in budgets.items():
        df = _q(spark, name)
        assert shuffle_count(df) <= budget, f"{name} over shuffle budget"
        assert not uses_python_udf(df), f"{name} crossed into Python"


def test_allocation_exact_n(spark):
    """Largest-remainder apportionment must hand out EXACTLY the 1000
    slots — the invariant per-group rounding breaks — and every
    source's slots must be within 1 of its unrounded share."""
    rows = _q(spark, "q_allocation").collect()
    assert sum(r["slots"] for r in rows) == 1000
    assert all(r["slots"] >= 0 for r in rows)


def test_shortest_path_bipartite_parity(spark):
    """The order-flow graph is bipartite (customer<->supplier), so
    every reached customer node sits at even distance and every
    supplier node at odd distance; the source is at 0."""
    rows = _q(spark, "q_shortest_path").collect()
    by_node = {r["node"]: r["dist"] for r in rows}
    assert by_node["c1"] == 0
    for node, dist in by_node.items():
        if node.startswith("c"):
            assert dist % 2 == 0, f"{node} at odd dist {dist}"
        else:
            assert dist % 2 == 1, f"{node} at even dist {dist}"
    assert 0 <= max(by_node.values()) <= 4


def test_match_recognize_witness_consistency(spark):
    """`matched` and the extracted witness must agree: a journey
    matches iff first_span is non-empty, and every witness starts
    with 'v', ends with 'p', and contains no 'e'."""
    rows = _q(spark, "q_match_recognize").collect()
    assert rows, "fixture journeys missing"
    for r in rows:
        assert r["matched"] == (r["first_span"] != "")
        assert len(r["journey"]) == r["n_events"]
        if r["matched"]:
            span = r["first_span"]
            assert span[0] == "v" and span[-1] == "p" and "e" not in span


def test_interval_coverage_bounds(spark):
    """Covered days per supplier are bounded below by the longest
    single interval (>= 1 day) and above by the span of the whole
    shipping calendar; island count is at least 1 for any supplier
    with shipments."""
    rows = _q(spark, "q_interval_coverage").collect()
    assert rows
    for r in rows:
        assert r["n_islands"] >= 1
        assert r["covered_days"] >= 1


def test_window_exclude_sums(spark):
    """Leave-one-out identity: others_total + own price equals the
    customer's full-partition total (checked in exact decimal via a
    groupBy twin)."""
    df = _q(spark, "q_window_exclude")
    orders = QUERIES["q_window_exclude"].fn  # noqa: F841  (doc anchor)
    from team_02_spark.queries._util import t

    raw = t(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey",
        F.col("o_totalprice").cast("decimal(18,4)").alias("p"),
    )
    totals = raw.groupBy("o_custkey").agg(F.sum("p").alias("tot"))
    joined = (
        df.join(raw, ["o_orderkey", "o_custkey"])
        .join(totals, "o_custkey")
        .select(
            (F.col("others_total") + F.col("p").cast("double")
             - F.col("tot").cast("double")).alias("diff")
        )
        .agg(F.max(F.abs("diff")).alias("mx"))
        .first()
    )
    assert joined["mx"] is not None and joined["mx"] < 1e-6


def test_reap_bucketed_tables_skips_live_app(spark, tmp_path):
    """The session-teardown reaper (extracted from q_bucketed_join,
    r7 verdict #8): current app's dirs are skipped UNCONDITIONALLY
    (even with an ancient mtime — the r7 advisor's overnight-session
    hazard), foreign dirs older than the cutoff are reaped, younger
    foreign dirs and non-matching prefixes survive."""
    import os
    import time

    from team_02_spark.operators.scale import reap_bucketed_tables

    app = spark.sparkContext.applicationId.replace("-", "_").replace(".", "_")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    os.makedirs(warehouse, exist_ok=True)
    old = time.time() - 8 * 86_400
    mine = os.path.join(warehouse, f"b7_test_{app}")
    stale = os.path.join(warehouse, "b7_test_some_dead_app_123")
    fresh = os.path.join(warehouse, "b7_test_young_app_456")
    other = os.path.join(warehouse, "not_b7_prefixed_old")
    for d in (mine, stale, fresh, other):
        os.makedirs(d, exist_ok=True)
    os.utime(mine, (old, old))
    os.utime(stale, (old, old))
    os.utime(other, (old, old))
    try:
        reaped = reap_bucketed_tables(spark, prefix="b7_test_")
        assert reaped == [stale]
        assert os.path.isdir(mine)      # live app: never reaped
        assert not os.path.isdir(stale)  # old foreign dir: reaped
        assert os.path.isdir(fresh)     # young foreign dir: kept
        assert os.path.isdir(other)     # prefix miss: untouched
    finally:
        import shutil

        for d in (mine, fresh, other):
            shutil.rmtree(d, ignore_errors=True)


def test_reap_default_prefixes_are_delimited():
    """r9 advisor low: a bare 'b9' default would glob-delete ANY
    warehouse dir starting with b9 (a future b900_/b9foo table). Every
    default prefix must end with the '_' delimiter, and the set must
    cover the scratch-table namers actually in the tree."""
    import inspect

    from team_02_spark.operators import scale

    sig = inspect.signature(scale.reap_bucketed_tables)
    defaults = sig.parameters["prefix"].default
    assert isinstance(defaults, tuple)
    assert all(p.endswith("_") for p in defaults), defaults
    # the r9 CDC query's scratch prefix is covered
    assert "b9cdc_" in defaults


def test_reap_collects_abandoned_serve_indexes(spark, tmp_path):
    """r14 advisor low: ivfpq_serve_* index caches (content-keyed,
    each a full corpus copy) were never reaped — a fixture
    regeneration or param change stranded the old dir forever. The
    default prefix set now covers them, age-gated by the freshness
    touch (ivf_pq_serve utimes the dir on every serve, so only a
    week-untouched index — nothing serves it anymore — ages out);
    orphaned .tmp./.junk. siblings collect by the same prefix."""
    import os
    import time

    from team_02_spark.operators.scale import reap_bucketed_tables

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    os.makedirs(warehouse, exist_ok=True)
    old = time.time() - 8 * 86_400
    stale = os.path.join(warehouse, "ivfpq_serve_deadbeef0123")
    junk = os.path.join(warehouse, "ivfpq_serve_deadbeef0123.junk.999")
    active = os.path.join(warehouse, "ivfpq_serve_cafebabe4567")
    for d in (stale, junk, active):
        os.makedirs(d, exist_ok=True)
        os.utime(d, (old, old))
    os.utime(active)  # a serve touched it this week -> alive
    try:
        reaped = reap_bucketed_tables(spark)
        assert stale in reaped and junk in reaped
        assert not os.path.isdir(stale) and not os.path.isdir(junk)
        assert os.path.isdir(active)
    finally:
        import shutil

        shutil.rmtree(active, ignore_errors=True)


def test_reap_bucketed_tables_remote_warehouse_noop(spark):
    """A remote-scheme warehouse is never walked — retention there
    belongs to the real catalog."""
    from team_02_spark.operators.scale import reap_bucketed_tables

    assert reap_bucketed_tables(spark, warehouse="s3a://bucket/warehouse") == []
