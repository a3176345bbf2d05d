"""Count-min sketch lane (operators/sketches.py) — mergeability,
the overestimate-only guarantee, and heavy-hitter agreement with
exact top-k (the judge's done-criterion for the lane)."""

from __future__ import annotations

from pyspark.sql import functions as F

from team_02_spark.operators.sketches import (
    cms_bucket_cols,
    cms_heavy_hitters,
    estimate_cms,
    merge_cms,
    shard_cms,
)


def _stream(spark):
    # skewed synthetic stream: value v appears v times, v in 1..40
    rows = [(f"v{v:02d}",) for v in range(1, 41) for _ in range(v)]
    return spark.createDataFrame(rows, "item string")


def test_merge_of_shards_equals_single_pass(spark):
    df = _stream(spark).repartition(8)
    sharded = merge_cms(shard_cms(df, keys=[], value="item"), keys=[])
    single = merge_cms(
        shard_cms(df.coalesce(1), keys=[], value="item"), keys=[]
    )
    assert sharded.exceptAll(single).count() == 0
    assert single.exceptAll(sharded).count() == 0


def test_counter_mass_equals_stream_length(spark):
    df = _stream(spark)
    n = df.count()
    cms = merge_cms(shard_cms(df, keys=[], value="item"), keys=[])
    per_depth = cms.groupBy("depth").agg(F.sum("cnt").alias("s")).collect()
    assert len(per_depth) == 5
    assert all(r.s == n for r in per_depth)


def test_estimate_never_underestimates(spark):
    df = _stream(spark)
    cms = merge_cms(shard_cms(df, keys=[], value="item"), keys=[])
    exact = df.groupBy("item").agg(F.count("*").alias("exact"))
    est = estimate_cms(cms, exact, value="item")
    assert est.filter(F.col("est") < F.col("exact")).count() == 0


def test_estimates_exact_when_width_dominates_vocab(spark):
    # 40 distinct values vs 8192 buckets x 5 rows: collisions in ALL
    # five rows are overwhelmingly unlikely, so min-counter is exact
    df = _stream(spark)
    cms = merge_cms(shard_cms(df, keys=[], value="item"), keys=[])
    exact = df.groupBy("item").agg(F.count("*").alias("exact"))
    est = estimate_cms(cms, exact, value="item")
    assert est.filter(F.col("est") != F.col("exact")).count() == 0


def test_heavy_hitters_agree_with_exact_topk(spark):
    df = _stream(spark)
    hh = cms_heavy_hitters(df, value="item", k=10).collect()
    got = [r.item for r in hh]
    expected = [f"v{v:02d}" for v in range(40, 30, -1)]
    assert got == expected
    assert all(r.est == r.exact and r.overestimate == 0 for r in hh)


def test_narrow_width_forces_overestimates_not_under(spark):
    # width 4: guaranteed collisions — estimates may inflate but the
    # one-sided error bound must hold for every value
    df = _stream(spark)
    cms = merge_cms(
        shard_cms(df, keys=[], value="item", width=4), keys=[]
    )
    exact = df.groupBy("item").agg(F.count("*").alias("exact"))
    est = estimate_cms(cms, exact, value="item", width=4)
    assert est.filter(F.col("est") < F.col("exact")).count() == 0
    assert est.filter(F.col("est") > F.col("exact")).count() > 0


def test_keyed_sketches_stay_isolated(spark):
    rows = [("a", "x")] * 7 + [("b", "x")] * 3
    df = spark.createDataFrame(rows, "grp string, item string")
    cms = merge_cms(shard_cms(df, keys=["grp"], value="item"), keys=["grp"])
    items = spark.createDataFrame(
        [("a", "x"), ("b", "x")], "grp string, item string"
    )
    est = {r.grp: r.est
           for r in estimate_cms(cms, items, value="item",
                                 keys=["grp"]).collect()}
    assert est == {"a": 7, "b": 3}


def test_param_guards():
    import pytest

    with pytest.raises(ValueError):
        cms_bucket_cols(F.lit("x"), depth=9)
    with pytest.raises(ValueError):
        cms_bucket_cols(F.lit("x"), width=1 << 17)


def test_join_size_estimate_one_sided_and_exact_when_wide(spark):
    from team_02_spark.operators.sketches import cms_join_size

    # A: key k appears k times (k=1..20); B: each key once → true
    # join size = sum(1..20) = 210
    a = spark.createDataFrame(
        [(f"k{k:02d}",) for k in range(1, 21) for _ in range(k)],
        "v string")
    b = spark.createDataFrame(
        [(f"k{k:02d}",) for k in range(1, 21)], "v string")
    cms_a = merge_cms(shard_cms(a, keys=[], value="v"), keys=[])
    cms_b = merge_cms(shard_cms(b, keys=[], value="v"), keys=[])
    est = cms_join_size(cms_a, cms_b).collect()[0].est_pairs
    assert est == 210  # 20 keys vs 8192 buckets: no collisions

    # narrow width forces collisions: estimate may inflate, never under
    na = merge_cms(shard_cms(a, keys=[], value="v", width=4), keys=[])
    nb = merge_cms(shard_cms(b, keys=[], value="v", width=4), keys=[])
    nest = cms_join_size(na, nb).collect()[0].est_pairs
    assert nest >= 210


def test_join_size_estimate_disjoint_keys_near_zero(spark):
    from team_02_spark.operators.sketches import cms_join_size

    a = spark.createDataFrame([(f"a{k}",) for k in range(30)], "v string")
    b = spark.createDataFrame([(f"b{k}",) for k in range(30)], "v string")
    cms_a = merge_cms(shard_cms(a, keys=[], value="v"), keys=[])
    cms_b = merge_cms(shard_cms(b, keys=[], value="v"), keys=[])
    est = cms_join_size(cms_a, cms_b).collect()[0].est_pairs
    assert est == 0  # 60 keys in 8192 buckets: no cross-collision


def test_estimate_rejects_colliding_item_columns(spark):
    import pytest

    from team_02_spark.operators.sketches import estimate_cms

    df = spark.createDataFrame([("x",)], "v string")
    cms = merge_cms(shard_cms(df, keys=[], value="v"), keys=[])
    items = spark.createDataFrame([("x", 1)], "v string, cnt bigint")
    with pytest.raises(ValueError, match="collide"):
        estimate_cms(cms, items, value="v")


def test_bitmap_distinct_exact_and_merge_lossless(spark):
    from team_02_spark.operators.sketches import (
        merge_bitmaps, shard_bitmaps,
    )

    # values straddle multiple 32k-bit buckets on purpose
    rows = [("g1", v) for v in [0, 1, 5, 40000, 40000, 70000]] + [
        ("g2", v) for v in [7, 7, 7, 99999]
    ]
    df = spark.createDataFrame(rows, "grp string, v bigint")
    sharded = merge_bitmaps(
        shard_bitmaps(df.repartition(4), keys=["grp"], value="v"),
        keys=["grp"],
    )
    got = {r.grp: r.exact_distinct for r in sharded.collect()}
    assert got == {"g1": 5, "g2": 2}
    single = merge_bitmaps(
        shard_bitmaps(df.coalesce(1), keys=["grp"], value="v"),
        keys=["grp"],
    )
    assert {r.grp: r.exact_distinct for r in single.collect()} == got
