"""Semantic tests for the round-4 data-selection lanes: the
leakage-safe component split, DSIR importance selection, and the
Spark-4 API-surface queries (VARIANT, recursive CTE).

The oracle harness already proves these hash-match DuckDB; these
tests pin the SEMANTICS the hash can't see — the invariants that make
the lanes useful (no leakage across splits, selection skewed toward
the target slice, spine density)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from team_02_spark.queries import QUERIES


def test_component_split_has_zero_cross_split_near_dup_pairs(spark):
    """The defining invariant: after gating whole dup-components,
    q_split_leakage's cross-boundary pair query run against the
    COMPONENT split must return zero pairs (vs the per-doc gate,
    which demonstrably leaks — q_split_leakage finds pairs there)."""
    split = QUERIES["q_component_split"].fn(spark, SF_ORACLE)
    # Rebuild the >= 0.6 near-dup pairs exactly as the leakage audit
    # does, then ask whether any pair straddles the component split.
    pairs = (
        QUERIES["q_split_leakage"].fn(spark, SF_ORACLE)
        .select(
            F.col("train_id").alias("ida"), F.col("test_id").alias("idb")
        )
    )
    sp = split.select("doc_id", "split")
    crossing = (
        pairs.join(sp.withColumnRenamed("doc_id", "ida")
                   .withColumnRenamed("split", "sa"), "ida")
        .join(sp.withColumnRenamed("doc_id", "idb")
              .withColumnRenamed("split", "sb"), "idb")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert crossing == 0
    # ... and the per-doc gate DOES leak on the same fixture, so the
    # invariant above is non-vacuous.
    assert pairs.count() > 0


def test_component_split_members_share_the_root_gate(spark):
    """Every member of a component carries the same root and the same
    split decision; singletons root themselves."""
    split = QUERIES["q_component_split"].fn(spark, SF_ORACLE)
    per_root = split.groupBy("root").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_root.filter(F.col("n_splits") > 1).count() == 0
    singles = split.filter(F.col("root") == F.col("doc_id"))
    assert singles.count() > 0  # fixture has non-duplicated docs


def test_dsir_selection_skews_toward_target_sources(spark):
    """DSIR's whole point: docs from the target slice (src0-src3)
    must be selected at a strictly higher rate than the rest — the
    importance weights recover the target distribution."""
    scored = QUERIES["q_dsir_select"].fn(spark, SF_ORACLE)
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", "source"
    )
    rates = (
        scored.join(docs, "doc_id")
        .withColumn(
            "is_tgt", F.col("source").isin("src0", "src1", "src2", "src3")
        )
        .groupBy("is_tgt")
        .agg(F.avg(F.col("selected").cast("double")).alias("rate"))
        .collect()
    )
    by = {r["is_tgt"]: r["rate"] for r in rates}
    assert by[True] > by[False]


def test_date_spine_has_every_day_exactly_once(spark):
    """The recursive spine densifies: one row per calendar day in the
    window, including zero-order days, no duplicates."""
    out = QUERIES["q_date_spine_fill"].fn(spark, SF_ORACLE)
    rows = out.collect()
    assert len(rows) == 90  # 1995-01-01 .. 1995-03-31
    assert len({r["day"] for r in rows}) == 90
    assert all(r["n_orders"] >= 0 for r in rows)
    # zero-filled gap days exist at small SF and carry 0.0 revenue
    gaps = [r for r in rows if r["n_orders"] == 0]
    assert all(r["revenue"] == 0.0 for r in gaps)


def test_variant_props_matches_get_json_object_path(spark):
    """The VARIANT lane must agree with the legacy string-reparse
    path (get_json_object) — same values, different (faster) codepath."""
    out = QUERIES["q_variant_props"].fn(spark, SF_ORACLE)
    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    legacy = (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").cast("bigint").alias("sum_k_legacy"))
    )
    joined = out.join(legacy, "event_type")
    assert joined.filter(F.col("sum_k") != F.col("sum_k_legacy")).count() == 0
    assert joined.count() > 0


def _write_dup_docs(spark, tmp_path):
    """Synthetic documents table with ENGINEERED exact duplicates —
    the sf0.001/sf0.01 fixtures contain none, so without this the
    incremental-dedup / cluster-stats oracles are vacuous (0-removed
    vs 0-removed would hash-match even with a broken anti-join)."""
    base_text = "the quick brown fox jumps over the lazy dog"
    rows = []
    for i in list(range(8)) + list(range(10, 18)):  # base: doc_id % 10 < 8
        rows.append((i, f"unique base text {i}", "en", "src0", 20))
    rows[0] = (0, base_text, "en", "src0", len(base_text))
    # delta (doc_id % 10 >= 8): 8 duplicates a base text, 9 and 19
    # duplicate each other, 18 is fresh
    rows += [
        (8, base_text, "en", "src1", len(base_text)),
        (9, "delta twin text", "en", "src1", 15),
        (18, "fresh delta text", "en", "src1", 16),
        (19, "delta twin text", "en", "src1", 15),
    ]
    out = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_incremental_dedup_fires_on_real_duplicates(spark, tmp_path):
    """Non-vacuous check of BOTH dedup branches: the delta-vs-base
    anti-join must drop doc 8 (its text exists in the base index) and
    the within-delta keep-first must drop 19 (9 is its earlier twin);
    18 and 9 survive. Also differentially checked against the
    registered DuckDB oracle on the same synthetic table."""
    import duckdb

    from tests.oracle_harness import compare

    sf_dir = _write_dup_docs(spark, tmp_path)
    out = QUERIES["q_dedup_incremental"].fn(spark, sf_dir)
    assert {r["doc_id"] for r in out.collect()} == {9, 18}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    problems = compare(
        QUERIES["q_dedup_incremental"].fn(spark, sf_dir),
        con.execute(QUERIES["q_dedup_incremental"].oracle).fetchdf(),
    )
    assert not problems, problems


def test_dup_cluster_stats_counts_multirow_clusters(spark, tmp_path):
    """The histogram must actually report multi-row clusters: the
    synthetic table has exactly two size-2 clusters (base_text x2,
    delta twin x2) and 16 singletons."""
    sf_dir = _write_dup_docs(spark, tmp_path)
    out = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"])
        for r in QUERIES["q_dup_cluster_stats"].fn(spark, sf_dir).collect()
    }
    assert out[2] == (2, 4)
    assert out[1] == (16, 16)
