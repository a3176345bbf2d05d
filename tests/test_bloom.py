"""Bloom-prefilter decontamination (operators/bloom.py): exactness
vs the gram-join path, superset property of the prefilter, sizing
math, and the driver-safety cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _docs_and_bench(spark):
    from team_02_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return docs, bench


def test_bloom_params_sizing():
    from team_02_spark.operators.bloom import bloom_params

    m1, k1 = bloom_params(10_000, fpp=1e-2)
    m2, k2 = bloom_params(10_000, fpp=1e-6)
    assert m2 > m1 and k2 > k1          # tighter fpp costs bits+probes
    assert m1 % 8 == 0 and m2 % 8 == 0  # whole bytes
    m0, k0 = bloom_params(0)
    assert m0 >= 8 and k0 >= 1          # degenerate input stays valid


def test_bloom_equals_exact_decontaminate(spark):
    """The headline property: bloom-prefiltered decontamination is
    EXACT — same survivor set as the full gram-join path."""
    from team_02_spark.operators.bloom import decontaminate_bloom
    from team_02_spark.operators.contamination import decontaminate

    docs, bench = _docs_and_bench(spark)
    exact = {r["doc_id"] for r in
             decontaminate(docs, bench, min_shared=5).select("doc_id").collect()}
    bloom = {r["doc_id"] for r in
             decontaminate_bloom(docs, bench, min_shared=5).select("doc_id").collect()}
    assert bloom == exact
    assert 0 < len(bloom) < docs.count()  # bench docs themselves removed


def test_bloom_prefilter_superset_and_selective(spark):
    """Candidates must contain every truly-contaminated doc (no false
    negatives) while passing only a small corpus fraction."""
    from team_02_spark.operators.bloom import bloom_candidates, build_ngram_bloom
    from team_02_spark.operators.contamination import find_contaminated

    docs, bench = _docs_and_bench(spark)
    bits, m, k = build_ngram_bloom(bench)
    cand = bloom_candidates(docs, bits, m, k, min_shared=5)
    cand_ids = {r["doc_id"] for r in cand.select("doc_id").collect()}
    true_ids = {r["doc_id"] for r in
                find_contaminated(docs, bench, min_shared=5)
                .select("doc_id").distinct().collect()}
    assert true_ids <= cand_ids
    assert len(cand_ids) < 0.2 * docs.count()


def test_bloom_synthetic_verbatim_overlap(spark):
    from team_02_spark.operators.bloom import decontaminate_bloom

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely unrelated content with different words entirely"),
         (3, "quick brown fox jumps over everything else near here")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "bench_id long, text string",
    )
    ids = {r["doc_id"] for r in decontaminate_bloom(docs, bench, min_shared=2).collect()}
    assert 1 not in ids and 2 in ids


def test_bloom_empty_benchmark_keeps_everything(spark):
    from team_02_spark.operators.bloom import decontaminate_bloom

    docs = spark.createDataFrame(
        [(1, "some text here"), (2, "other text there")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([], "bench_id long, text string")
    assert decontaminate_bloom(docs, bench, min_shared=2).count() == 2


def test_bloom_driver_cap_guard(spark, monkeypatch):
    import team_02_spark.operators.bloom as bloom_mod

    _, bench = _docs_and_bench(spark)
    monkeypatch.setattr(bloom_mod, "MAX_BENCH_GRAMS", 10)
    with pytest.raises(ValueError, match="distinct grams"):
        bloom_mod.build_ngram_bloom(bench)


def test_bloom_prefilter_single_python_eval(spark):
    """The filter on the UDF output must NOT duplicate the UDF: with a
    deterministic pandas_udf the optimizer collapses the projection
    into the filter and evaluates the UDF (and its whole JVM gram-hash
    input tree) twice — measured 5x wall. asNondeterministic pins the
    single-eval plan."""
    import contextlib
    import io

    from team_02_spark.operators.bloom import bloom_candidates, build_ngram_bloom

    docs, bench = _docs_and_bench(spark)
    bits, m, k = build_ngram_bloom(bench)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bloom_candidates(docs, bits, m, k, min_shared=5).explain("formatted")
    assert buf.getvalue().count("ArrowEvalPython (") == 1
