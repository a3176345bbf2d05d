"""Streaming curation slice — the batch curation composite's stages
wired as ONE readStream pipeline (SURVEY §2.9: every curation stage
runs in both modes):

    cheap per-row filters  ->  exact text dedup  ->  quality stats

All three stages are the SAME functions the batch path uses
(`functions.text.lang_id/quality_score/token_count`, md5-keyed exact
dedup, a grouped aggregate), applied to an unbounded DataFrame. The
per-row stages are stateless Column expressions, dedup is streaming
state keyed on the text hash, and the stats aggregate is an
incremental grouped state — nothing is batch-only.

Production note: this dedup uses `dropDuplicates` on the text hash,
which keeps state per distinct text forever; with an ingest-time
column the state-bounded form is `dropDuplicatesWithinWatermark`
(`streaming/stateful.py` covers that operator on the events stream —
documents carry no event time, so the slice keys on content only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from team_02_spark.functions.text import lang_id, quality_score, token_count


def curation_slice(docs: DataFrame, *, min_quality: float = 0.2,
                   min_tokens: int = 5,
                   text_col: str = "text") -> DataFrame:
    """Filters -> exact dedup -> per-language quality stats, written
    against EITHER a batch or a streaming documents frame.

    The stats group on the DERIVED lang_id (a pure function of the
    text), and the aggregates (count, token sum, quality sum in e6
    fixed point) depend only on the text — so WHICH duplicate survives
    the streaming race is irrelevant and batch == stream exactly."""
    annotated = docs.select(
        F.col(text_col),
        lang_id(F.col(text_col)).alias("lang_pred"),
        quality_score(F.col(text_col)).alias("quality"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    filtered = annotated.filter(
        (F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    )
    deduped = filtered.withColumn(
        "__k", F.md5(F.col(text_col))
    ).dropDuplicates(["__k"])
    return deduped.groupBy("lang_pred").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tot_tokens"),
        F.sum((F.col("quality") * 1_000_000).cast("bigint"))
        .cast("bigint").alias("quality_e6_sum"),
    )


def read_documents_stream(spark, sf_dir: str) -> DataFrame:
    """`documents` as a file stream — same landing-directory pattern
    as `windows.read_events_stream`."""
    import hashlib
    import os
    import tempfile

    path = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(path).schema
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    stream_dir = os.path.join(tempfile.gettempdir(), f"docs_stream_{tag}")
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(path, link)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
