"""REST ingestion lifecycle (SURVEY §2.1 S5; reference
src/main.py:133-158: poll Twitter REST → predict → insert to Mongo).

Spark-first shape: the HTTP poll happens on the DRIVER (external APIs
are a serial, rate-limited seam — parallelizing the fetch is the
anti-pattern), each poll lands as one immutable JSON-lines file, and
Structured Streaming tails the landing directory. Everything after the
landing dir is the engine's normal streaming surface, so the pipeline
is identical whether the upstream is tweepy, Kafka, or a bucket
notification feed — swap the fetch, keep the plan.

The HTTP client itself is injected (``fetch_fn``): tweepy/requests in
production, a deterministic stub in tests. External APIs aren't
oracle-checkable; the Spark-side plumbing is, and the integration test
asserts stream output ≡ the batch run over the same landed files.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

TWEET_SCHEMA = "id long, tweet string, created_at string"


def land_batch(records: list[dict], landing_dir: str) -> str:
    """Write one poll's records as an immutable JSON-lines file via
    tmp-write + atomic rename — file-stream sources must never observe
    a half-written file. Returns the landed path."""
    os.makedirs(landing_dir, exist_ok=True)
    name = f"poll_{uuid.uuid4().hex}.json"
    tmp = os.path.join(landing_dir, f".{name}.tmp")
    final = os.path.join(landing_dir, name)
    with open(tmp, "w", encoding="utf-8") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    os.replace(tmp, final)
    return final


def poll_to_landing(fetch_fn, landing_dir: str, *, n_polls: int = 1) -> list[str]:
    """The reference's poll loop (src/main.py:133-138) with the client
    injected: each ``fetch_fn()`` call returns a list of record dicts
    (one REST page); each page lands as one file."""
    return [land_batch(fetch_fn(), landing_dir) for _ in range(n_polls)]


def read_landing_stream(spark: SparkSession, landing_dir: str,
                        schema: str = TWEET_SCHEMA) -> DataFrame:
    """Tail the landing directory as a stream; one file per trigger
    keeps micro-batches poll-sized and the test deterministic."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(landing_dir)
    )


def stream_inference(stream_df: DataFrame, scorer, out_path: str,
                     checkpoint: str):
    """featurize → score → checkpointed predictions sink, streaming.

    ``scorer(df) -> df`` appends prediction columns (fitted MLlib
    models' ``transform`` chains work directly on streaming frames, as
    does the deterministic stand-in — both are narrow column exprs).
    Returns the StreamingQuery (availableNow trigger: drains what has
    landed, then stops — the batch-replayable form of a 24/7 stream)."""
    from team_02_spark.pipeline import featurize
    from team_02_spark.streaming.sinks import stream_to_parquet

    feats = featurize(stream_df)
    scored = scorer(feats)
    return stream_to_parquet(scored, out_path, checkpoint)
