"""Streaming lane (SURVEY.md §2.9): windowed aggregations, watermarks,
session windows, stateful dedup — each a pure DataFrame→DataFrame
stage function that works identically on a batch DataFrame and a
``readStream`` DataFrame (Structured Streaming's unified Dataset API).

The reference's only "streaming" is a one-shot REST poll re-run by
Airflow (reference src/main.py:133-138, README.md:12); true streams
are an engine extension over the `events` fixture.

Batch≡stream equivalence is tested in tests/test_streaming.py by
running the same function over `readStream.parquet` + foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# decimal-exact sum discipline (see queries/_util.py DEC — duplicated
# here, not imported, to keep the streaming lane free of the query
# registry and avoid an import cycle)
DEC = "decimal(18,4)"


def tumbling_agg(events: DataFrame, width: str = "1 hour",
                 watermark: str | None = None) -> DataFrame:
    """T1: tumbling window per event_type — count + decimal-exact value
    sum. With ``watermark`` set (streaming), state for windows older
    than the watermark is dropped (bounded state at any scale)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(events: DataFrame, width: str = "1 hour",
                slide: str = "15 minutes",
                watermark: str | None = None) -> DataFrame:
    """T1: sliding window (each event lands in width/slide windows)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_agg(events: DataFrame, gap: str = "30 minutes",
                watermark: str | None = None) -> DataFrame:
    """T3: session windows per user — events closer than ``gap`` merge;
    a session closes ``gap`` after its last event."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


def stream_dedup(events: DataFrame, keys: list[str],
                 watermark: str = "10 minutes") -> DataFrame:
    """T4: stateful stream dedup — duplicates arriving within the
    watermark horizon are dropped; state is GC'd past it. In batch
    mode this degrades to dropDuplicates(keys)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def windowed_cms(events: DataFrame, value: str = "event_type",
                 window_width: str = "1 hour",
                 watermark: str | None = None, *,
                 depth: int | None = None,
                 buckets: int | None = None) -> DataFrame:
    """Per-window count-min sketch PARTIALS over a stream — the
    frequency companion to the windowed aggregates above: each window
    emits its (depth, bucket, cnt) counter table (bounded at d*w rows
    per window regardless of stream volume), so per-window heavy
    hitters / join-size estimates are answered later from counters
    alone, with the raw stream never stored. This is a plain windowed
    groupBy, so Structured Streaming gives it watermark-driven state
    eviction for free — no custom stateful operator needed; window
    rollups merge downstream by counter SUM (operators/sketches.
    merge_cms with the window column as a key). Identical semantics in
    batch mode; the batch==stream test pins it."""
    from team_02_spark.operators.sketches import (
        CMS_DEPTH, CMS_WIDTH, cms_bucket_cols,
    )

    d = depth or CMS_DEPTH
    w = buckets or CMS_WIDTH
    src = events.withWatermark("ts", watermark) if watermark else events
    bcols = F.array(*cms_bucket_cols(F.col(value), d, w))
    return (
        src.select("ts", F.posexplode(bcols).alias("depth", "bucket"))
        .groupBy(F.window("ts", window_width).alias("w"), "depth", "bucket")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            "depth", "bucket", "cnt",
        )
    )


def read_events_stream(spark, sf_dir: str) -> DataFrame:
    """`events` as a file stream: the landing-directory pattern — at
    scale this is `readStream` on a date-partitioned bucket or Kafka;
    the downstream stage functions are identical."""
    import hashlib
    import os
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # The file-stream source needs a DIRECTORY (its basePath); the
    # fixture is a single file — expose it through a stable symlink
    # dir (the landing-directory pattern in miniature).
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    stream_dir = os.path.join(tempfile.gettempdir(), f"events_stream_{tag}")
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(path, link)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    # same ts normalization invariant as sources.registry.load_table:
    # event-time consumers need a true `timestamp` column
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def windowed_value_counts(events: DataFrame, value: str = "event_type",
                          window_width: str = "6 hours",
                          watermark: str | None = None) -> DataFrame:
    """Per-window value counts — the streamable HALF of windowed
    top-k: a plain windowed groupBy (append-mode-safe under a
    watermark, state evicted per window). Ranking is NOT append-mode
    streamable (a rank can change until the window closes), so the
    top-k cut lives in ``topk_of_window_counts`` and runs on CLOSED
    windows — in foreachBatch, or on the materialized sink table.
    Identical semantics in batch mode; the batch==stream test pins
    the counts stage row-for-row."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", window_width).alias("w"), F.col(value))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), value, "cnt")
    )


def topk_of_window_counts(counts: DataFrame, value: str = "event_type",
                          k: int = 3) -> DataFrame:
    """Rank finisher for ``windowed_value_counts``: top-k values per
    closed window with a deterministic (count desc, value asc) total
    order. Runs per-window (WindowGroupLimit keeps a k-heap per
    group), over window-count x alphabet rows — never the stream."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start").orderBy(
        F.desc("cnt"), F.asc(value)
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("window_start", value, "cnt", F.col("rnk").cast("bigint").alias("rnk"))
    )
