"""Stream-stream interval join and stream-static enrichment:
stream result must equal the batch call on the same bounded fixture
(the unified-API oracle used across the streaming lane).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from team_02_spark.streaming.joins import enrich_with_static, interval_join

IMPRESSIONS = [
    ("A", "2026-01-01T10:00:00Z"),
    ("B", "2026-01-01T10:00:00Z"),
    ("A", "2026-01-01T11:00:00Z"),
]
CLICKS = [
    ("A", "2026-01-01T10:05:00Z"),   # matches A@10:00 (within 10 min)
    ("A", "2026-01-01T10:20:00Z"),   # matches nothing (gap 20 min)
    ("A", "2026-01-01T11:09:00Z"),   # matches A@11:00
    ("C", "2026-01-01T10:01:00Z"),   # no impression for C
]


def _land(tmp_path, name, rows, ts_col):
    d = tmp_path / name
    d.mkdir()
    p = d / "data.json"
    p.write_text(
        "\n".join(json.dumps({"user_id": u, ts_col: ts}) for u, ts in rows)
    )
    os.utime(p, (1_700_000_000, 1_700_000_000))
    return str(d)


def test_interval_join_stream_equals_batch(spark, tmp_path):
    imp_dir = _land(tmp_path, "imp", IMPRESSIONS, "l_ts")
    clk_dir = _land(tmp_path, "clk", CLICKS, "r_ts")
    imp_schema = "user_id string, l_ts timestamp"
    clk_schema = "user_id string, r_ts timestamp"

    batch = interval_join(
        spark.read.schema(imp_schema).json(imp_dir),
        spark.read.schema(clk_schema).json(clk_dir),
        "user_id",
    )
    expect = sorted(map(tuple, batch.collect()))
    assert len(expect) == 2  # A@10:00->10:05 and A@11:00->11:09 only

    s_imp = spark.readStream.schema(imp_schema).json(imp_dir)
    s_clk = spark.readStream.schema(clk_schema).json(clk_dir)
    joined = interval_join(s_imp, s_clk, "user_id")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM ssj").collect()))
    assert got == expect


def test_enrich_with_static_stream_equals_batch(spark, tmp_path):
    imp_dir = _land(tmp_path, "imp2", IMPRESSIONS, "l_ts")
    imp_schema = "user_id string, l_ts timestamp"
    dim = spark.createDataFrame(
        [("A", "premium"), ("B", "free")], "user_id string, tier string"
    )

    batch = enrich_with_static(
        spark.read.schema(imp_schema).json(imp_dir), dim, "user_id"
    )
    expect = sorted(map(tuple, batch.collect()))
    assert {r for r in expect if r[2] == "premium"}  # join actually hit

    stream = spark.readStream.schema(imp_schema).json(imp_dir)
    q = (
        enrich_with_static(stream, dim, "user_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM enrich").collect()))
    assert got == expect


def test_interval_join_left_outer_emits_final_nulls(spark, tmp_path):
    """Outer stream-stream semantics: unmatched impressions emit with
    NULL r_ts only after the watermark passes their join window (so
    the null is final). Driven with the watermark-advance pattern: a
    first drain buffers the unmatched rows as state; landing a
    far-future sentinel and re-draining from the same checkpoint
    advances the watermark and flushes them. The batch left join over
    the original files is the oracle."""
    from team_02_spark.streaming.joins import interval_join_left

    imp_dir = _land(tmp_path, "impL", IMPRESSIONS, "l_ts")
    clk_dir = _land(tmp_path, "clkL", CLICKS, "r_ts")
    imp_schema = "user_id string, l_ts timestamp"
    clk_schema = "user_id string, r_ts timestamp"

    batch = interval_join_left(
        spark.read.schema(imp_schema).json(imp_dir),
        spark.read.schema(clk_schema).json(clk_dir),
        "user_id",
    )
    expect = sorted(map(tuple, batch.collect()))
    # 2 matched + the unmatched B@10:00 as a null row
    assert len(expect) == 3
    assert sum(1 for r in expect if r[2] is None) == 1

    out = str(tmp_path / "outL")

    def drain():
        # parquet sink: checkpoint-recoverable (memory sink is not),
        # which the second drain needs to resume join state
        q = (
            interval_join_left(
                spark.readStream.schema(imp_schema).json(imp_dir),
                spark.readStream.schema(clk_schema).json(clk_dir),
                "user_id",
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckptL"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    # advance both watermarks with far-future sentinels (their own
    # pending state never closes — excluded from the comparison)
    far = [("ZZ", "2026-01-02T00:00:00Z")]
    _land(tmp_path, "impL/late", far, "l_ts")
    _land(tmp_path, "clkL/late", far, "r_ts")
    drain()

    got = sorted(
        map(tuple, spark.read.parquet(out)
            .filter(F.col("user_id") != "ZZ").collect())
    )
    assert got == expect
