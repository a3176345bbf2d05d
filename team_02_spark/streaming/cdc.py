"""Streaming CDC apply — a Debezium-style change feed folded into a
parquet snapshot through ``foreachBatch`` idempotent upserts (the
exactly-once sink pattern the engine demonstrates here; r7 verdict
#5). The batch twin is `q_cdc_apply` (queries/r7c_queries.py) /
`operators.upsert.upsert`; this module drives the SAME merge from a
`readStream`, so CDC runs in both modes like every other curation
stage.

Contract that makes replays safe: change rows carry the FULL
replacement payload (op 'U' = replace, 'I' = insert, 'D' =
tombstone), never deltas — so re-applying a micro-batch after a
failure/restart reproduces the identical state (replace twice =
replace once, delete twice = delete once). Structured Streaming's
foreachBatch guarantees at-least-once with a stable ``batch_id``;
idempotent-by-replacement + overwrite-to-a-batch-keyed-dir upgrades
that to effectively-exactly-once.

State layout (plain parquet — no transactional format needed):

    <state_dir>/v{batch_id:012d}/   snapshot AFTER applying batch_id
    <state_dir>/_LATEST             pointer file (atomic rename)

At 100 TB each micro-batch costs the upsert's one key-shuffle join
of snapshot x batch (broadcast when the batch is small, the common
CDC case) and a full snapshot rewrite — the plain-parquet trade-off;
swap the sink for a transactional table format to get row-level
merges, keeping this module's batching/ordering logic unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window, functions as F

from team_02_spark.operators.upsert import upsert

_POINTER = "_LATEST"


def latest_state(spark, state_dir: str) -> DataFrame | None:
    """Read the snapshot the pointer file names, or None before the
    first batch lands."""
    ptr = os.path.join(state_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(state_dir, version))


def _advance_pointer(state_dir: str, version: str) -> None:
    # temp-file + rename: readers never observe a torn pointer
    ptr = os.path.join(state_dir, _POINTER)
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, ptr)


def seed_state(base: DataFrame, state_dir: str) -> None:
    """Install the initial snapshot (the state CDC batches fold into)."""
    os.makedirs(state_dir, exist_ok=True)
    base.write.mode("overwrite").parquet(os.path.join(state_dir, "v_seed"))
    _advance_pointer(state_dir, "v_seed")


def collapse_to_last_op(changes: DataFrame, key: str, seq_col: str) -> DataFrame:
    """Within one micro-batch a key may appear several times (U then
    D, I then U, ...); only the LAST op by the feed's sequence column
    may reach the merge — applying intermediate ops would expose
    states that never existed at any feed position. One row_number
    window on (key | desc seq), the standard CDC compaction."""
    w = Window.partitionBy(key).orderBy(F.desc(seq_col))
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_cdc_batch(batch: DataFrame, batch_id: int, *, state_dir: str,
                    key: str, seq_col: str, op_col: str = "op") -> None:
    """The foreachBatch body (callable directly in tests): collapse
    the batch to last-op-per-key, merge into the current snapshot via
    the shared upsert operator (D rows tombstone, U/I rows replace or
    insert), write the result to a batch-keyed dir with overwrite
    (replay rewrites the same dir), then atomically advance the
    pointer. Idempotent by the replacement contract above."""
    spark = batch.sparkSession
    last = collapse_to_last_op(batch, key, seq_col)
    payload_cols = [
        c for c in last.columns if c not in (op_col, seq_col)
    ]
    updates = last.select(
        *payload_cols,
        (F.col(op_col) == "D").alias("__tombstone"),
    )
    base = latest_state(spark, state_dir)
    if base is None:
        base = spark.createDataFrame([], updates.drop("__tombstone").schema)
    merged = upsert(
        base, updates, key,
        tombstone_col="__tombstone", broadcast_updates=False,
    )
    version = f"v{batch_id:012d}"
    merged.write.mode("overwrite").parquet(os.path.join(state_dir, version))
    _advance_pointer(state_dir, version)


def cdc_upsert_stream(changes: DataFrame, *, state_dir: str, key: str,
                      seq_col: str, op_col: str = "op",
                      checkpoint_dir: str):
    """Wire a change-feed stream into the idempotent snapshot sink.
    Returns the started StreamingQuery; the caller picks the trigger
    semantics by awaiting it (tests use bounded file feeds +
    trigger(availableNow) drained by awaitTermination)."""
    os.makedirs(state_dir, exist_ok=True)

    def _apply(batch_df, batch_id):
        apply_cdc_batch(batch_df, batch_id, state_dir=state_dir,
                        key=key, seq_col=seq_col, op_col=op_col)

    return (
        changes.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
