"""Streaming observability: a StreamingQueryListener that captures
per-micro-batch progress (rows/sec, batch duration, state size) —
the metrics feed every production stream needs for lag alerting and
capacity planning (reference scope: the poll loop at
src/main.py:133-138 has no observability at all; this is what the
Spark-native replacement reports for free).

The listener runs on the DRIVER (Spark delivers progress events
there); records accumulate in a bounded in-memory ring and can be
flushed to a parquet metrics table for dashboarding. At 100 TB the
same listener feeds the metrics sink unchanged — progress events are
tiny JSON regardless of data volume.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Capture numRowsPerSecond / durations / state metrics per batch.

    ``records`` is a bounded deque of flat dicts (one per micro-batch,
    newest last) — bounded so a weeks-long stream can't grow driver
    memory; flush to storage with :meth:`flush_to_parquet`."""

    def __init__(self, max_records: int = 10_000):
        self.records: deque[dict] = deque(maxlen=max_records)

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        state = p.stateOperators or []
        self.records.append(
            {
                "query_id": str(p.id),
                "batch_id": p.batchId,
                "timestamp": p.timestamp,
                "num_input_rows": p.numInputRows,
                "input_rows_per_second": float(p.inputRowsPerSecond or 0.0),
                "processed_rows_per_second": float(
                    p.processedRowsPerSecond or 0.0
                ),
                "batch_duration_ms": int(
                    (p.durationMs or {}).get("triggerExecution", 0)
                ),
                "state_rows_total": int(
                    sum(s.numRowsTotal for s in state)
                ),
            }
        )

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass

    def flush_to_parquet(self, spark, path: str) -> int:
        """Append the captured records as a parquet metrics table
        (one row per micro-batch) and clear the ring. Returns the
        number of rows flushed."""
        rows = list(self.records)
        if not rows:
            return 0
        schema = (
            "query_id string, batch_id long, timestamp string, "
            "num_input_rows long, input_rows_per_second double, "
            "processed_rows_per_second double, batch_duration_ms long, "
            "state_rows_total long"
        )
        spark.createDataFrame(
            [tuple(r.values()) for r in rows], schema
        ).write.mode("append").parquet(path)
        self.records.clear()
        return len(rows)
