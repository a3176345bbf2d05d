"""Stream-stream and stream-static joins (Structured Streaming's
join surface, completing the T-lane beyond windowed aggs).

- ``interval_join``: the canonical ad-tech shape — match rows of two
  event streams on a key where the right event lands within a time
  interval after the left one (impression → click attribution). Both
  sides carry watermarks, and the time-bound predicate is what lets
  Spark GC join state: without it a stream-stream inner join would
  buffer both streams forever. State is partitioned by the join key
  across executors — nothing on the driver, horizontal at any scale.
- ``enrich_with_static``: stream-static join — the streaming side
  probes a (small, broadcast) dimension table per micro-batch; the
  pattern for attaching slowly-changing reference data to a firehose.

Both are plain DataFrame→DataFrame stage functions, so the BATCH
form of the same call is the oracle (tests assert stream ≡ batch on
a bounded fixture) — the unified-API contract the engine keeps
everywhere else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(left: DataFrame, right: DataFrame, key: str, *,
                  left_ts: str = "l_ts", right_ts: str = "r_ts",
                  within: str = "10 minutes",
                  left_watermark: str = "20 minutes",
                  right_watermark: str = "20 minutes",
                  how: str = "inner") -> DataFrame:
    """Join on ``key`` with r_ts in [l_ts, l_ts + within].

    Streaming inputs get watermarks (required for state GC on
    stream-stream joins); batch inputs skip them, which is what
    makes the batch call the exact oracle for the stream call.
    ``how`` is the single point where the outer variant differs —
    the time predicate lives HERE only, so a bound change can never
    diverge the two forms."""
    if left.isStreaming:
        left = left.withWatermark(left_ts, left_watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, right_watermark)
    cond = (
        (left[key] == right[key])
        & (right[right_ts] >= left[left_ts])
        & (right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return left.join(right, cond, how).select(
        left[key].alias(key),
        left[left_ts].alias(left_ts),
        right[right_ts].alias(right_ts),
    )


def enrich_with_static(stream: DataFrame, dim: DataFrame,
                       key: str) -> DataFrame:
    """Stream-static left join; the static side is explicitly
    broadcast — per micro-batch it is a map-side hash probe, never a
    shuffle of the stream."""
    return stream.join(F.broadcast(dim), key, "left")


def interval_join_left(left: DataFrame, right: DataFrame, key: str,
                       **kwargs) -> DataFrame:
    """LEFT OUTER stream-stream interval join — the attribution shape
    where every left event must appear exactly once, matched or not
    (impression -> click-or-null). Same predicate/watermark wiring as
    ``interval_join`` (one definition); the outer semantics add the
    watermark-driven null emission: an unmatched left row is held in
    state until the watermark passes its join window's upper bound,
    THEN emitted with nulls — so null rows are provably final, never
    retracted. In batch the same call is a plain left join, the
    oracle the tests compare against."""
    return interval_join(left, right, key, how="leftOuter", **kwargs)
