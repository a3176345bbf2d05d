"""Round-9 depth lane: the streaming CDC sink driven through BUCKETED
catalog-table state end to end (r8 verdict #5 / next-round #2).

`q_cdc_stream` proves the streaming sink contract; this lane proves
the 100 TB STATE path under the same contract: the snapshot lives as
a catalog table bucketed by the key, every micro-batch merge is
`operators.upsert.upsert_bucketed` (zero Exchange — the snapshot-side
shuffle is paid once, at seed time), and each merged output is
written bucketed again so the next batch inherits the layout. The
oracle is byte-for-byte `CDC_STREAM_ORACLE`: the physical state
layout must be invisible in the result — the same
physical-rewrite-is-bit-identical pattern that pins `q_join_salted`
and `q_interval_coverage_salted`. The per-batch zero-Exchange plans
are pinned by tests/test_streaming.py (plan_sink across 3 real
micro-batches).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from team_02_spark.queries.r8_queries import (
    CDC_STREAM_ORACLE,
    _cdc_feed,
    _cdc_scratch_root,
)
from team_02_spark.queries.registry import query


@query("q_cdc_stream_bucketed", oracle=CDC_STREAM_ORACLE)
def q_cdc_stream_bucketed(spark, sf_dir):
    """Same deterministic 3-micro-batch change feed as `q_cdc_stream`,
    folded through `streaming.cdc.cdc_upsert_stream_bucketed` into
    co-bucketed catalog-table snapshots instead of parquet dirs: the
    full-outer merge plans ZERO Exchange on the snapshot side every
    batch, and the bucketed output hands batch N+1 the same layout —
    per-batch cost O(batch + one snapshot pass), never a snapshot
    re-shuffle (a plain full-outer merge re-shuffles the entire
    snapshot per batch; it cannot broadcast). Versioned tables double
    as the pointer (catalog listing, monotone batch ids), so there is
    no pointer-flip crash window. Hash-checked against the one-shot
    SQL fold — identical to the plain lane's oracle by design."""
    import hashlib

    from team_02_spark.streaming.cdc import (
        _bucketed_versions,
        cdc_upsert_stream_bucketed,
        latest_state_bucketed,
        seed_state_bucketed,
    )

    from team_02_spark.operators.scale import adaptive_buckets

    root = _cdc_scratch_root(spark, sf_dir, "cdcstreamb")
    feed_dir, seed = _cdc_feed(spark, sf_dir, root)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    app = spark.sparkContext.applicationId.replace("-", "_").replace(".", "_")
    prefix = f"b9cdc_{tag}_{app}"
    for v in _bucketed_versions(spark, prefix):  # idempotent re-runs
        spark.sql(f"DROP TABLE IF EXISTS {v}")
    # r16 (guide §6 / r15 verdict #4): bucket count DERIVED from the
    # seed snapshot's size instead of the pinned 16 — one bounded
    # count (parquet-footer-cheap), fixed at seed time for the whole
    # state lineage. The fixture seeds derive 1 bucket (15k rows →
    # one ~250 KB file per version instead of 16 ~9 KB files across
    # 6 bucketed writes per run); a 1.5e9-row production snapshot
    # derives ~375 ≈ 128 MB buckets. Layout is oracle-invisible and
    # the zero-Exchange merge property is bucket-count-independent
    # (test_cdc_stream_bucketed_layout_survives_bucket_count_change
    # already pins it at 4 AND 32).
    n_buckets = adaptive_buckets(seed.count())
    seed_state_bucketed(seed, prefix, "k", num_buckets=n_buckets)
    feed = (
        spark.readStream.schema("seq long, k long, bal_cents long, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir + "/*")
    )
    stream = cdc_upsert_stream_bucketed(
        feed, state_prefix=prefix, key="k", seq_col="seq",
        checkpoint_dir=f"{root}/ckpt", num_buckets=n_buckets,
    )
    if not stream.awaitTermination(300):
        stream.stop()
        raise TimeoutError(
            "q_cdc_stream_bucketed: availableNow drain exceeded 300 s — "
            "refusing to hash a partially-advanced snapshot"
        )
    return latest_state_bucketed(spark, prefix).select(
        F.col("k").alias("c_custkey"), "bal_cents"
    )
