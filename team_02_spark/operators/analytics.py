"""Reusable analytic operators behind the round-7 lanes: bounded-hop
BFS (the recursive-query shape Spark lacks) and per-key sweep-line
interval union. Extracted so property tests can fuzz the algorithms
on generated graphs/intervals independently of the fixture lanes
(`q_shortest_path`, `q_interval_coverage`), which pin the same code
against their DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from team_02_spark.util import shared_pass


def bfs_distances(
    edges: DataFrame, source: str, *, max_hops: int = 4
) -> DataFrame:
    """Single-source BFS hop distances over a directed edge list
    (``src``/``dst`` string columns), bounded at ``max_hops``.

    Scale-correct distributed BFS: each round is ONE equi-join of the
    current frontier against the edge list plus an anti-join that
    shrinks the frontier to first-time nodes, so per-round work is
    proportional to the NEW frontier, not the visited set. The edge
    list should be shared (the caller passes it through shared_pass
    if it is derived); frontier frames are node-bounded and
    checkpointed per round to cap plan depth. Returns (node, dist)
    with the minimum hop count per reached node; the source is at 0.
    """
    spark = edges.sparkSession
    frontier = spark.range(1).select(
        F.lit(source).alias("node"), F.lit(0).cast("int").alias("dist")
    )
    reached = frontier
    for r in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"), F.lit(r).cast("int").alias("dist"))
            .distinct()
            .join(reached.select("node"), "node", "left_anti")
            .transform(shared_pass)
        )
        reached = reached.unionByName(nxt)
        frontier = nxt
    return reached.groupBy("node").agg(F.min("dist").cast("int").alias("dist"))


def interval_union(
    df: DataFrame, key: str, start: str, end: str
) -> DataFrame:
    """Sweep-line union of (possibly overlapping) intervals per key:
    returns (key, n_islands, covered) where ``covered`` is the summed
    length max(end)-min(start) over merged islands. ``start``/``end``
    may be dates or integers (anything with ``-`` and a total order).

    Classic sweep: running MAX(end) over the start-ordered window
    marks island breaks (an interval opens a new island iff its start
    exceeds every previous end), a cumulative sum numbers islands,
    and coverage folds per island. Tie rows (equal start) can never
    open an island, so the (start, end) window order is total for the
    answer. One shuffle on the key, two window passes, an
    island-bounded aggregate — no joins, no driver state."""
    w = Window.partitionBy(key).orderBy(start, end)
    pmax = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked = df.withColumn(
        "__brk",
        F.when(pmax.isNull() | (F.col(start) > pmax), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    isl = marked.withColumn(
        "__island",
        F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    length = (
        F.datediff(F.max(end), F.min(start))
        if dict(df.dtypes)[start] in ("date", "timestamp")
        else (F.max(end) - F.min(start))
    )
    per_isl = isl.groupBy(key, "__island").agg(length.alias("__len"))
    return per_isl.groupBy(key).agg(
        F.count("*").cast("int").alias("n_islands"),
        F.sum("__len").cast("bigint").alias("covered"),
    )


def interval_union_salted(
    df: DataFrame, key: str, start: str, end: str, *, bucket_width: int
) -> DataFrame:
    """Hot-key-safe interval union: same answer as
    :func:`interval_union`, but no single window partition ever holds
    one key's full history — the documented remedy ("salt the
    calendar range if one key outgrows an executor", SCALING.md
    interval/journey sections) implemented ONCE as an operator
    instead of re-derived per lane (r7 verdict #7).

    Mechanics (re-shard by (key, epoch-bucket) + merge pass):

    1. Each interval is CLIPPED at ``bucket_width`` boundaries and
       exploded to the buckets it spans (exact integer bucket ids via
       pmod — no float rounding at any magnitude). Pick bucket_width
       on the order of the typical interval length, the
       binned_range_join guidance: the per-interval piece count stays
       ~2 and a hot key's rows spread over all its buckets.
    2. Stage-1 sweep runs per (key, bucket) — the partition the
       cluster can actually hold — collapsing each cell to its merged
       islands.
    3. Stage-2 runs the plain per-key sweep over the ISLANDS (a frame
       bounded by islands + touched buckets, orders of magnitude
       smaller than the input for dense keys). Pieces clipped at a
       boundary touch exactly (end == next start), and the sweep's
       break rule (`start > prev_max`) treats touching as the same
       island, so boundary cuts re-merge losslessly — island counts
       and coverage are IDENTICAL to the unsalted operator
       (hypothesis-fuzzed in tests/test_property_fuzz_r7.py).

    Integer axis only (dates/timestamps: convert with datediff /
    unix_micros first, as binned_range_join requires)."""
    w = int(bucket_width)
    if w <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    lw = F.lit(w)

    def bkt(c):
        # exact floor-division for any sign: (c - pmod(c, w)) / w is a
        # division of an exact multiple, so the double quotient is
        # exact up to 2^53 buckets
        return ((c - F.pmod(c, lw)) / lw).cast("long")

    pieces = df.select(
        F.col(key).alias(key),
        F.col(start).alias("__os"),
        F.col(end).alias("__oe"),
        F.explode(
            F.sequence(bkt(F.col(start)), bkt(F.col(end)))
        ).alias("__bkt"),
    ).select(
        key,
        "__bkt",
        F.greatest(F.col("__os"), F.col("__bkt") * lw).alias("__s"),
        F.least(F.col("__oe"), (F.col("__bkt") + 1) * lw).alias("__e"),
    )
    win = Window.partitionBy(key, "__bkt").orderBy("__s", "__e")
    pmax = F.max("__e").over(win.rowsBetween(Window.unboundedPreceding, -1))
    marked = pieces.withColumn(
        "__brk",
        F.when(pmax.isNull() | (F.col("__s") > pmax), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    isl = marked.withColumn(
        "__island",
        F.sum("__brk").over(win.rowsBetween(Window.unboundedPreceding, 0)),
    )
    stage1 = isl.groupBy(key, "__bkt", "__island").agg(
        F.min("__s").alias("s"), F.max("__e").alias("e")
    )
    return interval_union(stage1, key, "s", "e")
