"""Round-8 depth lanes.

One declared key: the hot-key-SALTED interval union proven against
the UNSALTED DuckDB truth — the same driver-hash-check pattern that
pins `salted_join` (`q_join_salted`): the skew-safe rewrite must be
bit-equal to the plain semantics on real data, not just on fuzzed
inputs. (The round's other additions — streaming CDC, the reliable
shared-pass branch, the warehouse reaper — are infrastructure pinned
by tests, not declarable queries; see SURVEY §2.16.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from team_02_spark.queries.registry import query
from team_02_spark.queries._util import t


@query(
    "q_interval_coverage_salted",
    oracle="""
    WITH iv AS (
      SELECT l_suppkey AS supp, CAST(l_shipdate AS DATE) AS s,
             CAST(l_shipdate AS DATE)
               + CAST(1 + CAST(l_quantity AS BIGINT) % 20 AS INTEGER) AS e
      FROM lineitem
    ),
    marked AS (
      SELECT supp, s, e,
             MAX(e) OVER (PARTITION BY supp ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pmax
      FROM iv
    ),
    isl AS (
      SELECT supp, s, e,
             CAST(SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
               OVER (PARTITION BY supp ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS island
      FROM marked
    ),
    per_isl AS (
      SELECT supp, island, date_diff('day', MIN(s), MAX(e)) AS len_days
      FROM isl GROUP BY supp, island
    )
    SELECT supp, CAST(COUNT(*) AS INT) AS n_islands,
           CAST(SUM(len_days) AS BIGINT) AS covered_days
    FROM per_isl GROUP BY supp
    """,
)
def q_interval_coverage_salted(spark, sf_dir):
    """q_interval_coverage's answer through the HOT-KEY-SAFE path:
    the same shipping-transit intervals, converted to integer day
    indices, run through `interval_union_salted` (clip at 45-day
    epoch buckets → per-(supp, bucket) sweep → merge pass) instead of
    the single-per-key sweep. The oracle is deliberately the UNSALTED
    date-axis truth, so the driver hash-check pins the operator's
    core claim — the re-shard is a pure physical rewrite with
    bit-identical semantics — on real data at both SFs, the same
    pattern `q_join_salted` uses for the skew join. bucket_width=45
    ≈ 2× the max interval length (21 days), keeping the clip-explode
    factor under ~1.5. At 100 TB this is the variant you run when one
    key's interval history outgrows an executor (SCALING.md saltint
    probe: 16 M one-key intervals, 26.9 s plain → 4.7 s salted)."""
    from team_02_spark.operators.analytics import interval_union_salted

    li = t(spark, sf_dir, "lineitem")
    s = F.to_date("l_shipdate")
    days = (F.col("l_quantity").cast("bigint") % 20 + 1).cast("int")
    epoch = F.lit("1990-01-01").cast("date")
    iv = li.select(
        F.col("l_suppkey").alias("supp"),
        F.datediff(s, epoch).alias("s"),
        F.datediff(F.date_add(s, days), epoch).alias("e"),
    )
    return interval_union_salted(
        iv, "supp", "s", "e", bucket_width=45
    ).select("supp", "n_islands", F.col("covered").alias("covered_days"))
