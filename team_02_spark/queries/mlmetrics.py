"""ML evaluation metrics as distributed aggregations — the companions
to the confusion-matrix query (ml/models.py A1): ranking quality (AUC)
and probability calibration.

Ground truth / scores come from the events table (label = "is a
purchase event", score = the event's value column) — the same
label/score shape a model-scoring pipeline produces (ml/scoring.py
U9 writes exactly such columns).

Scale design: AUC is computed WITHOUT a global per-row rank. Scores
are first aggregated per distinct value (one map-side-combined
shuffle); the rank structure is recovered from cumulative counts over
the (much smaller) grouped table — the Mann-Whitney statistic with
exact average-rank tie handling, identical in any engine. A naive
row-level rank() would sort the full corpus; this sorts distinct
scores only.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from team_02_spark.queries.registry import query
from team_02_spark.queries._util import t

_LABEL_SQL = "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"


@query(
    "q_auc",
    oracle=f"""
    WITH scored AS (
      SELECT value AS score, {_LABEL_SQL} AS y FROM events
    ),
    grouped AS (
      SELECT score, COUNT(*) AS n, SUM(y) AS n_pos
      FROM scored GROUP BY score
    ),
    ranked AS (
      SELECT n, n_pos,
             COALESCE(SUM(n) OVER (ORDER BY score
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS cum_before
      FROM grouped
    ),
    stats AS (
      SELECT CAST(SUM(CAST(n_pos * (cum_before + (n + 1) / CAST(2.0 AS DOUBLE))
                           AS DECIMAL(28,4))) AS DOUBLE) AS s_pos,
             SUM(n_pos) AS np, SUM(n - n_pos) AS nn
      FROM ranked
    )
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           (s_pos - np * (np + CAST(1.0 AS DOUBLE)) / CAST(2.0 AS DOUBLE))
             / (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)) AS auc
    FROM stats
    """,
)
def q_auc(spark, sf_dir):
    """ROC AUC via the Mann-Whitney rank-sum statistic with exact
    average-rank tie handling. The only per-row work is one grouped
    count; ranks are reconstructed as cumulative counts over distinct
    scores (average rank of a tie group = rows_before + (n+1)/2), so
    the global sort touches |distinct scores| rows, not the corpus.
    AUC = (S_pos − n_pos(n_pos+1)/2) / (n_pos · n_neg)."""
    ev = t(spark, sf_dir, "events")
    scored = ev.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    grouped = scored.groupBy("score").agg(
        F.count("*").alias("n"), F.sum("y").alias("n_pos")
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    ranked = grouped.select(
        "n",
        "n_pos",
        F.coalesce(F.sum("n").over(w), F.lit(0)).alias("cum_before"),
    )
    avg_rank = F.col("cum_before") + (F.col("n") + 1) / F.lit(2.0)
    stats = ranked.agg(
        F.sum((F.col("n_pos") * avg_rank).cast("decimal(28,4)"))
        .cast("double")
        .alias("s_pos"),
        F.sum("n_pos").alias("np"),
        F.sum(F.col("n") - F.col("n_pos")).alias("nn"),
    )
    return stats.select(
        F.col("np").cast("bigint").alias("n_pos"),
        F.col("nn").cast("bigint").alias("n_neg"),
        (
            (F.col("s_pos") - F.col("np") * (F.col("np") + F.lit(1.0)) / F.lit(2.0))
            / (F.col("np").cast("double") * F.col("nn").cast("double"))
        ).alias("auc"),
    )


@query(
    "q_calibration",
    oracle=f"""
    WITH scored AS (
      SELECT event_id, value AS score, {_LABEL_SQL} AS y FROM events
    ),
    binned AS (
      SELECT y, score,
             NTILE(10) OVER (ORDER BY score, event_id) AS bin
      FROM scored
    )
    SELECT bin,
           COUNT(*) AS n,
           CAST(SUM(CAST(score AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
             AS mean_score,
           CAST(SUM(y) AS DOUBLE) / COUNT(*) AS pos_rate
    FROM binned
    GROUP BY bin
    """,
)
def q_calibration(spark, sf_dir):
    """Calibration / reliability table: scores cut into deciles
    (NTILE with a deterministic (score, event_id) order), per-bin mean
    score vs observed positive rate — the table behind a reliability
    diagram. The NTILE pass is the only global-order operation; at
    corpus scale it becomes approx-quantile bin edges + a map-side
    bin assignment (the percentile lane already provides the edges)."""
    ev = t(spark, sf_dir, "events")
    scored = ev.select(
        "event_id",
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    w = Window.orderBy("score", "event_id")
    return (
        scored.withColumn("bin", F.ntile(10).over(w))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.col("score").cast("decimal(18,4)")).cast("double")
                / F.count("*")
            ).alias("mean_score"),
            (F.sum("y").cast("double") / F.count("*")).alias("pos_rate"),
        )
    )


@query(
    "q_weighted_median",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             l_extendedprice AS v,
             SUM(CAST(l_quantity AS DECIMAL(18,4)))
               OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(CAST(l_quantity AS DECIMAL(18,4)))
               OVER (PARTITION BY l_returnflag) AS tw
      FROM lineitem
    )
    SELECT l_returnflag, MIN(v) AS weighted_median
    FROM c
    WHERE cw >= tw / 2
    GROUP BY l_returnflag
    """,
)
def q_weighted_median(spark, sf_dir):
    """Quantity-weighted median price per return flag: the weighted
    quantile by cumulative weight crossing (first value whose running
    weight reaches half the total). Cumulative and total weights are
    DECIMAL window sums — exact and order-independent, so the crossing
    row cannot flip between engines even under tied prices (the answer
    depends only on which VALUE group crosses, not on intra-tie row
    order).

    Scale shape (same trick as q_auc): weights are PRE-AGGREGATED per
    distinct value (one map-side-combined shuffle), and the cumulative
    window runs over the distinct-value table — the per-group sorted
    set is |distinct prices|, not |lineitem|. The oracle is the
    row-level formulation; collapsing equal values first is exactly
    equivalent for a crossing test."""
    li = t(spark, sf_dir, "lineitem")
    per_value = li.groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("v")
    ).agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("w"))
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("l_returnflag")
    return (
        per_value.select(
            "l_returnflag",
            "v",
            F.sum("w").over(w_cum).alias("cw"),
            F.sum("w").over(w_tot).alias("tw"),
        )
        .filter(F.col("cw") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(F.min("v").alias("weighted_median"))
    )


# --------------------------------------------- round-4: drift monitoring

# Distribution-drift metrics between two corpus snapshots — the
# monitoring every recurring training-data pipeline runs before
# accepting a new crawl/export. Reference window = Jan 1-15, current
# window = Jan 16-30 of the events fixture; the metric pair is the
# standard one (PSI for binned shift magnitude, KS for the max ECDF
# gap).

_REF_PRED = "ts < TIMESTAMP '2024-01-16 00:00:00'"


@query(
    "q_psi_drift",
    oracle=f"""
    WITH binned AS (
        SELECT event_type,
               CAST(FLOOR(value / 50.0) AS INT) AS bin,
               CAST(SUM(CASE WHEN {_REF_PRED} THEN 1 ELSE 0 END)
                    AS BIGINT) AS c_ref,
               CAST(SUM(CASE WHEN {_REF_PRED} THEN 0 ELSE 1 END)
                    AS BIGINT) AS c_cur
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type,
               CAST(SUM(c_ref) AS BIGINT) AS n_ref,
               CAST(SUM(c_cur) AS BIGINT) AS n_cur,
               COUNT(*) AS n_bins
        FROM binned GROUP BY event_type
    )
    SELECT b.event_type, t.n_ref, t.n_cur,
           ROUND(SUM(
               (CAST(b.c_cur + 1 AS DOUBLE) / (t.n_cur + t.n_bins)
                - CAST(b.c_ref + 1 AS DOUBLE) / (t.n_ref + t.n_bins))
               * LN((CAST(b.c_cur + 1 AS DOUBLE) / (t.n_cur + t.n_bins))
                    / (CAST(b.c_ref + 1 AS DOUBLE) / (t.n_ref + t.n_bins)))
           ), 4) AS psi
    FROM binned b JOIN tot t ON b.event_type = t.event_type
    GROUP BY b.event_type, t.n_ref, t.n_cur
    """,
)
def q_psi_drift(spark, sf_dir):
    """Population Stability Index per event_type between the two
    half-month windows: fixed-width value bins (50-unit, anchored at
    0 — deterministic, no data-dependent quantile fit), Laplace +1
    smoothing over the OBSERVED bin set, psi = Σ (p_cur − p_ref) ·
    ln(p_cur/p_ref). One scan, one (type, bin) aggregate (map-side
    combined), a |types|-row totals join back — the per-bin table is
    alphabet-sized, so the whole metric costs one shuffle of bin
    partials regardless of corpus size. 4dp exit past LN ulp."""
    ev = t(spark, sf_dir, "events")
    is_ref = F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp")
    binned = (
        ev.select(
            "event_type",
            F.floor(F.col("value") / 50.0).cast("int").alias("bin"),
            is_ref.alias("is_ref"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
            .cast("bigint").alias("c_ref"),
            F.sum(F.when(F.col("is_ref"), 0).otherwise(1))
            .cast("bigint").alias("c_cur"),
        )
    )
    tot = binned.groupBy("event_type").agg(
        F.sum("c_ref").cast("bigint").alias("n_ref"),
        F.sum("c_cur").cast("bigint").alias("n_cur"),
        F.count("*").alias("n_bins"),
    )
    j = binned.join(tot, "event_type")
    p_cur = (F.col("c_cur") + 1).cast("double") / (F.col("n_cur") + F.col("n_bins"))
    p_ref = (F.col("c_ref") + 1).cast("double") / (F.col("n_ref") + F.col("n_bins"))
    return (
        j.groupBy("event_type", "n_ref", "n_cur")
        .agg(F.round(F.sum((p_cur - p_ref) * F.log(p_cur / p_ref)), 4)
             .alias("psi"))
    )


@query(
    "q_ks_drift",
    oracle=f"""
    WITH per_val AS (
        SELECT event_type, value,
               CAST(SUM(CASE WHEN {_REF_PRED} THEN 1 ELSE 0 END)
                    AS BIGINT) AS c_ref,
               CAST(SUM(CASE WHEN {_REF_PRED} THEN 0 ELSE 1 END)
                    AS BIGINT) AS c_cur
        FROM events GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type,
               SUM(c_ref) OVER (PARTITION BY event_type ORDER BY value
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS a_ref,
               SUM(c_cur) OVER (PARTITION BY event_type ORDER BY value
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS a_cur,
               SUM(c_ref) OVER (PARTITION BY event_type) AS n_ref,
               SUM(c_cur) OVER (PARTITION BY event_type) AS n_cur
        FROM per_val
    )
    SELECT event_type,
           CAST(MAX(n_ref) AS BIGINT) AS n_ref,
           CAST(MAX(n_cur) AS BIGINT) AS n_cur,
           ROUND(MAX(ABS(CAST(a_ref AS DOUBLE) / n_ref
                         - CAST(a_cur AS DOUBLE) / n_cur)), 6) AS ks
    FROM cum GROUP BY event_type
    """,
)
def q_ks_drift(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov statistic per event_type between
    the two half-month windows: D = max over observed values of
    |ECDF_ref − ECDF_cur|. Rows collapse to per-(type, DISTINCT
    value) counts FIRST (one map-side-combined shuffle), the ECDFs
    are cumulative windows over that much smaller table, and ties are
    exact by construction (both ECDFs step at the same grouped value)
    — the same sort-the-distinct-values-not-the-corpus discipline as
    q_auc. Exact division exits ROUND 6.

    Bounded-grid assumption (r10 verdict nit): the per-type window
    sorts the DISTINCT (event_type, value) grid, not the corpus — the
    plan is corpus-size-free only while the value column is quantized
    or otherwise bounded-cardinality (true of the fixtures, and of
    most metric feeds, which quantize at the source). A 100 TB feed
    with a continuous, never-repeating value column would make the
    per-type grid grow with the data and the window sort the pressure
    point; the scale path for that shape is q_ks_drift_binned below —
    fixed-width pre-quantization exactly like q_psi_drift/q_pr_curve,
    with the one-sided error bound D_binned <= D <= D_binned +
    max-bin-mass."""
    ev = t(spark, sf_dir, "events")
    is_ref = F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp")
    per_val = (
        ev.select("event_type", "value", is_ref.alias("is_ref"))
        .groupBy("event_type", "value")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
            .cast("bigint").alias("c_ref"),
            F.sum(F.when(F.col("is_ref"), 0).otherwise(1))
            .cast("bigint").alias("c_cur"),
        )
    )
    w_cum = (
        Window.partitionBy("event_type").orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = per_val.select(
        "event_type",
        F.sum("c_ref").over(w_cum).alias("a_ref"),
        F.sum("c_cur").over(w_cum).alias("a_cur"),
        F.sum("c_ref").over(w_all).alias("n_ref"),
        F.sum("c_cur").over(w_all).alias("n_cur"),
    )
    return cum.groupBy("event_type").agg(
        F.max("n_ref").cast("bigint").alias("n_ref"),
        F.max("n_cur").cast("bigint").alias("n_cur"),
        F.round(
            F.max(F.abs(F.col("a_ref").cast("double") / F.col("n_ref")
                        - F.col("a_cur").cast("double") / F.col("n_cur"))),
            6,
        ).alias("ks"),
    )


@query(
    "q_ks_drift_binned",
    oracle=f"""
    WITH per_bin AS (
        SELECT event_type,
               CAST(FLOOR(value / 5.0) AS INT) AS bin,
               CAST(SUM(CASE WHEN {_REF_PRED} THEN 1 ELSE 0 END)
                    AS BIGINT) AS c_ref,
               CAST(SUM(CASE WHEN {_REF_PRED} THEN 0 ELSE 1 END)
                    AS BIGINT) AS c_cur
        FROM events GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type,
               SUM(c_ref) OVER (PARTITION BY event_type ORDER BY bin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS a_ref,
               SUM(c_cur) OVER (PARTITION BY event_type ORDER BY bin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS a_cur,
               SUM(c_ref) OVER (PARTITION BY event_type) AS n_ref,
               SUM(c_cur) OVER (PARTITION BY event_type) AS n_cur
        FROM per_bin
    )
    SELECT event_type,
           CAST(MAX(n_ref) AS BIGINT) AS n_ref,
           CAST(MAX(n_cur) AS BIGINT) AS n_cur,
           ROUND(MAX(ABS(CAST(a_ref AS DOUBLE) / n_ref
                         - CAST(a_cur AS DOUBLE) / n_cur)), 6) AS ks
    FROM cum GROUP BY event_type
    """,
)
def q_ks_drift_binned(spark, sf_dir):
    """KS drift on a FIXED-WIDTH binned grid (5-unit bins, anchored
    at 0) — the scale path for a continuous, unbounded-cardinality
    value column where q_ks_drift's distinct-value grid would grow
    with the corpus (r10 verdict nit). The per-type window now sorts
    at most range/5 bins regardless of corpus size, the same
    data-independent quantization discipline as q_psi_drift (50-unit)
    and q_pr_curve. The statistic is deterministic (binning is a pure
    function of value, no quantile fit), so the oracle is exact; vs
    the exact D it is one-sided — evaluating the ECDF gap only at bin
    edges can only miss peaks inside a bin, so D_binned <= D <=
    D_binned + max within-bin probability mass (<= 5·density_max)."""
    ev = t(spark, sf_dir, "events")
    is_ref = F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp")
    per_bin = (
        ev.select(
            "event_type",
            F.floor(F.col("value") / 5.0).cast("int").alias("bin"),
            is_ref.alias("is_ref"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
            .cast("bigint").alias("c_ref"),
            F.sum(F.when(F.col("is_ref"), 0).otherwise(1))
            .cast("bigint").alias("c_cur"),
        )
    )
    w_cum = (
        Window.partitionBy("event_type").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = per_bin.select(
        "event_type",
        F.sum("c_ref").over(w_cum).alias("a_ref"),
        F.sum("c_cur").over(w_cum).alias("a_cur"),
        F.sum("c_ref").over(w_all).alias("n_ref"),
        F.sum("c_cur").over(w_all).alias("n_cur"),
    )
    return cum.groupBy("event_type").agg(
        F.max("n_ref").cast("bigint").alias("n_ref"),
        F.max("n_cur").cast("bigint").alias("n_cur"),
        F.round(
            F.max(F.abs(F.col("a_ref").cast("double") / F.col("n_ref")
                        - F.col("a_cur").cast("double") / F.col("n_cur"))),
            6,
        ).alias("ks"),
    )


@query(
    "q_linreg_group",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 AS sx,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
                 AS sy,
               CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(18,4)))
                    AS DOUBLE) AS sxy,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4)))
                    AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(18,4)))
                    AS DOUBLE) AS syy
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                 / n, 6) AS intercept,
           ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s
    """,
)
def q_linreg_group(spark, sf_dir):
    """Per-group ordinary least squares in CLOSED FORM — slope,
    intercept, r² of discount-vs-quantity per return flag — the
    map-side-combinable regression shape: ONE aggregation pass
    collects the five sufficient statistics (Σx, Σy, Σxy, Σx², Σy²)
    and the algebra runs on the group-cardinality result, so a 100 TB
    regression costs exactly what a group-by sum costs (contrast
    MLlib's iterative LinearRegression for this 1-feature case).
    Hash-discipline: every sum exits through DECIMAL(18,4) (operands
    are 2dp×int products, exact at 4dp and < 2^53 scaled, so both
    engines produce the identical double), and the derived ratios
    round to 6dp."""
    li = t(spark, sf_dir, "lineitem")
    dec = "decimal(18,4)"
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("l_quantity").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("l_discount").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("l_quantity") * F.col("l_discount")).cast(dec))
        .cast("double").alias("sxy"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast(dec))
        .cast("double").alias("sxx"),
        F.sum((F.col("l_discount") * F.col("l_discount")).cast(dec))
        .cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


@query(
    "q_pr_curve",
    oracle="""
    WITH scored AS (
        SELECT CAST(FLOOR(value) AS BIGINT) AS bin,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    per_bin AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM scored GROUP BY bin
    ),
    tot AS (SELECT CAST(SUM(pos) AS DOUBLE) AS total_pos FROM per_bin),
    cum AS (
        SELECT bin,
               CAST(SUM(n) OVER (ORDER BY bin DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n_pred,
               CAST(SUM(pos) OVER (ORDER BY bin DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS tp
        FROM per_bin
    )
    SELECT bin, n_pred, tp,
           ROUND(CAST(tp AS DOUBLE) / n_pred, 6) AS precision_at,
           ROUND(CAST(tp AS DOUBLE) / (SELECT total_pos FROM tot), 6)
             AS recall_at
    FROM cum
    """,
)
def q_pr_curve(spark, sf_dir):
    """Precision-recall curve at quantized score thresholds — the
    q_auc/q_ks_drift discipline applied to the PR plane: one grouped
    count collapses the corpus to integer score bins (FLOOR, not
    ROUND — floor of a binary double is engine-exact, round is not),
    cumulative TP/predicted counts run top-down over the BIN-sized
    table (never a corpus sort), and each bin emits the curve point
    for "predict positive at score >= bin". At 100 TB the curve costs
    one shuffle; the quantization is also what you'd plot anyway."""
    ev = t(spark, sf_dir, "events")
    scored = ev.select(
        F.floor("value").cast("bigint").alias("bin"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    per_bin = scored.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    w = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_bin.select(
        "bin",
        F.sum("n").over(w).cast("bigint").alias("n_pred"),
        F.sum("pos").over(w).cast("bigint").alias("tp"),
    )
    total_pos = per_bin.agg(
        F.sum("pos").cast("double").alias("total_pos")
    )
    return cum.crossJoin(F.broadcast(total_pos)).select(
        "bin", "n_pred", "tp",
        F.round(F.col("tp").cast("double") / F.col("n_pred"), 6)
        .alias("precision_at"),
        F.round(F.col("tp").cast("double") / F.col("total_pos"), 6)
        .alias("recall_at"),
    )


# ---------------------------------------------------------------- KL drift

# Fixed-point natural log for the KL lane: L(c) = round-ish(ln(c)*1e9)
# as BIGINT, for integer counts c >= 1, computed with ONLY integer
# multiply / truncating-divide / shift — bit-identical in Spark (DIV,
# shiftleft) and DuckDB (//, <<), unlike libm LN which differs in the
# last ulp. Range reduction c = m * 2^k with m in [1,2) via the binary
# length (length(bin(c)) - 1), then atanh series ln m = 2 * (z + z^3/3
# + ... + z^15/15) with z = (m-1)/(m+1) <= 1/3; truncation error
# ~1e-8 in ln units (validated against math.log over 1..9e9).
# Bound: c * 1e9 must fit BIGINT => c <= 9.2e9 (token counts at any
# realistic shard; re-shard the corpus split if a half ever exceeds it).

_LN2_E9 = 693147181
_E9 = 1_000_000_000


def _ln_chain(src: str, cols: list[str], tag: str, *, duck: bool) -> tuple[str, str]:
    """Emit chained CTEs that add a ``<col>_l`` BIGINT column
    (= ln(col) * 1e9) for every col of ``src``. Returns
    (cte_fragment, final_cte_name). Identical arithmetic in both
    dialects; only the DIV/shift spellings differ."""
    div = "//" if duck else "DIV"

    def shl(k: str) -> str:
        return (f"(CAST(1 AS BIGINT) << {k})" if duck
                else f"shiftleft(CAST(1 AS BIGINT), {k})")

    def sel(exprs: list[str]) -> str:
        return "SELECT *, " + ", ".join(exprs)

    steps = [
        (f"{tag}_k", sel([f"length(bin({c})) - 1 AS {c}_k" for c in cols]), src),
        (f"{tag}_m", sel([
            f"(CAST({c} AS BIGINT) * {_E9}) {div} {shl(f'{c}_k')} AS {c}_m"
            for c in cols]), f"{tag}_k"),
        (f"{tag}_z", sel([
            f"(({c}_m - {_E9}) * {_E9}) {div} ({c}_m + {_E9}) AS {c}_z"
            for c in cols]), f"{tag}_m"),
        (f"{tag}_z2", sel([
            f"({c}_z * {c}_z) {div} {_E9} AS {c}_z2" for c in cols]),
            f"{tag}_z"),
        (f"{tag}_p3", sel([
            f"({c}_z * {c}_z2) {div} {_E9} AS {c}_p3" for c in cols]),
            f"{tag}_z2"),
    ]
    for d in (5, 7, 9, 11, 13, 15):
        steps.append((f"{tag}_p{d}", sel([
            f"({c}_p{d - 2} * {c}_z2) {div} {_E9} AS {c}_p{d}"
            for c in cols]), f"{tag}_p{d - 2}"))
    series = lambda c: " + ".join(  # noqa: E731
        [f"{c}_z"] + [f"({c}_p{d} {div} {d})" for d in (3, 5, 7, 9, 11, 13, 15)]
    )
    steps.append((f"{tag}_l", sel([
        f"CAST({c}_k AS BIGINT) * {_LN2_E9} + 2 * ({series(c)}) AS {c}_l"
        for c in cols]), f"{tag}_p15"))
    frag = ",\n".join(f"{name} AS ({body} FROM {frm})"
                      for name, body, frm in steps)
    return frag, f"{tag}_l"


def _kl_sql(*, duck: bool) -> str:
    """The full q_kl_drift query in either dialect. P = add-1-smoothed
    token distribution of even doc_ids, Q = odd doc_ids, over the
    union vocabulary; KL(P||Q) = S_pq/(N*1e9) + (L(M)-L(N))/1e9 with
    S_pq = sum np*(L(np)-L(mq)) — exact BIGINT until the final
    int->double conversions (correctly rounded identically in both
    engines)."""
    if duck:
        tok = ("SELECT doc_id % 2 AS half, unnest(list_filter("
               "string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS w "
               "FROM documents")
        src = "documents"  # noqa: F841 — dialect marker
    else:
        tok = ("SELECT doc_id % 2 AS half, explode(filter("
               "split(lower(text), '\\\\s+'), x -> x <> '')) AS w "
               "FROM docs_kl_v")
    counts = ("SELECT w, COUNT(*) FILTER (WHERE half = 0) + 1 AS np, "
              "COUNT(*) FILTER (WHERE half = 1) + 1 AS mq "
              "FROM tok GROUP BY w")
    chain1, fin1 = _ln_chain("counts", ["np", "mq"], "c", duck=duck)
    agg = (f"SELECT COUNT(*) AS n_vocab, "
           f"CAST(SUM(np) AS BIGINT) AS tot_p, "
           f"CAST(SUM(mq) AS BIGINT) AS tot_q, "
           f"CAST(SUM(np * (np_l - mq_l)) AS BIGINT) AS s_pq, "
           f"CAST(SUM(mq * (mq_l - np_l)) AS BIGINT) AS s_qp "
           f"FROM {fin1}")
    chain2, fin2 = _ln_chain("agg", ["tot_p", "tot_q"], "g", duck=duck)
    return f"""
    WITH tok AS ({tok}),
    counts AS ({counts}),
    {chain1},
    agg AS ({agg}),
    {chain2}
    SELECT CAST(n_vocab AS BIGINT) AS n_vocab, tot_p, tot_q,
           ROUND(CAST(s_pq AS DOUBLE) / tot_p / 1e9
                 + CAST(tot_q_l - tot_p_l AS DOUBLE) / 1e9, 6) AS kl_pq,
           ROUND(CAST(s_qp AS DOUBLE) / tot_q / 1e9
                 + CAST(tot_p_l - tot_q_l AS DOUBLE) / 1e9, 6) AS kl_qp
    FROM {fin2}
    """


@query("q_kl_drift", oracle=_kl_sql(duck=True))
def q_kl_drift(spark, sf_dir):
    """KL-divergence corpus-drift gate — completes the PSI / KS /
    embedding-centroid drift trio: KL(P||Q) and KL(Q||P) between the
    add-1-smoothed token distributions of two corpus halves (even vs
    odd doc_id — in production, yesterday's shard vs today's).

    Determinism (the reason this lane was deferred until a fixed-point
    ln design existed): ln runs in e9 fixed point over BIGINTs — range
    reduction by binary length, atanh series to z^15 — so both engines
    execute the IDENTICAL integer arithmetic; the only float ops are
    final int->double conversions and two divides, correctly rounded
    the same everywhere (~1e-8 accuracy, validated vs math.log).

    Scale: one token explode + one vocabulary-sized aggregate; the ln
    chain is per-vocabulary-row columnar arithmetic (whole-stage
    codegen, no UDF); the global fold is a 1-row reduce."""
    t(spark, sf_dir, "documents").createOrReplaceTempView("docs_kl_v")
    return spark.sql(_kl_sql(duck=False))
