"""Invariant tests for the statistical audit lanes
(`queries/stats_queries.py`) — algebraic properties the oracles can't
express: bounds, reconstruction identities, and cross-lane
consistency. The exact-value gate is tests/test_oracle.py; these pin
semantics that must survive refactors.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from team_02_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _q(spark, name):
    return QUERIES[name].fn(spark, SF_SMOKE)


def test_gaps_islands_reconstruction(spark):
    """Σ island lengths == active-day count; longest streak is a
    length, so it is bounded by both; island count never exceeds the
    active-day count."""
    rows = _q(spark, "q_gaps_islands").collect()
    assert rows
    for r in rows:
        assert 1 <= r.longest_streak <= r.n_active_days
        assert 1 <= r.n_islands <= r.n_active_days


def test_gaps_islands_matches_distinct_days(spark):
    from team_02_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    expected = (
        ev.select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    got = _q(spark, "q_gaps_islands").select(
        "user_id", F.col("n_active_days").alias("n")
    )
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_churn_rate_bounds(spark):
    r = _q(spark, "q_churn_rate").collect()[0]
    assert 0 <= r.n_churned <= r.n_prior
    assert 0 <= r.churn_bp <= 10000


def test_benford_partitions_all_orders(spark):
    from team_02_spark.sources import load_table

    rows = _q(spark, "q_benford").collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    n_orders = load_table(spark, SF_SMOKE, "orders").count()
    assert sum(r.n for r in rows) == n_orders


def test_hhi_bounds(spark):
    """HHI in bp lies in (0, 10000]; a 5-segment equal split floors
    at 2000 bp, monopoly at 10000."""
    for r in _q(spark, "q_hhi").collect():
        assert 0 < r.hhi_bp <= 10000
        assert r.n_segments >= 1


def test_bigram_lm_probability_bounds(spark):
    """Fixed-point MLE averages are probabilities: 0 < avg <= 1e9
    (every bigram's count is at least 1 and at most its first-word
    count)."""
    rows = _q(spark, "q_bigram_lm").collect()
    assert rows
    for r in rows:
        assert 0 < r.avg_p_e9 <= 1_000_000_000
        assert r.n_bigrams >= 1


def test_autocorr_in_range(spark):
    for r in _q(spark, "q_autocorr").collect():
        assert r.lag_days in (1, 7)
        assert -1.0 <= r.autocorr <= 1.0
        assert r.n_pairs > 0


def test_rank_corr_in_range_and_monotone_invariant(spark):
    """Spearman lies in [-1, 1]; and because it only consumes ranks,
    it is invariant under any strictly monotone transform of either
    variable — checked by recomputing with spend doubled (rank order
    identical)."""
    base = {r.c_mktsegment: r.spearman for r in _q(spark, "q_rank_corr").collect()}
    assert base and all(-1.0 <= v <= 1.0 for v in base.values())

    from pyspark.sql import Window

    from team_02_spark.sources import load_table

    cust = load_table(spark, SF_SMOKE, "customer")
    orders = load_table(spark, SF_SMOKE, "orders")
    cents = F.expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 2"
    )
    spend = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment", "c_acctbal")
        .agg(F.coalesce(F.sum(cents), F.lit(0)).cast("bigint").alias("s"))
    )
    wx = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wy = Window.partitionBy("c_mktsegment").orderBy("s", "c_custkey")
    ranked = spend.select(
        "c_mktsegment",
        F.row_number().over(wx).alias("rx"),
        F.row_number().over(wy).alias("ry"),
    )
    n = F.count(F.lit(1))
    d2 = F.sum((F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry")))
    sp = F.round(
        F.lit(1.0) - (6 * d2).cast("double") / (n * (n * n - 1)), 6
    )
    doubled = {
        r.c_mktsegment: r.sp
        for r in ranked.groupBy("c_mktsegment").agg(sp.alias("sp")).collect()
    }
    assert doubled == base


def test_chi_square_margins(spark):
    """Observed cells sum to the table total; expected cells sum to
    the total too (within float slack); contributions are
    non-negative."""
    rows = _q(spark, "q_chi_square").collect()
    total = sum(r.observed for r in rows)
    assert abs(sum(r.expected for r in rows) - total) < 1e-3
    assert all(r.contrib >= 0 for r in rows)


def test_mode_per_key_is_argmax(spark):
    from team_02_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    counted = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    maxes = counted.groupBy("user_id").agg(F.max("n").alias("mx"))
    got = _q(spark, "q_mode_per_key")
    joined = got.join(maxes, "user_id")
    assert joined.filter(F.col("n") != F.col("mx")).count() == 0
    assert got.count() == got.select("user_id").distinct().count()


def test_twap_within_value_range(spark):
    """A time-weighted average is a convex combination of observed
    values, so it lies inside the per-type [min, max]·1e4 envelope."""
    from team_02_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    env = ev.groupBy("event_type").agg(
        F.expr("MIN(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT))").alias("lo"),
        F.expr("MAX(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT))").alias("hi"),
    )
    joined = _q(spark, "q_twap").join(env, "event_type")
    # floor-DIV can undershoot the true mean by <1 unit — allow it
    bad = joined.filter(
        (F.col("twap_x10000") < F.col("lo") - 1)
        | (F.col("twap_x10000") > F.col("hi"))
    )
    assert bad.count() == 0


def test_heaps_law_count_identities(spark):
    rows = _q(spark, "q_heaps_law").collect()
    assert rows
    for r in rows:
        assert r.n_hapax <= r.n_vocab <= r.n_tokens
        assert 0 <= r.hapax_bp <= 10000


def test_new_vs_returning_totals_match_dau(spark):
    from team_02_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    dau = (
        ev.select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
        .groupBy("d")
        .agg(F.count("*").alias("n"))
    )
    got = _q(spark, "q_new_vs_returning").select(
        "d", (F.col("n_new") + F.col("n_returning")).alias("n")
    )
    assert got.exceptAll(dau).count() == 0
    assert dau.exceptAll(got).count() == 0
    # every user is new exactly once across the whole range
    total_new = _q(spark, "q_new_vs_returning").agg(
        F.sum("n_new").alias("s")
    ).collect()[0].s
    assert total_new == ev.select("user_id").distinct().count()


def test_fuzzy_join_pairs_are_canonical_and_blocked(spark):
    rows = _q(spark, "q_fuzzy_join").collect()
    assert rows  # threshold chosen to be non-degenerate on fixtures
    for r in rows:
        assert r.name_a < r.name_b
        assert r.dist <= 4
        assert r.name_a.split(" ")[0] == r.name_b.split(" ")[0]


def test_readability_counts_consistent(spark):
    rows = _q(spark, "q_readability").collect()
    assert rows
    for r in rows[:50]:
        assert r.n_sent >= 0 and r.n_words >= 0
        if r.n_sent and r.n_words:
            assert r.words_per_sent_x100 >= 100  # a sentence has >= 1 word


def test_funnel_timing_percentiles_ordered(spark):
    r = _q(spark, "q_funnel_timing").collect()[0]
    assert r.n_converted > 0
    assert 0 <= r.p50_s <= r.p90_s <= r.max_s


def test_funnel_timing_consistent_with_funnel_counts(spark):
    """Converter count can't exceed q_funnel's signup-then-purchase
    upper bound (q_funnel requires signup<click<purchase; timing only
    signup<purchase, so timing's n is >= the full-funnel count)."""
    n_timing = _q(spark, "q_funnel_timing").collect()[0].n_converted
    funnel = _q(spark, "q_funnel").collect()[0]
    assert n_timing >= funnel.n_full_funnel
    assert n_timing <= funnel.n_signup


def test_activity_heatmap_covers_all_events(spark):
    from team_02_spark.sources import load_table

    rows = _q(spark, "q_activity_heatmap").collect()
    assert all(1 <= r.dow <= 7 and 0 <= r.hr <= 23 for r in rows)
    n_events = load_table(spark, SF_SMOKE, "events").count()
    assert sum(r.n for r in rows) == n_events


def test_lorenz_deciles_monotone_convex(spark):
    """A Lorenz curve is nondecreasing, ends at exactly 10000 bp, and
    decile totals are nondecreasing in decile rank (ascending-spend
    tiling)."""
    rows = sorted(_q(spark, "q_lorenz_deciles").collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    shares = [r.cum_share_bp for r in rows]
    assert shares == sorted(shares)
    assert shares[-1] == 10000
    cents = [r.decile_cents for r in rows]
    assert cents == sorted(cents)


def test_rolling_wau_dominates_dau(spark):
    """WAU(d) >= DAU(d) for every day, and equals DAU on the first
    observed day only if no earlier activity exists (trivially true);
    also WAU never exceeds the total user population."""
    from team_02_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    dau = (
        ev.select(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias(
                "day_num"
            ),
            "user_id",
        )
        .distinct()
        .groupBy("day_num")
        .agg(F.count("*").alias("dau"))
    )
    wau = _q(spark, "q_rolling_wau")
    joined = wau.join(dau, "day_num", "left").fillna(0, ["dau"])
    assert joined.filter(F.col("wau") < F.col("dau")).count() == 0
    n_users = ev.select("user_id").distinct().count()
    assert wau.filter(F.col("wau") > n_users).count() == 0


def test_id_gaps_bucketed_equals_global(spark):
    """The bucket-parallel gap plan must produce EXACTLY the naive
    global-lead gaps, and the gap ranges must re-sum to the missing-id
    count."""
    from team_02_spark.sources import load_table
    from pyspark.sql import Window as W

    li = load_table(spark, SF_SMOKE, "lineitem")
    keys = li.select(F.col("l_orderkey").alias("k")).distinct()
    naive = (
        keys.withColumn("nxt", F.lead("k").over(W.orderBy("k")))
        .filter(F.col("nxt") - F.col("k") > 1)
        .select(
            (F.col("k") + 1).alias("gap_start"),
            (F.col("nxt") - F.col("k") - 1).cast("bigint").alias("gap_len"),
        )
    )
    got = _q(spark, "q_id_gaps")
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0
    stats = keys.agg(
        F.max("k").alias("mx"), F.min("k").alias("mn"), F.count("*").alias("n")
    ).collect()[0]
    missing = (stats.mx - stats.mn + 1) - stats.n
    total_gap = got.agg(F.coalesce(F.sum("gap_len"), F.lit(0)).alias("s")).collect()[0].s
    assert total_gap == missing


def test_peaks_are_strict_local_maxima(spark):
    rows = _q(spark, "q_peaks").count()
    assert rows > 0
    # a strict peak and its neighbor cannot both be peaks: days are
    # unique and sorted, so consecutive peak days differ by >= 2 in
    # the dense part of the calendar
    days = sorted(r.day for r in _q(spark, "q_peaks").collect())
    assert len(days) == len(set(days))


def test_max_drawdown_nonnegative_and_bounded(spark):
    r = _q(spark, "q_max_drawdown").collect()[0]
    assert r.max_drawdown_cents >= 0
    assert r.n_days > 0


def test_growth_accounting_rebuilds_dau_and_conserves_users(spark):
    from team_02_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    active = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).alias("d"),
    ).distinct()
    dau = active.groupBy(F.col("d").alias("day_num")).agg(
        F.count("*").alias("dau")
    )
    got = _q(spark, "q_growth_accounting")
    joined = got.join(dau, "day_num")
    # new + retained + resurrected == DAU, every day
    bad = joined.filter(
        F.col("n_new") + F.col("n_retained") + F.col("n_resurrected")
        != F.col("dau")
    )
    assert bad.count() == 0
    # flow conservation vs yesterday: retained + churned_from_prev ==
    # DAU(d-1) for every day that has a predecessor
    prev = dau.select((F.col("day_num") + 1).alias("day_num"),
                      F.col("dau").alias("dau_prev"))
    flow = got.join(prev, "day_num")
    bad2 = flow.filter(
        F.col("n_retained") + F.col("n_churned_from_prev")
        != F.col("dau_prev")
    )
    assert bad2.count() == 0


def test_same_day_orders_all_multiple(spark):
    rows = _q(spark, "q_same_day_orders").collect()
    assert rows
    assert all(r.n_orders >= 2 for r in rows)


def test_price_spread_ordered(spark):
    bad = _q(spark, "q_price_spread").filter(
        F.col("min_unit_x10000") > F.col("max_unit_x10000")
    )
    assert bad.count() == 0


def test_assoc_rules_consistent_with_market_basket(spark):
    """Confidence is a probability (<= 10000 bp) and every rule's
    support pair must appear in q_market_basket's support >= 2 set."""
    rules = _q(spark, "q_assoc_rules")
    assert rules.filter(
        (F.col("conf_x_to_y_bp") <= 0) | (F.col("conf_x_to_y_bp") > 10000)
    ).count() == 0
    assert rules.filter(F.col("lift_x10000") <= 0).count() == 0
    basket = _q(spark, "q_market_basket")
    bcols = basket.columns
    pair_cols = [c for c in bcols if "part" in c or c in ("x", "y")][:2]
    pairs = basket.select(
        F.col(pair_cols[0]).alias("x"), F.col(pair_cols[1]).alias("y")
    )
    missing = rules.select("x", "y").exceptAll(pairs)
    assert missing.count() == 0


def test_mix_shift_shares_bounded(spark):
    rows = _q(spark, "q_mix_shift").collect()
    assert rows
    for r in rows:
        assert 0 <= r.share_bp <= 10000
        assert -10000 <= r.delta_bp <= 10000


def test_group_median_is_true_median(spark):
    """Rank-selected median equals numpy's lower median of the sorted
    group values."""
    import numpy as np

    from team_02_spark.sources import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    got = {r.l_returnflag: (r.n, r.median_qty)
           for r in _q(spark, "q_group_median").collect()}
    for flag, (n, med) in got.items():
        vals = np.sort(np.array([
            r.l_quantity for r in
            li.filter(F.col("l_returnflag") == flag).collect()
        ]))
        assert len(vals) == n
        assert med == vals[(n + 1) // 2 - 1]


def test_rank_movers_rank_validity(spark):
    """Ranks are a permutation 1..k within each week; deltas bounded
    by the week's rank range."""
    got = _q(spark, "q_rank_movers")
    per_week = got.groupBy("week").agg(
        F.count("*").alias("c"),
        F.count_distinct("rnk").alias("d"),
        F.max("rnk").alias("mx"),
    )
    assert per_week.filter(F.col("c") != F.col("d")).count() == 0
    assert got.filter(F.abs(F.col("delta")) >= F.lit(10**6)).count() == 0


def test_skyline_equals_naive_dominance(spark):
    """The sort + running-min frontier must equal the all-pairs
    dominance anti-join exactly (and be non-empty: a minimum always
    exists)."""
    from team_02_spark.sources import load_table

    part = load_table(spark, SF_SMOKE, "part")
    pts = part.select(
        "p_partkey",
        F.expr(
            "CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("price_cents"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    dominated = (
        b.join(
            a,
            (F.col("a.price_cents") <= F.col("b.price_cents"))
            & (F.col("a.size") <= F.col("b.size"))
            & (
                (F.col("a.price_cents") < F.col("b.price_cents"))
                | (F.col("a.size") < F.col("b.size"))
            ),
            "left_semi",
        )
        .select("p_partkey")
    )
    naive = pts.join(dominated, "p_partkey", "left_anti").select(
        "p_partkey", "price_cents", "size"
    )
    got = _q(spark, "q_skyline")
    assert got.count() > 0
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_decile_lift_identities(spark):
    """Cumulative capture ends at exactly 10000 bp and is monotone;
    decile sizes partition the corpus; Σ(n_pos·lift-weight) identity:
    the size-weighted mean lift is ~1 (10000 x1e4) up to floor-DIV."""
    rows = sorted(_q(spark, "q_decile_lift").collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    caps = [r.cum_capture_bp for r in rows]
    assert caps == sorted(caps) and caps[-1] == 10000
    from team_02_spark.sources import load_table

    n_events = load_table(spark, SF_SMOKE, "events").count()
    assert sum(r.n for r in rows) == n_events


def test_conversion_horizons_monotone(spark):
    r = _q(spark, "q_conversion_horizons").collect()[0]
    assert 0 <= r.within_1h_bp <= r.within_1d_bp <= r.within_7d_bp <= 10000
    assert r.n_converted <= r.n_signup
    # consistency with funnel timing's converter count
    assert r.n_converted == _q(spark, "q_funnel_timing").collect()[0].n_converted
