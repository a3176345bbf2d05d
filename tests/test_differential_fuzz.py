"""Hypothesis-driven differential fuzzing: randomized predicates and
aggregations run through BOTH engines (Spark and DuckDB) on the same
fixture table must agree exactly. Complements the fixed oracle suite
with generated query shapes (SURVEY §5.2 strategy, extended).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from team_02_spark.sources import load_table
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare

FLAGS = ["A", "N", "R"]
STATUSES = ["F", "O"]


@pytest.fixture(scope="module")
def duck_smoke():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
    )
    yield con
    con.close()


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    qty_lo=st.integers(min_value=0, max_value=50),
    disc_hi=st.floats(min_value=0.0, max_value=0.1).map(lambda x: round(x, 3)),
    flags=st.lists(st.sampled_from(FLAGS), min_size=1, max_size=3, unique=True),
)
def test_fuzzed_filter_count(spark, duck_smoke, qty_lo, disc_hi, flags):
    """Random conjunctive predicates: Spark filter ≡ SQL WHERE."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    got = li.filter(
        (F.col("l_quantity") >= qty_lo)
        & (F.col("l_discount") <= disc_hi)
        & F.col("l_returnflag").isin(*flags)
    ).count()
    flag_list = ", ".join(f"'{f}'" for f in flags)
    want = duck_smoke.execute(
        f"SELECT COUNT(*) FROM lineitem WHERE l_quantity >= {qty_lo} "
        f"AND l_discount <= {disc_hi} AND l_returnflag IN ({flag_list})"
    ).fetchone()[0]
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    group_cols=st.sampled_from(
        [["l_returnflag"], ["l_linestatus"], ["l_returnflag", "l_linestatus"]]
    ),
    status=st.sampled_from(STATUSES),
)
def test_fuzzed_groupby(spark, duck_smoke, group_cols, status):
    """Random group-by shapes with the decimal-sum discipline."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    sdf = (
        li.filter(F.col("l_linestatus") == status)
        .groupBy(*group_cols)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sq"),
        )
    )
    cols = ", ".join(group_cols)
    ddf = duck_smoke.execute(
        f"SELECT {cols}, COUNT(*) AS n, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sq "
        f"FROM lineitem WHERE l_linestatus = '{status}' GROUP BY {cols}"
    ).fetchdf()
    assert not compare(sdf, ddf)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(k=st.integers(min_value=1, max_value=50))
def test_fuzzed_topk(spark, duck_smoke, k):
    """Top-k with deterministic tiebreak at any k."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    sdf = (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(k)
    )
    ddf = duck_smoke.execute(
        "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem "
        f"ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT {k}"
    ).fetchdf()
    assert not compare(sdf, ddf)


@pytest.fixture(scope="module")
def duck_joins():
    con = duckdb.connect()
    for t_ in ("orders", "customer", "lineitem"):
        con.execute(
            f"CREATE VIEW {t_} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t_}.parquet')"
        )
    yield con
    con.close()


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    how=st.sampled_from(["inner", "left", "right", "full"]),
    price_lo=st.integers(min_value=0, max_value=200000),
)
def test_fuzzed_join_shapes(spark, duck_joins, how, price_lo):
    """Random join type × random filter: counts and null-side behavior
    must match the reference SQL engine exactly."""
    orders = load_table(spark, SF_SMOKE, "orders").filter(
        F.col("o_totalprice") >= price_lo
    )
    cust = load_table(spark, SF_SMOKE, "customer")
    got = orders.join(cust, orders.o_custkey == cust.c_custkey, how).select(
        "o_orderkey", "c_custkey"
    )
    sql_how = {"inner": "JOIN", "left": "LEFT JOIN", "right": "RIGHT JOIN",
               "full": "FULL OUTER JOIN"}[how]
    want = duck_joins.execute(
        f"SELECT o.o_orderkey, c.c_custkey FROM "
        f"(SELECT * FROM orders WHERE o_totalprice >= {price_lo}) o "
        f"{sql_how} customer c ON o.o_custkey = c.c_custkey"
    ).fetchdf()
    assert not compare(got, want)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    frame_rows=st.integers(min_value=0, max_value=5),
)
def test_fuzzed_window_frames(spark, duck_joins, frame_rows):
    """Random ROWS-frame width: running decimal sums must match."""
    from pyspark.sql import Window

    orders = load_table(spark, SF_SMOKE, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-frame_rows, 0)
    )
    got = orders.select(
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w)
        .cast("double").alias("s"),
    )
    want = duck_joins.execute(
        "SELECT o_orderkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER ("
        "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        f"ROWS BETWEEN {frame_rows} PRECEDING AND CURRENT ROW) AS DOUBLE) AS s "
        "FROM orders"
    ).fetchdf()
    assert not compare(got, want)


@pytest.fixture(scope="module")
def duck_events():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_SMOKE}/events.parquet')"
    )
    yield con
    con.close()


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    width=st.integers(min_value=1, max_value=5),
    lag_k=st.integers(min_value=1, max_value=3),
)
def test_fuzzed_rolling_features(spark, duck_events, width, lag_k):
    """Random rolling-window widths and lag offsets over the per-user
    ordering (the q_lag_features shape) agree exactly: decimal-exact
    rolling sums, integer lag of event ids."""
    from pyspark.sql import Window

    ev = load_table(spark, SF_SMOKE, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = w.rowsBetween(-(width - 1), Window.currentRow)
    sdf = ev.select(
        "event_id",
        F.lag("event_id", lag_k).over(w).alias("prev_id"),
        F.sum(F.col("value").cast("decimal(18,4)")).over(wr)
        .cast("double").alias("roll_sum"),
    )
    ddf = duck_events.execute(f"""
        SELECT event_id,
               LAG(event_id, {lag_k}) OVER w AS prev_id,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER
                    (w ROWS BETWEEN {width - 1} PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS roll_sum
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """).fetchdf()
    assert not compare(sdf, ddf)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=st.integers(min_value=1, max_value=9).map(lambda i: i / 10.0))
def test_fuzzed_exact_rank_percentile(spark, duck_events, q):
    """Random exact-rank percentiles per group (the q_winsorize bound
    selection): both engines pick the value at rank ceil(q*n) with id
    tie-break — identical rows, identical values."""
    from pyspark.sql import Window

    ev = load_table(spark, SF_SMOKE, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wp = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wp).alias("n"),
    )
    sdf = ranked.groupBy("event_type").agg(
        F.min(
            F.when(
                F.col("rn") == F.greatest(F.lit(1), F.ceil(q * F.col("n"))),
                F.col("value"),
            )
        ).alias("pval")
    )
    ddf = duck_events.execute(f"""
        WITH ranked AS (
            SELECT event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        )
        SELECT event_type,
               MIN(CASE WHEN rn = GREATEST(1, CAST(ceil({q} * n) AS BIGINT))
                        THEN value END) AS pval
        FROM ranked GROUP BY event_type
    """).fetchdf()
    assert not compare(sdf, ddf)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    k=st.integers(min_value=1, max_value=12),
    n_parts=st.sampled_from([1, 3, 16]),
    dup_every=st.sampled_from([0, 3]),
)
def test_fuzzed_knn_bruteforce_matches_numpy(spark, seed, k, n_parts,
                                             dup_every):
    """r13 (the partial-rank cut now sits on the exact brute lane):
    random corpora — including duplicated vectors, which force score
    TIES at every rank — under random physical layouts must reproduce
    a numpy argsort reference exactly. Complements the fixed DuckDB
    oracle with generated inputs and adversarial partitioning."""
    import numpy as np

    from team_02_spark.operators.similarity import knn_bruteforce

    rng = np.random.default_rng(seed)
    n = int(rng.integers(k, 40))
    vecs = rng.normal(size=(n, 8)).astype(np.float64)
    if dup_every:
        for i in range(0, n, dup_every):
            vecs[i] = vecs[0]  # exact clones -> tied scores
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(n_parts)
    queries = spark.createDataFrame(
        [(100, [float(x) for x in vecs[0]])], "q_id long, q_vec array<double>"
    )
    got = sorted(
        (r["q_id"], r["vec_id"], r["rank"])
        for r in knn_bruteforce(queries, corpus, k, c_vec="embedding",
                                round_decimals=6).collect()
    )
    # numpy reference: cosine rounded to 6dp, rank by (-score, id)
    q = vecs[0]
    cos = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    cos = np.round(cos, 6)
    order = sorted(range(n), key=lambda i: (-cos[i], i))[:k]
    want = sorted((100, i, r + 1) for r, i in enumerate(order))
    assert got == want
