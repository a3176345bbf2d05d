"""Tests for the explicit scale strategies: salted joins preserve
equi-join semantics while spreading hot keys; bucketed tables join
with zero shuffles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from team_02_spark.operators.scale import co_located_join, salted_join, write_bucketed
from team_02_spark.plans import shuffle_count
from team_02_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_salted_join_matches_plain_join(spark):
    orders = load_table(spark, SF_SMOKE, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    cust = load_table(spark, SF_SMOKE, "customer")
    plain = orders.join(cust, "c_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, cust, "c_custkey").select("o_orderkey", "c_name")
    assert plain.count() == salted.count()
    assert plain.subtract(salted).count() == 0
    assert salted.subtract(plain).count() == 0


def test_salted_join_spreads_hot_key(spark):
    # one pathological key with 10k rows + normal keys
    hot = spark.range(10000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(100).select((F.col("id") + 2).alias("k"), F.col("id").alias("v"))
    fact = hot.unionByName(cold)
    dim = spark.range(200).select(F.col("id").alias("k"), (F.col("id") * 10).alias("d"))
    out = salted_join(fact, dim, "k", salt_buckets=8)
    assert out.count() == 10000 + 100  # hot k=1 plus all 100 cold keys match
    # the salt column spread the hot key across multiple values
    spread = (
        fact.withColumn(
            "__salt",
            F.pmod(F.xxhash64(F.col("k"), F.spark_partition_id()), F.lit(8)).cast("int"),
        )
        .filter(F.col("k") == 1)
        .select("__salt").distinct().count()
    )
    assert spread > 1


def test_bucketed_join_no_shuffle(spark):
    # warehouse dir is a static conf — the session factory leaves it at
    # ./spark-warehouse (gitignored); tables are dropped in finally
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity").withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(orders, "b_orders", "o_orderkey", num_buckets=8, sort_by="o_orderkey")
    write_bucketed(li, "b_lineitem", "o_orderkey", num_buckets=8, sort_by="o_orderkey")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = co_located_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        n_shuffles = shuffle_count(joined)
        assert n_shuffles == 0, f"bucketed join still shuffles ({n_shuffles})"
        # and it is still correct
        plain = orders.join(li, "o_orderkey")
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_rejects_outer_how(spark):
    """right/full_outer would emit unmatched dim rows once per salt
    replica — the operator must refuse them (ADVICE r1)."""
    import pytest

    fact = spark.createDataFrame([(1, "a")], "k long, v string")
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k long, d string")
    for bad in ("right", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            salted_join(fact, dim, "k", how=bad)
    # left still works and keeps unmatched FACT rows exactly once
    fact2 = spark.createDataFrame([(1, "a"), (9, "z")], "k long, v string")
    out = salted_join(fact2, dim, "k", how="left")
    assert out.count() == 2
