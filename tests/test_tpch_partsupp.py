"""Derivation invariants for the synthesized partsupp dimension
(queries/tpch_partsupp.py). The four Q2/Q9/Q11/Q20 keys themselves
are oracle-proven by tests/test_oracle.py; these pin the table's
structural contract — the things an oracle match at one SF can't
see breaking at another."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from team_02_spark.queries.tpch_partsupp import derived_partsupp

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ps(spark):
    return derived_partsupp(spark, SF_DIR).cache()


def test_partsupp_four_distinct_suppliers_per_part(spark, ps):
    from team_02_spark.sources import load_table

    n_parts = load_table(spark, SF_DIR, "part").count()
    assert ps.count() == 4 * n_parts
    # primary key holds: the constant S DIV 4 stride never collides
    assert ps.select("ps_partkey", "ps_suppkey").distinct().count() \
        == 4 * n_parts
    per_part = ps.groupBy("ps_partkey").agg(
        F.countDistinct("ps_suppkey").alias("n")
    )
    assert per_part.filter(F.col("n") != 4).count() == 0


def test_partsupp_foreign_keys_and_ranges(spark, ps):
    from team_02_spark.sources import load_table

    s = load_table(spark, SF_DIR, "supplier")
    n_s = s.count()
    bad = ps.filter(
        (F.col("ps_suppkey") < 0) | (F.col("ps_suppkey") >= n_s)
        | (F.col("ps_availqty") < 1) | (F.col("ps_availqty") > 9999)
        | (F.col("ps_supplycost_cents") < 100)
        | (F.col("ps_supplycost_cents") >= 20100)
    )
    assert bad.count() == 0
    # every suppkey resolves to a real supplier row
    orphans = ps.join(
        s, ps.ps_suppkey == s.s_suppkey, "left_anti"
    )
    assert orphans.count() == 0


def test_partsupp_cost_is_exact_cents_division(ps):
    # ps_supplycost must be the IEEE division of the cents twin — the
    # bit-identical-across-engines contract every money compare
    # relies on
    diverged = ps.filter(
        F.col("ps_supplycost")
        != F.col("ps_supplycost_cents").cast("double") / 100.0
    )
    assert diverged.count() == 0


def test_partsupp_derivation_is_shuffle_free(spark):
    # a dimension build must stay a narrow map over the part scan: the
    # only exchange is the 1-row supplier-count broadcast
    plan = derived_partsupp(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastExchange" in plan
