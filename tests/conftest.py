from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from team_02_spark import get_spark

    s = get_spark("team_02_spark-tests", shuffle_partitions=8)
    yield s
    # Session-teardown warehouse maintenance (r7 verdict #8): reap
    # stale per-app bucketed-table dirs HERE, never inside a query.
    from team_02_spark.operators.scale import reap_bucketed_tables

    reap_bucketed_tables(s)
    s.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the fixture tables registered as views —
    mirrors the driver's oracle setup."""
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/{name}.parquet')"
        )
    yield con
    con.close()
