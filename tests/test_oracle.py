"""Differential tests: every declared query with an oracle must match
DuckDB exactly at the test scale factor — the local twin of the
driver's CORRECTNESS gate. Rows-only queries are smoke-run (must
produce a stable schema and >= 0 rows without error).
"""

from __future__ import annotations

import pytest

from team_02_spark.queries import QUERIES
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare

ORACLE_KEYS = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
ROWS_ONLY_KEYS = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match(spark, duck, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_ORACLE)
    ddf = duck.execute(spec.oracle).fetchdf()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_runs(spark, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_ORACLE)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0
