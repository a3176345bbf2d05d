"""Oracle-SQL lint (VERDICT r3 #2): stop driver hash-hazard patterns
from entering the registry, where the rotating ~50-key driver window
would surface them one round at a time.

The authoritative check is type-level, not regex: DESCRIBE each oracle
in DuckDB and reject any output column whose type pandas renders
lossily versus Spark's — HUGEINT/UHUGEINT/UBIGINT become float64
(``5`` -> ``5.0``), DECIMAL becomes ``decimal.Decimal`` objects — the
exact mechanism behind the two CORRECTNESS_r03 red rows
(q_dup_rate_by_source, q_cv_agreement: un-cast ``SUM(CASE ...)``).
Fix is always the same: ``CAST(... AS BIGINT)`` (or exit decimals via
``CAST(... AS DOUBLE)``) on the oracle side, with the matching cast on
the Spark side.

A companion regex check catches the common source pattern early with a
readable message, even before DESCRIBE runs.
"""

from __future__ import annotations

import re

import pytest

from team_02_spark.queries import QUERIES

# DuckDB result types that pandas materializes losslessly AND that the
# Spark side can mirror exactly. Anything else is a typed-hasher risk.
_SAFE_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT",
    "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
}

ORACLE_KEYS = sorted(n for n, s in QUERIES.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def duck_describe():
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for tbl in ("region nation customer supplier part orders lineitem "
                "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{sf}/{tbl}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_output_types_are_hash_safe(duck_describe, name):
    desc = duck_describe.execute(f"DESCRIBE {QUERIES[name].oracle}").fetchall()
    bad = [(col, typ) for col, typ, *_ in desc
           if typ.upper().split("(")[0] not in _SAFE_TYPES]
    assert not bad, (
        f"{name}: oracle output columns with lossy pandas types {bad} — "
        "wrap in CAST(... AS BIGINT) / CAST(... AS DOUBLE) on BOTH sides "
        "(driver hash hazard, see CORRECTNESS_r03 red rows)"
    )


def test_no_uncast_integer_conditional_sums():
    """Source-level early warning: ``SUM(CASE ... THEN <int>`` and
    ``SUM(COALESCE(<int col>`` produce HUGEINT in DuckDB unless
    CAST-wrapped. Sites where the sum only feeds a larger DOUBLE
    expression (so the output column is DOUBLE) are fine — the type
    test above is the authority — but listing them in the allowlist
    keeps this check loud for NEW queries."""
    allow = {
        # sums consumed inside DOUBLE expressions (output is DOUBLE,
        # verified hash-safe by the DESCRIBE test):
        "q_confusion_matrix",    # NULLIF(SUM(CASE)) denominators
        "q_retrieval_metrics",   # SUM(CASE THEN 1.0/...) — double sum
        "q_dup_rate_by_source",  # ROUND'd rate re-states the sum
        "q_cv_agreement",
        "q_vocab_coverage",
        "q_pipeline_yield",
        "q_join_health",
    }
    offenders = []
    for name, spec in QUERIES.items():
        if not spec.oracle or name in allow:
            continue
        sql = re.sub(r"\s+", " ", spec.oracle)
        for m in re.finditer(r"SUM\(\s*(CASE|COALESCE)", sql, re.I):
            pre = sql[max(0, m.start() - 6):m.start()].upper()
            if not pre.endswith("CAST("):
                offenders.append((name, sql[m.start():m.start() + 60]))
    assert not offenders, (
        "un-cast integer conditional sums (DuckDB HUGEINT -> pandas "
        f"float64 -> driver hash mismatch): {offenders}"
    )
