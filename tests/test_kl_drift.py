"""Fixed-point ln / KL-drift lane properties (no Spark needed for the
arithmetic golden: the oracle's integer chain runs in DuckDB and is
identical to the Spark text by construction)."""

from __future__ import annotations

import math

import duckdb

from team_02_spark.queries.mlmetrics import _ln_chain


def test_fixed_point_ln_matches_math_log():
    """The e9 fixed-point ln chain (binary range reduction + atanh
    series) agrees with math.log to ~1e-8 over five decades — the
    bound that makes the 6dp KL exit safe."""
    con = duckdb.connect()
    vals = list(range(1, 300)) + [10**3, 10**4 + 7, 10**6, 5 * 10**7,
                                  10**9, 9 * 10**9]
    con.execute(
        "CREATE TABLE counts AS SELECT * FROM (VALUES "
        + ", ".join(f"({v}::BIGINT)" for v in vals) + ") t(np)"
    )
    frag, fin = _ln_chain("counts", ["np"], "c", duck=True)
    rows = con.execute(
        f"WITH {frag} SELECT np, np_l FROM {fin}"
    ).fetchall()
    assert len(rows) == len(vals)
    for c, l_e9 in rows:
        assert abs(l_e9 / 1e9 - math.log(c)) < 2e-8, (c, l_e9)


def test_kl_lane_properties(spark):
    """Gibbs: both divergences non-negative; smoothed supports make
    them finite; the totals are the two half-corpus token counts."""
    from team_02_spark.queries import QUERIES
    from tests.conftest import SF_SMOKE

    row = QUERIES["q_kl_drift"].fn(spark, SF_SMOKE).collect()[0]
    assert row["kl_pq"] >= 0.0 and row["kl_qp"] >= 0.0
    assert row["tot_p"] > 0 and row["tot_q"] > 0
    assert row["n_vocab"] > 0
