"""Custom stateful operator tests: applyInPandasWithState streaming
form must converge to the same per-user lifetime stats as the batch
applyInPandas form (state folded incrementally across micro-batches ≡
one-shot fold).
"""

from __future__ import annotations

import pandas as pd

from team_02_spark.sources import load_table
from team_02_spark.streaming.stateful import running_user_stats
from team_02_spark.streaming.windows import read_events_stream
from tests.conftest import SF_SMOKE


def test_batch_stats_exact(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    out = running_user_stats(ev).toPandas().set_index("user_id")
    # cross-check one user against a direct pandas computation
    raw = ev.toPandas()
    uid = int(raw["user_id"].iloc[0])
    mine = raw[raw["user_id"] == uid].sort_values("ts")
    assert out.loc[uid, "n_events"] == len(mine)
    assert abs(out.loc[uid, "total_value"] - mine["value"].sum()) < 1e-6
    gaps = mine["ts"].map(lambda t: t.timestamp()).diff().dropna()
    assert abs(out.loc[uid, "max_gap_s"] - (gaps.max() if len(gaps) else 0.0)) < 1e-6


def test_stream_state_converges_to_batch(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    batch = running_user_stats(ev).toPandas().sort_values("user_id").reset_index(drop=True)

    stream_src = read_events_stream(spark, SF_SMOKE)
    updates: list[pd.DataFrame] = []
    q = (
        running_user_stats(stream_src)
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, _id: updates.append(df.toPandas()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert updates
    # last update per user == the batch answer (state converged)
    final = (
        pd.concat(updates)
        .groupby("user_id")
        .last()
        .reset_index()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert len(final) == len(batch)
    for col in ("n_events", "total_value", "max_gap_s"):
        assert (abs(final[col] - batch[col]) < 1e-6).all(), col
