"""Best-of-2 sf1 re-measurement of the two >=10x decade keys, with
per-run shuffle-spill evidence (r10 verdict "what's wrong" #3: the
single-run decade attributed q_triangles' 1.46x per-triangle excess
to spill "consistent with" noise — an attribution, not a measurement;
this turns it into one).

For each key (q_pq_search, q_triangles) this runs the query twice at
sf1 and, per run, reads the live UI REST API (localhost:4040 — local
loopback, no external network) to sum memoryBytesSpilled /
diskBytesSpilled over exactly the stages that run contributed. Output
is one JSON line per key:

    {"key": ..., "runs_sec": [a, b], "best_sec": min,
     "mem_spill_bytes": [...], "disk_spill_bytes": [...]}

Usage:  SPARK_GRAFT_DRIVER_MEM=24g python tools/decade_recheck.py \
            [sf_dir=/tmp/sf1_up]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = ("q_pq_search", "q_triangles")


def _ui_json(ui: str, path: str):
    with urllib.request.urlopen(ui + path, timeout=10) as resp:
        return json.load(resp)


def _stage_spills(ui: str, app_id: str) -> dict[int, tuple[int, int]]:
    """stageId -> (memoryBytesSpilled, diskBytesSpilled), completed
    attempts only; retried stages keep the max attempt's numbers."""
    out: dict[int, tuple[int, int]] = {}
    for st in _ui_json(ui, f"/api/v1/applications/{app_id}/stages"):
        if st.get("status") not in ("COMPLETE", "FAILED"):
            continue
        sid = st["stageId"]
        pair = (st.get("memoryBytesSpilled", 0), st.get("diskBytesSpilled", 0))
        if sid not in out or pair > out[sid]:
            out[sid] = pair
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_up"
    from team_02_spark import get_spark
    from team_02_spark.queries import QUERIES

    spark = get_spark("decade-recheck")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    # same warmup discipline as bench.py: page cache + JVM/codegen
    from team_02_spark.sources import TABLES, load_table

    for name in TABLES:
        load_table(spark, sf_dir, name).write.format("noop").mode(
            "overwrite").save()
    QUERIES["q_topk"].fn(spark, sf_dir).collect()

    results = []
    for key in KEYS:
        runs, mem_sp, disk_sp = [], [], []
        for _ in range(2):
            before = _stage_spills(ui, app_id)
            t0 = time.monotonic()
            QUERIES[key].fn(spark, sf_dir).collect()
            runs.append(round(time.monotonic() - t0, 2))
            time.sleep(1.0)  # let the listener bus drain stage updates
            after = _stage_spills(ui, app_id)
            new = {sid: v for sid, v in after.items()
                   if sid not in before or v > before[sid]}
            mem_sp.append(sum(v[0] for v in new.values()))
            disk_sp.append(sum(v[1] for v in new.values()))
            spark.catalog.clearCache()
        rec = {"key": key, "sf_dir": sf_dir, "runs_sec": runs,
               "best_sec": min(runs),
               "mem_spill_bytes": mem_sp, "disk_spill_bytes": disk_sp}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    from team_02_spark.operators.scale import reap_bucketed_tables

    reap_bucketed_tables(spark)
    spark.stop()


if __name__ == "__main__":
    main()
