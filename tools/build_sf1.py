"""Build a deterministic sf1-scale fixture set by 10x-upsampling the
sf0.1 tables (r9 verdict #3: "one sf1 scaling bench of the headline
set" — the driver's TESTDATA ships sf0.001/0.01/0.1 only, so the
scaling decade is manufactured, not downloaded).

Upsample contract — referentially coherent, distribution-preserving:
each scaled table is 10 copies of its sf0.1 self with every PRIMARY
key offset per copy AND every FOREIGN key offset by the same rule, so
join fan-outs, group cardinalities-per-key, and selectivities match
what a real sf1 would give (key spaces grow 10x; per-key row counts
stay constant — the TPC-H scaling model). region/nation are fixed
dimensions and are copied as-is. events keep their user population
(user_id untouched): per-user history deepens 10x, which is the
harsher direction for the window/session lanes and matches how an
event log actually grows; event_ids stay unique via the offset.
embeddings replicate under fresh vec_ids (vector VALUES repeat — fine
for throughput lanes; recall-style lanes are probed separately).

Determinism: pure column arithmetic on fixed inputs — same output
every run, no RNG anywhere.

Usage:  python tools/build_sf1.py [out_dir]   (default /tmp/sf1_up)
Then:   SPARK_GRAFT_SF_DIR=/tmp/sf1_up python bench.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
COPIES = 10

# (table, [key columns to offset], per-copy offset stride). Strides are
# >= the sf0.1 key-space width so copies never collide.
PLAN = {
    "customer": {"c_custkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "part": {"p_partkey": 100_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 100_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 100_000,
                 "l_suppkey": 10_000},
    "events": {"event_id": 100_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
FIXED = ("region", "nation")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_up"
    from pyspark.sql import functions as F

    from team_02_spark import get_spark

    spark = get_spark("build-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    for t in FIXED:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(os.path.join(SRC, f"{t}.parquet"), dst)
    for t, offsets in PLAN.items():
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        base = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        # sanity: strides clear the actual key space
        for col, stride in offsets.items():
            mx = base.agg(F.max(col)).first()[0]
            assert mx < stride, (t, col, mx, stride)
        copies = [base]
        for i in range(1, COPIES):
            c = base
            for col, stride in offsets.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * stride))
            copies.append(c)
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.repartition(64).write.mode("overwrite").parquet(dst)
        print(f"{t}: {df.count()} rows -> {dst}")
    print(f"sf1 upsample complete at {out}")
    spark.stop()


if __name__ == "__main__":
    main()
