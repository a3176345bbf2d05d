"""Scaling probe: measures the two scaling dimensions that predict
100 TB behavior from local runs —

  data scaling:  fixed cores, corpus replicated 1x/4x/16x -> runtime
                 should grow near-linearly (no quadratic pair blowup
                 in dedup, no driver bottleneck)
  core scaling:  fixed corpus, local[2/8/32] -> runtime should shrink
                 with cores (no serialization point)

Usage (one JSON line per invocation):
    python tools/scaling_probe.py data  <replication>
    python tools/scaling_probe.py cores <n_cores>

Results are recorded in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(spark, replication: int) -> str:
    """Replicate the sf0.1 documents table with distinct doc_ids."""
    from pyspark.sql import functions as F

    out = os.path.join(tempfile.gettempdir(), f"scaling_docs_{replication}x")
    if not os.path.exists(out):
        base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        n = base.count()
        copies = [
            base.select(
                (F.col("doc_id") + F.lit(i * n)).alias("doc_id"), "text", "lang"
            )
            for i in range(replication)
        ]
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.repartition(32).write.mode("overwrite").parquet(out)
    return out


def workload(spark, path: str) -> dict[str, float]:
    """The two scale-sensitive lanes: MinHash near-dedup (pairwise
    candidate discovery) and token frequency (explode + agg)."""
    from pyspark.sql import functions as F

    from team_02_spark.functions.text import clean_tokens
    from team_02_spark.operators.dedup import near_dedup_minhash

    docs = spark.read.parquet(path)
    docs.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    near_dedup_minhash(docs.select("doc_id", "text"), threshold=0.6).write.format(
        "noop"
    ).mode("overwrite").save()
    dedup_s = time.perf_counter() - t0
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    (
        docs.select(F.explode(clean_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(20)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    tok_s = time.perf_counter() - t0
    return {"dedup_sec": round(dedup_s, 2), "token_topk_sec": round(tok_s, 2)}


def main() -> None:
    mode, arg = sys.argv[1], int(sys.argv[2])
    from team_02_spark import get_spark

    if mode == "data":
        spark = get_spark(f"scaling-data-{arg}x")
        spark.sparkContext.setLogLevel("ERROR")
        path = build_corpus(spark, arg)
        n = spark.read.parquet(path).count()
        res = {"mode": "data", "replication": arg, "n_docs": n, "cores": 32}
    else:
        spark = get_spark(f"scaling-cores-{arg}", master=f"local[{arg}]")
        spark.sparkContext.setLogLevel("ERROR")
        path = build_corpus(spark, 16)
        n = spark.read.parquet(path).count()
        res = {"mode": "cores", "cores": arg, "n_docs": n}
    res.update(workload(spark, path))
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
