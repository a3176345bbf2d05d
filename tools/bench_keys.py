"""Per-key bench isolation (r15 optimization round): time a subset of
declared queries with EXACTLY the bench.py methodology (same session
factory, same table+calibration warmup, same noop sink, best-of-N) so
single-lane before/after numbers are comparable to the official bench
without paying for the whole 51-key session.

Usage:
    python tools/bench_keys.py q_triangles q_semdedup [--sf sf0.1]
        [--runs 3] [--explain plans/r15 --tag before]

--explain DIR writes DIR/<key>_<tag>.txt with explain("formatted")
for each key (the judge-checkable plan evidence for this round).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf = "sf0.1"
    runs = 3
    explain_dir = None
    tag = "before"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i:i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]
    if "--explain" in args:
        i = args.index("--explain")
        explain_dir = args[i + 1]
        del args[i:i + 2]
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i:i + 2]
    keys = args
    if not keys:
        print("usage: bench_keys.py <key>... [--sf sfX] [--runs N] "
              "[--explain DIR --tag TAG]", file=sys.stderr)
        return 2

    sf_dir = f"/root/testdata/{sf}"
    from team_02_spark import get_spark
    from team_02_spark.queries import QUERIES
    from team_02_spark.sources import TABLES, load_table

    spark = get_spark("team_02_spark-bench-keys")
    spark.sparkContext.setLogLevel("ERROR")

    # identical warmup to bench.py: every table through the noop sink
    # (JVM + codegen + page cache), then one trivial pandas_udf pass
    for name in TABLES:
        load_table(spark, sf_dir, name).write.format("noop").mode(
            "overwrite").save()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(s):
        return s * 1.0

    spark.range(1024).select(_warm(F.col("id").cast("double"))).write.format(
        "noop").mode("overwrite").save()

    results = {}
    for name in keys:
        if name not in QUERIES:
            print(f"unknown key: {name}", file=sys.stderr)
            return 2
        fn = QUERIES[name].fn
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(explain_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        if runs < 1:  # explain-only mode
            print(f"{name}: explained", flush=True)
            continue
        spark.sparkContext.setJobDescription(f"bench_keys:{name}")
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = samples
        print(f"{name}: best={min(samples):.3f}  samples={samples}",
              flush=True)
    if results:
        total = sum(min(s) for s in results.values())
        print(f"TOTAL(best): {total:.3f}s over {len(results)} keys")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
