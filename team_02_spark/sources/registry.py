"""Source registry: fixture tables + the reference's CSV source.

The harness tables (TESTDATA.md / FIXTURES.md) are parquet and
self-describing; ``load_table`` is a thin wrapper that keeps all path
construction in one place so a future move to partitioned cloud storage
(100 TB layout: date/source-partitioned directories) touches one
function.

The reference's native source is a headerless latin-1 Sentiment140 CSV
(/root/reference/src/main.py:64-65: ``pd.read_csv(filepath,
encoding='latin-1', header=None)`` then positional column assignment).
``read_sentiment140_csv`` re-expresses that with an explicit schema
declared at the source — schema-on-read, quoted-field aware.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Every fixture table name (TESTDATA.md). Parquet carries its own
# schema; listed here for validation and for the DuckDB oracle harness.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Sentiment140 layout (FIXTURES.md §B; reference src/main.py:65).
SENTIMENT140_SCHEMA = T.StructType(
    [
        T.StructField("sentiment", T.IntegerType()),
        T.StructField("id", T.LongType()),
        T.StructField("date", T.StringType()),
        T.StructField("from", T.StringType()),
        T.StructField("user", T.StringType()),
        T.StructField("tweet", T.StringType()),
    ]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Filters/projections applied by callers
    push down to the parquet scan (verify with .explain: PushedFilters,
    ReadSchema).

    ``events.ts`` normalization: fixture encodings of the event-time
    column have varied across harness generations, so both are handled:

    * TIMESTAMP(MICROS, isAdjustedToUTC=false) — Spark 4 reads this as
      ``timestamp_ntz``. Cast to ``timestamp``: the session timezone is
      pinned UTC (session.py), so the cast is value-preserving and
      agrees with DuckDB's ``epoch_us`` view of the same file.
    * TIMESTAMP(NANOS) — vanilla Spark 4 rejects it
      ([PARQUET_TYPE_ILLEGAL]); read via the public
      ``spark.sql.legacy.parquet.nanosAsLong`` conf (long nanoseconds)
      and truncate to a microsecond timestamp.

    Downstream event-time code (watermarks, ``unix_micros``, time-RANGE
    frames) requires a true ``timestamp``, so the invariant here is:
    ``load_table(..., 'events')`` always yields ``ts: timestamp``."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The NTZ->timestamp cast below is value-preserving ONLY under a
        # UTC session timezone. session.py pins it, but the driver's
        # verify harness uses a vanilla SparkSession, so pin it here too
        # (runtime-settable conf) or a non-UTC host silently shifts
        # event times relative to DuckDB's epoch_us view.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names or TABLES}


def read_sentiment140_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV scan with the reference's exact read semantics (S1 in
    SURVEY.md §2.1): headerless, latin-1, comma-delimited, quoted fields
    may contain commas/quotes (reference data/tweets_1000.csv:8)."""
    return (
        spark.read.schema(SENTIMENT140_SCHEMA)
        # "latin-1" is spelled iso-8859-1 in Spark 4's charset list
        .options(header=False, encoding="iso-8859-1", quote='"', escape='"',
                 multiLine=False)
        .csv(path)
    )


def register_views(spark: SparkSession, sf_dir: str,
                   suffix: str = "") -> None:
    """Register every fixture table as a temp view so the spark.sql
    front-end works standalone:

        register_views(spark, sf_dir)
        spark.sql("SELECT ... FROM lineitem JOIN orders ON ...")
    """
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name + suffix)
