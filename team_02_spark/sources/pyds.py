"""Custom Python DataSource (Spark 4.0 `pyspark.sql.datasource` API)
over the REST landing directory — the idiomatic Spark-4 front door
for the S5 REST lifecycle (reference src/main.py:133-138): after
`streaming/rest.py` lands each poll as an immutable JSON-lines file,
this source exposes the directory as

    spark.dataSource.register(TweetLandingDataSource)
    spark.read.format("tweet_landing").option("path", dir).load()

with ONE input partition PER LANDED FILE, so a directory of N poll
files scans N-way parallel with no driver-side parsing (each
partition's file is opened and parsed inside the executor's Python
worker, Arrow-batched back to the JVM).

Why both this AND the plain `spark.read.json` path exist: the JSON
reader is the production default (JVM-native, faster); the custom
DataSource is the extension-point demonstration — the same three
small classes wrap ANY driver-unreachable system (an internal REST
API, a message queue, a proprietary format) as a first-class
`format(...)` that Catalyst plans like any other scan. Kept
dependency-free and deterministic so tests can assert source ≡
spark.read.json over the same files.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from team_02_spark.streaming.rest import TWEET_SCHEMA

# ONE schema definition with the landing writer (streaming/rest.py) —
# read() yields positional tuples, so schema drift would silently
# misalign values.
LANDING_SCHEMA = TWEET_SCHEMA


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TweetLandingDataSource(DataSource):
    """`format("tweet_landing")` — one partition per landed poll file."""

    @classmethod
    def name(cls) -> str:
        return "tweet_landing"

    def schema(self) -> str:
        return LANDING_SCHEMA

    def reader(self, schema) -> "TweetLandingReader":
        path = self.options.get("path")
        if not path:
            raise ValueError("tweet_landing requires .option('path', dir)")
        return TweetLandingReader(path)


class TweetLandingReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path

    def partitions(self) -> list[_FilePartition]:
        # Planning-time listing on the driver: names only (cheap);
        # bytes are read executor-side in read(). Hidden tmp files
        # (.name.tmp from the atomic-rename protocol) are skipped, so
        # a concurrent poll can never half-appear in a scan.
        return [
            _FilePartition(os.path.join(self.path, f))
            for f in sorted(os.listdir(self.path))
            if f.endswith(".json") and not f.startswith(".")
        ]

    def read(self, partition: _FilePartition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                yield (rec.get("id"), rec.get("tweet"), rec.get("created_at"))
