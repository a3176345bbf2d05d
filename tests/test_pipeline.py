"""End-to-end pipeline test on the reference's own committed fixture:
the complete training flow (CSV → sample → clean → embed → 4 trainers
→ metrics) and the inference flow (featurize → multi-model score →
predictions sink) — the 'a reference user could switch' proof.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from team_02_spark.ml.models import train_with_tracking, trainers
from team_02_spark.pipeline import (
    featurize,
    prepare_training_data,
    run_inference_pipeline,
)

# The reference's committed sample is the post-drop snapshot
# (,sentiment,tweet). Rebuild a Sentiment140-layout CSV from it so the
# S1 scan path (6 cols, latin-1, headerless) is exercised end to end.
REF_FIXTURE = "/root/reference/data/tweets_1000.csv"


def _make_sentiment140_csv(tmpdir: str) -> str:
    import csv

    src = list(csv.reader(open(REF_FIXTURE, encoding="latin-1")))[1:]
    path = os.path.join(tmpdir, "tweets.csv")
    with open(path, "w", encoding="latin-1", newline="") as f:
        w = csv.writer(f)
        for idx, sent, tweet in src:
            w.writerow([sent, idx, "Mon Apr 06 22:19:45 PDT 2009", "NO_QUERY",
                        f"user{idx}", tweet])
    return path


def test_training_pipeline_end_to_end(spark):
    with tempfile.TemporaryDirectory() as tmp:
        csv_path = _make_sentiment140_csv(tmp)
        data = prepare_training_data(spark, csv_path, per_class=50,
                                     snapshot_dir=tmp)
        counts = {r["sentiment"]: r["n"] for r in
                  data.groupBy("sentiment").agg(F.count("*").alias("n")).collect()}
        assert all(n == 50 for n in counts.values())
        # snapshot written, content-addressed
        snaps = [d for d in os.listdir(tmp) if d.endswith(".csv") and os.path.isdir(os.path.join(tmp, d))]
        assert len(snaps) == 1 and len(snaps[0]) == 36  # md5 hex + '.csv'

        feats = featurize(data)
        row = feats.first()
        assert isinstance(row["tokens"], list)
        assert len(row["embedding"]) == 64

        ready = feats.select(
            "id", "embedding",
            F.when(F.col("sentiment") == 4, 1).otherwise(0).alias("y"),
        )
        _m, metrics = train_with_tracking(
            ready, "embedding", "y", "logistic_regression",
            trainers()["logistic_regression"],
        )
        assert metrics["tp"] + metrics["fp"] + metrics["fn"] + metrics["tn"] > 0


def test_inference_pipeline_end_to_end(spark):
    with tempfile.TemporaryDirectory() as tmp:
        csv_path = _make_sentiment140_csv(tmp)
        data = prepare_training_data(spark, csv_path, per_class=50)
        feats = featurize(data)
        ready = feats.select(
            "id", "embedding",
            F.when(F.col("sentiment") == 4, 1).otherwise(0).alias("y"),
        )
        zoo = trainers()
        fitted = {
            name: train_with_tracking(ready, "embedding", "y", name, zoo[name])[0]
            for name in ("logistic_regression", "gaussian_nb")
        }
        fresh = data.select("id", "tweet").limit(20)
        out_path = os.path.join(tmp, "predictions.parquet")
        scored = run_inference_pipeline(spark, fresh, fitted, out_path=out_path)
        assert scored.count() == 20
        assert set(fitted) < set(scored.columns)
        # sink round-trips
        back = spark.read.parquet(out_path)
        assert back.count() == 20


def test_jsonl_roundtrip_preserves_content(spark, tmp_path):
    """documents -> gzip JSONL shards -> read back with explicit
    schema: same dataset fingerprint, no schema-inference pre-pass
    (schema passed explicitly)."""
    from team_02_spark.sinks.writers import (
        dataset_fingerprint, read_jsonl, write_jsonl,
    )
    from team_02_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs.repartition(4), out)
    back = read_jsonl(spark, out, schema="doc_id long, text string, lang string")
    assert dataset_fingerprint(back, "doc_id", "text", "lang") == \
        dataset_fingerprint(docs, "doc_id", "text", "lang")
    import glob
    assert glob.glob(out + "/*.json.gz")  # gzip shards on disk


def test_orc_roundtrip_preserves_content(spark, tmp_path):
    """ORC sink/source round-trip (columnar alternative to parquet,
    supported natively by Spark): fingerprint-equal content."""
    from team_02_spark.sinks.writers import dataset_fingerprint
    from team_02_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "docs_orc")
    docs.repartition(2).write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert dataset_fingerprint(back, "doc_id", "text", "lang") == \
        dataset_fingerprint(docs, "doc_id", "text", "lang")


def test_write_training_shards_layout(spark, tmp_path):
    """Shard export: every doc lands in exactly one shard, shard
    assignment matches q_shard_plan's manifest, and the in-shard
    order is reproducible (two writes give identical per-file row
    order)."""
    import glob

    from team_02_spark.queries import QUERIES
    from team_02_spark.sinks.writers import write_training_shards
    from team_02_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    out = str(tmp_path / "shards")
    manifest = {r["shard"]: r["n_docs"]
                for r in write_training_shards(docs, out, n_shards=16).collect()}
    assert sum(manifest.values()) == docs.count()
    assert len(glob.glob(out + "/shard=*")) == len(manifest)

    plan = {r["shard"]: r["n_docs"]
            for r in QUERIES["q_shard_plan"].fn(spark, "/root/testdata/sf0.001").collect()}
    assert manifest == plan  # writer executes exactly the dry-run plan

    out2 = str(tmp_path / "shards2")
    write_training_shards(docs, out2, n_shards=16)
    s0 = sorted(glob.glob(out + "/shard=3/*.parquet"))
    s1 = sorted(glob.glob(out2 + "/shard=3/*.parquet"))
    ids0 = [r["doc_id"] for r in spark.read.parquet(*s0).collect()]
    ids1 = [r["doc_id"] for r in spark.read.parquet(*s1).collect()]
    assert ids0 == ids1 and len(ids0) > 0
