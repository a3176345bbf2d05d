"""End-to-end pipelines mirroring the reference's two entry points
(SURVEY.md §3), re-expressed as pure DataFrame stages.

Reference training flow (src/main.py:162-191):
    CSV scan → drop cols → stratified sample (1000/class) →
    content-addressed CSV snapshot → clean → tokenize/embed →
    80/20 split → train 5 classifiers → confusion metrics → MLflow.

Reference inference flow (src/main.py:192-200):
    Twitter fetch → clean/embed → score with every registered model →
    MongoDB sink.

Differences, all documented in SURVEY §2.10: explicit id join instead
of positional alignment; one prediction column per model instead of
the colliding dict; array<string> cleaning contract; deterministic
hash-projection embedder standing in for DistilBERT where torch is
absent (swap via ``embedder=``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from team_02_spark.functions.text import clean_and_stem
from team_02_spark.ml.embed import hash_embed
from team_02_spark.ml.models import confusion_metrics, train_with_tracking, trainers
from team_02_spark.ml.scoring import score_with_models
from team_02_spark.operators.relational import stratified_sample_exact
from team_02_spark.sinks import write_csv_content_addressed, write_predictions
from team_02_spark.sources import read_sentiment140_csv


def prepare_training_data(spark: SparkSession, csv_path: str, *,
                          per_class: int = 1000,
                          snapshot_dir: str | None = None) -> DataFrame:
    """Stages 1-3 of the reference training flow: scan → project →
    exact-N stratified sample → optional content-addressed snapshot
    (the reference's md5 CSV cache, src/main.py:71-73)."""
    raw = read_sentiment140_csv(spark, csv_path)
    projected = raw.select("id", "sentiment", "tweet")  # P1: drop date/from/user
    sampled = stratified_sample_exact(projected, "sentiment", per_class, key="id")
    if snapshot_dir:
        write_csv_content_addressed(sampled, snapshot_dir)
    return sampled


def featurize(df: DataFrame, text_col: str = "tweet", *, embedder=None) -> DataFrame:
    """Stage 4: clean (F1-F5) + embed (U2). The id column rides along —
    no positional alignment anywhere (SURVEY §2.10.3)."""
    emb = embedder or hash_embed
    return df.withColumn("tokens", clean_and_stem(F.col(text_col))).withColumn(
        "embedding", emb(F.array_join(F.col("tokens"), " "))
    )


def run_training_pipeline(spark: SparkSession, csv_path: str, *,
                          per_class: int = 1000,
                          label_from=None) -> dict[str, dict]:
    """The full reference training run: returns {model_name: metrics}.
    ``label_from`` converts the raw sentiment (0/4) to a binary label;
    default maps 4 → 1, else 0 (reference classes, src/main.py:68-69).
    """
    data = prepare_training_data(spark, csv_path, per_class=per_class)
    feats = featurize(data)
    label = label_from or (lambda c: F.when(c == 4, 1).otherwise(0))
    ready = feats.select(
        "id", "embedding", label(F.col("sentiment")).cast("int").alias("y")
    )
    results: dict[str, dict] = {}
    for name, est in trainers().items():
        _model, metrics = train_with_tracking(ready, "embedding", "y", name, est)
        results[name] = metrics
    return results


def run_inference_pipeline(spark: SparkSession, tweets: DataFrame, models: dict, *,
                           out_path: str | None = None) -> DataFrame:
    """The reference inference run on an arbitrary (id, tweet) frame:
    featurize → score with every model (one column each) → optional
    predictions-table sink (the Mongo-collection equivalent)."""
    feats = featurize(tweets)
    scored = score_with_models(feats, "embedding", models)
    out = scored.select(
        "id", "tweet", *[c for c in scored.columns if c in models]
    )
    if out_path:
        write_predictions(out, out_path)
    return out
