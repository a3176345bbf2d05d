"""Multi-model batch scoring (SURVEY.md §2.8 U9).

Reference shape: for each registered model, predict per row in a
Python loop and insert_one to Mongo (src/main.py:140-158 — with the
dict-key bug documented in SURVEY §2.10.2). Spec adopted: ONE output
row per input with one prediction column per model, produced in a
single distributed pass — one ``withColumn`` per model, column-
parallel, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def score_with_models(df: DataFrame, vec_col: str, models: dict) -> DataFrame:
    """Apply each fitted spark.ml model as a prediction column named
    after the model (reference intent: {model_name: prediction, tweet:
    text}). ``models`` maps name → fitted MLlib model."""
    from pyspark.ml.functions import array_to_vector

    out = df.withColumn("__features", array_to_vector(F.col(vec_col).cast("array<double>")))
    for name, model in models.items():
        # MLlib models transform a features column; rename per model.
        scored = model.transform(
            out.select("*", F.col("__features").alias("features"))
        ).withColumnRenamed("prediction", name)
        keep = [c for c in scored.columns if c not in ("features", "rawPrediction", "probability")]
        out = scored.select(*keep)
    return out.drop("__features")


def score_deterministic(df: DataFrame, id_col: str, model_names: list[str]) -> DataFrame:
    """Deterministic stand-in scorer for environments without fitted
    models: prediction(model) = parity of the first hex digit of
    md5(id|model). md5 (not xxhash64) so the exact predictions are
    reproducible in ANY engine — the declared query is oracle-checked.
    Preserves the one-column-per-model output contract."""
    out = df
    for name in model_names:
        digit = F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|" + name))), 1, 1
        )
        out = out.withColumn(
            name,
            F.when(digit.isin("0", "2", "4", "6", "8", "a", "c", "e"), 0)
            .otherwise(1)
            .cast("int"),
        )
    return out
