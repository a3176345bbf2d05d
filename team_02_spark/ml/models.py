"""Classifier training (SURVEY.md §2.8 U3-U8) on spark.ml.

Reference trains 5 sklearn models on DistilBERT features
(src/main.py:91-114) and logs to MLflow (src/main.py:116-131). Spark
mapping, with documented deviations (SURVEY §7.3):

- RandomForest(maxDepth=2, seed=0)      ← sklearn RF(max_depth=2, random_state=0)
- LogisticRegression()                  ← sklearn LR()
- LinearSVC()                           ← sklearn SVC(rbf) — Spark has no
                                          kernel SVM; linear SVM is the
                                          nearest public equivalent
- NaiveBayes(modelType='gaussian')      ← sklearn GaussianNB()
- KNN                                   ← no MLlib KNN; implemented as a
                                          similarity join + majority vote
                                          (operators/similarity.knn_classify)

MLflow calls are import-gated: the public API is unchanged when
available; absent (this container), training still runs and returns
metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _to_features(df: DataFrame, vec_col: str, label_col: str) -> DataFrame:
    """array<float> → MLlib Vector feature column + double label."""
    from pyspark.ml.functions import array_to_vector

    return df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
        F.col(label_col).cast("double").alias("label"),
    )


def trainers(seed: int = 0) -> dict:
    """The reference's 5-model zoo, Spark-native (lazily constructed)."""
    from pyspark.ml.classification import (
        GBTClassifier,
        LinearSVC,
        LogisticRegression,
        NaiveBayes,
        RandomForestClassifier,
    )

    return {
        "random_forest": RandomForestClassifier(maxDepth=2, seed=seed),
        "logistic_regression": LogisticRegression(),
        "linear_svc": LinearSVC(),
        "gaussian_nb": NaiveBayes(modelType="gaussian"),
        # beyond the reference's zoo: gradient-boosted trees, the
        # tabular workhorse a pipeline user reaches for next (shallow
        # + few trees keeps local fits fast; seeded for determinism)
        "gbt": GBTClassifier(maxDepth=3, maxIter=10, seed=seed),
        # "knn" intentionally absent here: it is not an estimator —
        # see operators/similarity.knn_classify.
    }


def confusion_metrics(preds: DataFrame, label_col: str = "label",
                      pred_col: str = "prediction") -> dict[str, float]:
    """A1 as one conditional-agg pass (reference logs tn/fp/fn/tp,
    precision, recall per model — src/main.py:121-129)."""
    lab, pred = F.col(label_col), F.col(pred_col)
    row = preds.agg(
        F.sum(F.when((lab == 1) & (pred == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((lab == 0) & (pred == 1), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((lab == 1) & (pred == 0), 1).otherwise(0)).alias("fn"),
        F.sum(F.when((lab == 0) & (pred == 0), 1).otherwise(0)).alias("tn"),
    ).first()
    tp, fp, fn, tn = row["tp"], row["fp"], row["fn"], row["tn"]
    precision = tp / (tp + fp) if (tp + fp) else 0.0
    recall = tp / (tp + fn) if (tp + fn) else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "tn": tn,
            "precision": precision, "recall": recall}


def train_with_tracking(df: DataFrame, vec_col: str, label_col: str,
                        name: str, estimator, *, holdout: float = 0.2,
                        seed: int = 15, experiment: str = "team_02_spark"):
    """U8: fit → holdout-score → confusion metrics, with MLflow
    tracking when the library is present (reference
    train_with_mlflow, src/main.py:116-131: autolog + registry +
    tn/fp/fn/tp/precision/recall params/metrics).

    Returns (model, metrics dict)."""
    feats = _to_features(df, vec_col, label_col)
    train, test = feats.randomSplit([1 - holdout, holdout], seed=seed)
    model = estimator.fit(train)
    preds = model.transform(test)
    metrics = confusion_metrics(preds, "label", "prediction")
    try:  # MLflow is optional — public API only, unchanged semantics
        import mlflow

        mlflow.set_experiment(experiment)
        with mlflow.start_run(run_name=name):
            mlflow.log_param("model_name", name)
            mlflow.log_param("n_train", train.count())
            mlflow.log_metrics({k: float(v) for k, v in metrics.items()})
    except ImportError:
        pass
    return model, metrics
