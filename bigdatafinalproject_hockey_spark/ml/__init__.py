"""ML pipeline surface (SURVEY.md §2.14).

The reference trains 4 Spark-ML binary classifiers over the matchup
features and evaluates AUC + confusion-matrix metrics
(reference code/experiment.py:581-852). Re-expressed here with two
deliberate fixes:

- **Single-pass evaluation**: the reference runs SIX jobs over the
  predictions (1 evaluator + 4 filtered counts + 1 display groupBy,
  code/experiment.py:642-680; SURVEY.md §3.3). ``evaluate_binary``
  computes the confusion matrix in ONE groupBy job and derives
  accuracy/precision/recall/F1 from the four cells on the driver.
- Baselines (majority/coin-flip/weighted) come from the same single
  class-balance aggregate instead of separate counts
  (code/experiment.py:793-823).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import Pipeline
from pyspark.ml.classification import (
    GBTClassifier,
    LogisticRegression,
    MultilayerPerceptronClassifier,
    RandomForestClassifier,
)
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_features(
    feature_cols: list[str], output_col: str = "features"
) -> VectorAssembler:
    """Numeric columns → vector, skipping invalid rows
    (reference code/experiment.py:581-619)."""
    return VectorAssembler(
        inputCols=feature_cols, outputCol=output_col, handleInvalid="skip"
    )


def classifier(kind: str, label_col: str = "label", seed: int = 42):
    """The reference's four model configs (code/experiment.py:697-785)."""
    if kind == "rf":
        return RandomForestClassifier(
            labelCol=label_col, numTrees=200, maxDepth=10, seed=seed
        )
    if kind == "lr":
        return LogisticRegression(
            labelCol=label_col, maxIter=100, regParam=0.01, elasticNetParam=0.8,
            family="binomial",
        )
    if kind == "gbt":
        return GBTClassifier(labelCol=label_col, maxIter=100, maxDepth=8, seed=seed)
    if kind == "mlp":
        raise ValueError(
            "mlp requires layer sizes; use mlp_classifier(n_features)"
        )
    raise ValueError(f"unknown classifier kind {kind!r}")


def mlp_classifier(n_features: int, label_col: str = "label", seed: int = 42):
    """MLP with the reference's hidden topology [in, 64, 32, 2]
    (code/experiment.py:767-785)."""
    return MultilayerPerceptronClassifier(
        labelCol=label_col,
        layers=[n_features, 64, 32, 2],
        maxIter=100,
        blockSize=128,
        seed=seed,
    )


def train_pipeline(
    train: DataFrame, feature_cols: list[str], kind: str, label_col: str = "label"
):
    stages = [assemble_features(feature_cols)]
    if kind == "mlp":
        stages.append(mlp_classifier(len(feature_cols), label_col))
    else:
        stages.append(classifier(kind, label_col))
    return Pipeline(stages=stages).fit(train)


@dataclass
class BinaryMetrics:
    tp: int
    tn: int
    fp: int
    fn: int
    auc: float | None = None

    @property
    def n(self) -> int:
        return self.tp + self.tn + self.fp + self.fn

    @property
    def accuracy(self) -> float:
        return (self.tp + self.tn) / self.n if self.n else 0.0

    @property
    def precision(self) -> float:
        d = self.tp + self.fp
        return self.tp / d if d else 0.0

    @property
    def recall(self) -> float:
        d = self.tp + self.fn
        return self.tp / d if d else 0.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0


def evaluate_binary(
    predictions: DataFrame,
    label_col: str = "label",
    prediction_col: str = "prediction",
    with_auc: bool = True,
) -> BinaryMetrics:
    """Confusion matrix + derived metrics in ONE aggregation job
    (vs the reference's 4 filter+count jobs, code/experiment.py:645-656)."""
    lbl = F.col(label_col)
    prd = F.col(prediction_col)
    cells = predictions.agg(
        F.count(F.when((prd == 1) & (lbl == 1), 1)).alias("tp"),
        F.count(F.when((prd == 0) & (lbl == 0), 1)).alias("tn"),
        F.count(F.when((prd == 1) & (lbl == 0), 1)).alias("fp"),
        F.count(F.when((prd == 0) & (lbl == 1), 1)).alias("fn"),
    ).first()
    auc = None
    if with_auc:
        auc = BinaryClassificationEvaluator(
            labelCol=label_col, rawPredictionCol="rawPrediction",
            metricName="areaUnderROC",
        ).evaluate(predictions)
    return BinaryMetrics(
        tp=cells["tp"], tn=cells["tn"], fp=cells["fp"], fn=cells["fn"], auc=auc
    )


def baselines(test: DataFrame, label_col: str = "label") -> dict[str, float]:
    """Majority-class / coin-flip / weighted-random accuracies from one
    class-balance aggregate (reference code/experiment.py:793-823)."""
    row = test.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col(label_col) == 1, 1)).alias("pos"),
    ).first()
    n, pos = row["n"], row["pos"]
    if not n:
        return {"majority": 0.0, "coin_flip": 0.5, "weighted_random": 0.0}
    p = pos / n
    return {
        "majority": max(p, 1 - p),
        "coin_flip": 0.5,
        "weighted_random": p * p + (1 - p) * (1 - p),
    }


def feature_importances_topk(model, feature_cols: list[str], k: int = 10):
    """Top-k (importance, name) pairs from a fitted tree ensemble
    (reference code/experiment.py:39-54)."""
    imp = model.stages[-1].featureImportances.toArray()
    ranked = sorted(zip(imp, feature_cols), reverse=True)
    return ranked[:k]
