"""ML ranking layer (SURVEY.md section 2.9, M1).

Two interchangeable scorers over the 19-slot feature vector (X4 order,
reference crocodile/feature.py:10-30):

1. ``logistic`` (default, operators/scoring.py + operators/typefreq.py):
   sigmoid(w . f + b) as a native column expression -- weights are plan
   literals, zero Python in the hot path. Trained by scripts/train_scorer.py.

2. ``MlpRanker`` (this module): inference-parity replacement for the
   reference's Keras MLP (crocodile/ml.py:57-60; architecture read from the
   model file's attrs -- Input(19) -> Dense64 -> BN -> Dense128 -> BN ->
   Dense256 -> BN -> Dense128 -> BN -> Dense64 -> BN -> Dense2 softmax,
   relu activations; dropout is a no-op at inference). Implemented as pure
   numpy matmuls inside an Arrow pandas UDF with the weight arrays shipped
   once per executor via a Spark broadcast -- no TensorFlow dependency.
   Weights here are seeded-random by default (the reference's trained .h5
   values are not copied -- this engine's trained scorer is the logistic
   model); ``from_arrays``/``save``/``load`` support training externally
   and shipping real weights.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (units_in, units_out) per dense layer; final layer is softmax over 2
LAYER_SIZES = [(19, 64), (64, 128), (128, 256), (256, 128), (128, 64), (64, 2)]


class MlpRanker:
    """Numpy-only MLP scorer matching the reference architecture."""

    def __init__(self, params: dict[str, np.ndarray]):
        self.params = params

    # ---- construction ----------------------------------------------------
    @classmethod
    def random(cls, seed: int = 42) -> "MlpRanker":
        rng = np.random.default_rng(seed)
        params: dict[str, np.ndarray] = {}
        for i, (fan_in, fan_out) in enumerate(LAYER_SIZES):
            # glorot-uniform init, the keras Dense default
            limit = np.sqrt(6.0 / (fan_in + fan_out))
            params[f"W{i}"] = rng.uniform(-limit, limit, (fan_in, fan_out))
            params[f"b{i}"] = np.zeros(fan_out)
            if i < len(LAYER_SIZES) - 1:  # batch-norm after every hidden layer
                params[f"bn{i}_gamma"] = np.ones(fan_out)
                params[f"bn{i}_beta"] = np.zeros(fan_out)
                params[f"bn{i}_mean"] = np.zeros(fan_out)
                params[f"bn{i}_var"] = np.ones(fan_out)
        return cls(params)

    @classmethod
    def load(cls, path: str) -> "MlpRanker":
        with open(path) as f:
            payload = json.load(f)
        return cls({k: np.asarray(v) for k, v in payload.items()})

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump({k: v.tolist() for k, v in self.params.items()}, f)

    # ---- inference ---------------------------------------------------------
    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        """P(match) per row; batch matmuls, inference-mode BN, relu."""
        h = np.asarray(X, dtype=np.float64)
        p = self.params
        n_layers = len(LAYER_SIZES)
        for i in range(n_layers):
            h = h @ p[f"W{i}"] + p[f"b{i}"]
            if i < n_layers - 1:
                h = (h - p[f"bn{i}_mean"]) / np.sqrt(p[f"bn{i}_var"] + 1e-3)
                h = h * p[f"bn{i}_gamma"] + p[f"bn{i}_beta"]
                h = np.maximum(h, 0.0)  # relu
        # softmax over the 2 logits; column 1 = P(match) (ml.py:163-164 law)
        z = h - h.max(axis=1, keepdims=True)
        e = np.exp(z)
        return e[:, 1] / e.sum(axis=1)

    # ---- Spark integration -------------------------------------------------
    def score_column(self, spark: SparkSession, features_col: Column) -> Column:
        """Arrow pandas UDF over an array<double> feature column, weights
        shipped via Spark broadcast (one deserialize per executor, predict
        batch semantics like the reference's model.predict(batch_size=128))."""
        bc = spark.sparkContext.broadcast(self.params)

        @F.pandas_udf(T.DoubleType())
        def mlp_score(feats: pd.Series) -> pd.Series:
            model = MlpRanker(bc.value)
            X = np.stack(feats.to_numpy())
            return pd.Series(model.predict_proba(X))

        return mlp_score(features_col)


def mlp_rerank(
    spark: SparkSession,
    df: DataFrame,
    cfg,
    ranker: MlpRanker | None = None,
) -> DataFrame:
    """W4 with the MLP scorer: assemble the X4 feature vector, score with
    the broadcast MLP, re-rank within each cell."""
    from pyspark.sql import Window

    from crocodile_spark.operators.typefreq import CELL_KEY, feature_vector

    ranker = ranker or MlpRanker.random()
    out = df.withColumn("_fv", feature_vector(df, cfg)).withColumn(
        "ml_score", ranker.score_column(spark, F.col("_fv"))
    ).drop("_fv")
    w = Window.partitionBy(*CELL_KEY).orderBy(F.desc("ml_score"), F.asc("qid"))
    return out.withColumn("ml_rank", F.row_number().over(w))
