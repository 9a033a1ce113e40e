"""Distributed classifier training for curation pipelines.

The fastText-style quality-classifier step every web-corpus recipe runs
(CCNet / GPT-3 / LLaMA data recipes train a linear model to separate
"reference-like" from crawl text) re-expressed Spark-first: batch gradient
descent where each iteration is ONE aggregation over the corpus with
map-side partial aggregation. Driver state is the weight vector only
(num_features doubles — the same size-gated driver-scalar pattern as
kmeans_refine's centroid row); the corpus is never collected and nothing
shuffles but per-partition gradient partials.

Engine-portability: per-row gradient contributions are rounded to 6dp
integer micro-units before summation, so the fitted weights are
summation-order-independent and a SQL engine unrolling the same fixed
iteration count reproduces them bit-for-bit (see q86's rationale).
Predictions use the margin sign (``z >= 0``), not ``sigmoid(z) >= 0.5`` —
mathematically identical, but exact under IEEE comparison where the
sigmoid form could waver a ulp around 0.5.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MICRO = 1_000_000


def _half_away(v: float, digits: int = 0) -> float:
    """Round half away from zero — Spark's ROUND and DuckDB's round(),
    NOT python's banker's round()."""
    scale = 10.0 ** digits
    return math.copysign(math.floor(abs(v) * scale + 0.5), v) / scale


def margin(features: list[Column], weights: list[float]) -> Column:
    """w . x as a fixed left-to-right fold (identical association order on
    any engine re-deriving it)."""
    z: Column = F.lit(0.0)
    for w, x in zip(weights, features):
        z = z + F.lit(w) * x
    return z


def logistic_fit(
    df: DataFrame,
    features: list[Column],
    label: Column,
    iterations: int = 3,
    lr: float = 1.0,
) -> list[float]:
    """Batch-GD logistic regression; returns the weight list (one per
    feature — include a ``F.lit(1.0)`` feature for the bias).

    w_j += lr * mean_i((y_i - sigmoid(w . x_i)) * x_ij), means taken over
    6dp micro-unit integer sums. ``iterations`` scans of ``df`` total —
    at scale, cache/checkpoint the feature projection before calling.
    """
    n_feat = len(features)
    base = df.select(
        label.cast("double").alias("__y"),
        *[x.cast("double").alias(f"__x{j}")
          for j, x in enumerate(features)],
    )
    feats = [F.col(f"__x{j}") for j in range(n_feat)]
    weights = [0.0] * n_feat
    for _ in range(iterations):
        z = margin(feats, weights)
        sigma = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = F.col("__y") - sigma
        row = base.agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.sum(F.round(err * x * _MICRO).cast("long")).alias(f"__g{j}")
              for j, x in enumerate(feats)],
        ).collect()[0]
        n = row["__n"]
        weights = [w + lr * (row[f"__g{j}"] / (n * float(_MICRO)))
                   for j, w in enumerate(weights)]
    return weights


def logistic_fit_report(
    df: DataFrame,
    features: list[Column],
    label: Column,
    iterations: int = 3,
    lr: float = 1.0,
) -> DataFrame:
    """Fit, then report (n, w_0..w_k rounded 6dp, train_accuracy) as a
    1-row DataFrame — accuracy via the exact margin-sign predicate."""
    weights = logistic_fit(df, features, label, iterations, lr)
    z = margin(features, weights)
    pred = (z >= 0).cast("int")
    y = label.cast("int")
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.lit(_half_away(w, 6)).alias(f"w{j}")
          for j, w in enumerate(weights)],
        F.round(F.sum(F.when(pred == y, 1).otherwise(0))
                / F.count(F.lit(1)), 6).alias("train_accuracy"),
    )


def logistic_fit_local(rows: list[tuple[float, list[float]]],
                       iterations: int = 3, lr: float = 1.0) -> list[float]:
    """Pure-python reference of ``logistic_fit`` (same micro-unit
    rounding) for tests: rows are (label, feature_vector)."""
    n_feat = len(rows[0][1])
    w = [0.0] * n_feat
    for _ in range(iterations):
        g = [0] * n_feat
        for y, x in rows:
            z = 0.0
            for wj, xj in zip(w, x):
                z = z + wj * xj
            sigma = 1.0 / (1.0 + math.exp(-z))
            for j in range(n_feat):
                g[j] += int(_half_away((y - sigma) * x[j] * _MICRO))
        w = [wj + lr * (gj / (len(rows) * float(_MICRO)))
             for wj, gj in zip(w, g)]
    return w
