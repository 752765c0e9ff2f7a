"""Hashed linear text classification — the model-scoring stage of a
curation pipeline, as pure Column expressions.

Production corpus curation filters documents with a cheap linear model
(fastText-style: hashed bag-of-tokens features, mean-pooled, logistic
output) trained offline on labeled quality/toxicity/domain data. The
*scoring* side — the part that must run over 100 TB — is just:

    score = sigmoid(bias + mean_t w[h(token_t) mod D])

which maps onto whole-stage codegen exactly: ``aggregate`` folds the
token array against a literal weight table (``element_at`` on a
D-element array literal), so scoring is map-only — zero shuffle, zero
Python, and the scan still prunes columns/filters normally. The weight
table travels inside the plan (a few KB of literals), not as a join
side or a broadcast variable.

The token hash is the engine-portable md5-derived ``h31`` (operators/
hashing.py), so an external engine replays scores bit-for-bit given the
same weights — which is how the DuckDB oracle verifies this operator.

Weights here are supplied by the caller (or a deterministic seeded
stand-in for tests/benchmarks); training happens offline in any ML
stack — this module is deliberately inference-only, mirroring how
curation pipelines deploy frozen classifier snapshots.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sat_bucket_spark.operators.hashing import MERSENNE_P, h31_expr
from sat_bucket_spark.operators.text import tokens_expr

__all__ = [
    "classifier_score_expr",
    "classify_documents",
    "seeded_classifier_weights",
]


def seeded_classifier_weights(
    n_features: int = 64, seed: int = 11, scale: float = 0.75
) -> tuple[np.ndarray, float]:
    """Deterministic stand-in weights ``(w, bias)`` for tests/benchmarks.

    Real deployments pass weights exported from an offline trainer; the
    seeded draw gives a fixed, replayable model so correctness oracles and
    benchmarks exercise the exact production scoring plan.
    """
    rng = np.random.default_rng(seed)
    w = rng.standard_normal(n_features) * scale
    bias = float(rng.standard_normal() * 0.1)
    return w, bias


def classifier_score_expr(
    text: Column | str,
    weights: np.ndarray,
    bias: float = 0.0,
) -> Column:
    """Logistic score of a document under a hashed linear model.

    ``sigmoid(bias + mean over tokens of weights[h31(lower(token)) % D])``;
    empty documents score ``sigmoid(bias)`` (the model prior). Rounded to 6
    decimals so engines computing the fold in double agree bit-for-bit.
    """
    d = len(weights)
    warr = F.array(*[F.lit(float(x)) for x in weights])
    toks = F.transform(tokens_expr(text), lambda t: F.lower(t))
    feat_sum = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc
        + F.element_at(warr, ((h31_expr(t) % F.lit(d)) + 1).cast("int")),
    )
    n = F.size(toks)
    mean = F.when(n > 0, feat_sum / n.cast("double")).otherwise(F.lit(0.0))
    z = F.lit(float(bias)) + mean
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def classify_documents(
    df: DataFrame,
    weights: np.ndarray,
    bias: float = 0.0,
    text_col: str = "text",
    threshold: float = 0.5,
    out: str = "quality_prob",
    label_out: str = "keep",
) -> DataFrame:
    """Append the model score and the keep/drop decision.

    The decision derives from the ROUNDED score so threshold-boundary
    documents classify identically across engines.
    """
    scored = df.withColumn(out, classifier_score_expr(text_col, weights, bias))
    return scored.withColumn(label_out, F.col(out) >= F.lit(threshold))


def classifier_score_sql(
    weights: np.ndarray, bias: float = 0.0, src: str = "text"
) -> str:
    """DuckDB fragment equal to :func:`classifier_score_expr` (oracle replay)."""
    d = len(weights)
    warr = "[" + ", ".join(f"{float(x)!r}" for x in weights) + "]"
    toks = f"list_transform(list_filter(string_split_regex(trim({src}), '\\s+'), x -> x != ''), x -> lower(x))"
    h = f"(CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {MERSENNE_P})"
    fold = f"list_sum(list_transform({toks}, tok -> ({warr})[({h} % {d}) + 1]))"
    n = f"len({toks})"
    mean = f"(CASE WHEN {n} > 0 THEN {fold} / CAST({n} AS DOUBLE) ELSE 0.0 END)"
    return f"round(1.0 / (1.0 + exp(-({float(bias)!r} + {mean}))), 6)"
