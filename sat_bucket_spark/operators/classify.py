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
    "score_with_token_weights",
    "seeded_classifier_weights",
    "train_token_classifier",
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


def train_token_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    alpha: float = 1.0,
) -> tuple[DataFrame, float]:
    """One-pass multinomial Naive Bayes: per-token log-odds weights.

    The trainABLE counterpart of the frozen hashed scorer: NB training is
    nothing but token counting, so the whole fit is ONE aggregation over
    the corpus — `explode tokens -> groupBy(token) -> per-class counts` —
    and scales like any other shuffle-by-token job (no gradient loop, no
    parameter server, deterministic). Laplace-smoothed log-odds:

        w(t) = log((pos_t + a) / (POS + a*V)) - log((neg_t + a) / (NEG + a*V))
        prior = log((n_pos + a) / (n_neg + a))

    ``label_col`` must be 0/1-coercible. Returns ``(weights_df(token,
    weight), prior)``; the three scalar totals collected on the driver are
    O(1). Feed the result to :func:`score_with_token_weights`.
    """
    lab = F.col(label_col).cast("int")
    toks = df.select(
        lab.alias("__y"),
        F.explode(F.transform(tokens_expr(text_col), lambda t: F.lower(t))).alias(
            "token"
        ),
    )
    counts = toks.groupBy("token").agg(
        F.sum(F.col("__y")).alias("__pos"),
        F.sum(F.lit(1) - F.col("__y")).alias("__neg"),
    )
    tot = counts.agg(
        F.sum("__pos").alias("P"),
        F.sum("__neg").alias("N"),
        F.count(F.lit(1)).alias("V"),
    ).first()
    if not tot["V"]:
        raise ValueError(
            "train_token_classifier: corpus tokenized to an empty vocabulary "
            "(no rows, or no text survives tokenization) — nothing to fit"
        )
    P, N, V = float(tot["P"] or 0.0), float(tot["N"] or 0.0), float(tot["V"])
    w = F.log((F.col("__pos") + F.lit(alpha)) / F.lit(P + alpha * V)) - F.log(
        (F.col("__neg") + F.lit(alpha)) / F.lit(N + alpha * V)
    )
    weights = counts.select(F.col("token"), F.round(w, 6).alias("weight"))
    docs = df.agg(
        F.sum(lab).alias("p"), F.sum(F.lit(1) - lab).alias("n")
    ).first()
    prior = float(
        np.log((docs["p"] + alpha) / (docs["n"] + alpha))
    )
    return weights, round(prior, 6)


def score_with_token_weights(
    df: DataFrame,
    weights: DataFrame,
    prior: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Log-odds score per document from a (token, weight) table.

    The weights table is vocabulary-sized (MBs) and **broadcast**; scoring
    is explode_outer -> broadcast-join -> per-document sum — the shuffle
    carries only (id, partial sum). Unknown tokens contribute 0 (left
    join); documents whose token array is EMPTY still get a row (outer
    explode yields a NULL token) and score exactly ``prior`` instead of
    silently vanishing from the output. The
    per-document sum is ordered by token then weight before accumulation
    cannot be guaranteed cross-engine, so the score sums in DECIMAL (exact,
    order-free) and rounds to 6 — bit-stable in any engine.
    """
    toks = df.select(
        F.col(id_col),
        F.explode_outer(
            F.transform(tokens_expr(text_col), lambda t: F.lower(t))
        ).alias("token"),
    )
    joined = toks.join(F.broadcast(weights), "token", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.round(
                F.sum(
                    F.coalesce(F.col("weight"), F.lit(0.0)).cast("decimal(26,6)")
                ).cast("double")
                + F.lit(prior),
                6,
            ).alias("nb_score")
        )
    )
