"""Deterministic distributed model training: fixed-iteration logistic
regression in pure DataFrame aggregations (VERDICT r4 "Next round" #6 — the
first REAL learned model in the scoring slot, replacing nothing: the stub
stays as the documented fallback, this trains actual weights).

The reference trains with HF Trainer + LoRA on a GPU (SFT/glm4_lora.py);
no deep-learning stack ships here, but the ENGINE-side question — can the
data plane train a model deterministically at 100 TB — is answerable with
classic batch gradient descent, and the answer shapes the design:

* one full-scan AGGREGATION per iteration (map-side partial agg; the model
  is k floats broadcast INSIDE the expression as literals — no parameter
  server, no driver data collect beyond k longs per iteration);
* **integer-quantized gradient accumulation**: each row contributes
  ``floor(grad_j * 2^20)`` as a BIGINT and the sum is exact and
  ORDER-INDEPENDENT — float summation order varies with partitioning, so a
  double-sum trainer would produce different weights on different cluster
  layouts; the quantized trainer produces bit-identical weights at any
  parallelism (and in any engine: the DuckDB oracle replays the identical
  iterations as chained one-row CTEs);
* the sigmoid is the rational ``0.5 + 0.5·z/(1+|z|)`` (scoring.py's stub
  device): exact double arithmetic, no libm exp whose last-ulp behavior
  differs across engines;
* all double expressions are built LEFT-ASSOCIATIVE by one shared builder
  so Spark, the SQL oracle, and the numpy scorer evaluate the identical
  IEEE operation sequence.

Quantization costs ~2^-20 per-row gradient precision — irrelevant to a
classifier and a standard trade (deterministic fixed-point all-reduce).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 2 ** 20  # power of two: /SCALE is exact in doubles
LR = 0.5         # power of two: lr·g is exact


def _z_expr(weights: list[float], xs: list[Column]) -> Column:
    """w·x, strictly left-associative (see module doc)."""
    z = F.lit(float(weights[0])) * xs[0]
    for w, x in zip(weights[1:], xs[1:]):
        z = z + F.lit(float(w)) * x
    return z


def _sigmoid(z: Column) -> Column:
    return F.lit(0.5) + F.lit(0.5) * z / (F.lit(1.0) + F.abs(z))


def train_logreg(
    df: DataFrame,
    features: list[Column],
    label: Column,
    n_iters: int = 3,
    lr: float = LR,
    scale: int = SCALE,
) -> list[float]:
    """Learn logistic-regression weights; returns k floats.

    Deterministic for a fixed input SET: the per-iteration gradient is a sum
    of BIGINTs, so partitioning, task order, and engine cannot change it.
    The driver-side weight update replays in any engine as
    ``w_j - lr * (G_j / scale / n)`` (each op correctly rounded, same
    order).  Weights start at 0 (the deterministic seed)."""
    k = len(features)
    feat = df.select(
        *[fx.cast("double").alias(f"x{j}") for j, fx in enumerate(features)],
        label.cast("double").alias("y"),
    )
    n = feat.count()
    if n == 0:
        raise ValueError("cannot train on an empty frame")
    w = [0.0] * k
    xs = [F.col(f"x{j}") for j in range(k)]
    for _ in range(n_iters):
        resid = _sigmoid(_z_expr(w, xs)) - F.col("y")
        row = feat.agg(
            *[
                F.sum(F.floor(resid * xs[j] * F.lit(float(scale))).cast("long")).alias(f"g{j}")
                for j in range(k)
            ]
        ).first()
        w = [w[j] - lr * (row[f"g{j}"] / float(scale) / n) for j in range(k)]
    return w


def predict_expr(weights: list[float], features: list[Column]) -> Column:
    """P(y=1|x) as a pure codegen column — score with the learned model
    without leaving the JVM."""
    return _sigmoid(_z_expr(weights, features))


def logreg_sql(
    feats_cte: str,
    feature_sql: list[str],
    label_sql: str,
    n_iters: int = 3,
    lr: float = LR,
    scale: int = SCALE,
) -> str:
    """The EXACT DuckDB replay of ``train_logreg`` as chained one-row CTEs:
    ``feats_cte`` must define a relation ``feats`` whose rows yield the
    feature/label expressions.  Returns a WITH-chain ending in a one-row
    relation ``wN`` with columns w0..w{k-1} — compose a scoring SELECT after
    it.  Generated (not hand-written) so the operation sequence cannot
    drift from the Spark side."""
    k = len(feature_sql)
    xs = [f"(CAST({e} AS DOUBLE))" for e in feature_sql]
    y = f"(CAST({label_sql} AS DOUBLE))"
    parts = [
        feats_cte,
        "n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM feats)",
        "w0 AS (SELECT " + ", ".join(f"0.0 AS w{j}" for j in range(k)) + ")",
    ]
    for it in range(n_iters):
        z = f"(w{it}.w0 * {xs[0]})"
        for j in range(1, k):
            z = f"({z} + w{it}.w{j} * {xs[j]})"
        sig = f"(0.5 + 0.5 * {z} / (1.0 + abs({z})))"
        resid = f"({sig} - {y})"
        grads = ", ".join(
            f"CAST(sum(CAST(floor({resid} * {xs[j]} * {float(scale)}) AS BIGINT)) AS BIGINT) AS g{j}"
            for j in range(k)
        )
        parts.append(f"g{it} AS (SELECT {grads} FROM feats CROSS JOIN w{it})")
        upd = ", ".join(
            f"w{it}.w{j} - {float(lr)} * (CAST(g{it}.g{j} AS DOUBLE) / {float(scale)} / n.n) AS w{j}"
            for j in range(k)
        )
        parts.append(f"w{it + 1} AS (SELECT {upd} FROM w{it} CROSS JOIN g{it} CROSS JOIN n)")
    return "WITH " + ",\n            ".join(parts)


def logreg_score_sql(w_rel: str, feature_sql: list[str]) -> str:
    """SQL scoring expression for the trained model: the identical
    left-associative z and rational sigmoid, reading weights from the
    one-row relation ``w_rel`` (e.g. the chain's final ``w3``)."""
    xs = [f"(CAST({e} AS DOUBLE))" for e in feature_sql]
    z = f"({w_rel}.w0 * {xs[0]})"
    for j in range(1, len(xs)):
        z = f"({z} + {w_rel}.w{j} * {xs[j]})"
    return f"(0.5 + 0.5 * {z} / (1.0 + abs({z})))"
