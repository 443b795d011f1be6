"""Deterministic logistic regression: partitioning-invariant weights, real
learning signal, scorer parity, and the Arrow plan gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.operators import learn, scoring


def _toy(spark, n_parts):
    # y = 1 iff x1 > 0.5, plus noise-free bias — cleanly learnable
    rows = [(float(i % 10) / 10.0, 1.0 if (i % 10) > 5 else 0.0) for i in range(200)]
    return spark.createDataFrame(rows, "x double, y double").repartition(n_parts)


def test_weights_partitioning_invariant(spark):
    """The r4 design point: integer-quantized gradient sums make training
    bit-identical under any partitioning (a plain double-sum trainer is
    not)."""
    feats = lambda: [F.lit(1.0), F.col("x")]  # noqa: E731
    w1 = learn.train_logreg(_toy(spark, 1), feats(), F.col("y"), n_iters=4)
    w13 = learn.train_logreg(_toy(spark, 13), feats(), F.col("y"), n_iters=4)
    assert w1 == w13  # bit-exact, not approximately


def test_model_actually_learns(spark):
    df = _toy(spark, 4)
    w = learn.train_logreg(df, [F.lit(1.0), F.col("x")], F.col("y"), n_iters=8)
    assert w[1] > 0.0  # positive slope on the informative feature
    scored = df.withColumn(
        "p", learn.predict_expr(w, [F.lit(1.0), F.col("x")])
    )
    auc_pairs = scored.select("p", "y").collect()
    hi = [r["p"] for r in auc_pairs if r["y"] == 1.0]
    lo = [r["p"] for r in auc_pairs if r["y"] == 0.0]
    assert min(hi) > max(lo)  # separable toy is fully separated


def test_scorer_matches_predict_expr(spark):
    """The Arrow scorer and the pure-JVM predict_expr are the same model —
    numpy and codegen double paths agree bit-for-bit on the shared
    left-associative formula."""
    w = [0.25, -0.5, 1.5]
    names = ["hash scan", "window", "a b c d", "", "x" * 40]
    pdf = pd.DataFrame({"name": names})
    got = scoring.make_logreg_scorer(w)(pdf)
    feats = [
        F.lit(1.0),
        F.least(F.length("name"), F.lit(20)) / F.lit(20.0),
        F.least(F.size(F.split(F.col("name"), " ")), F.lit(3)) / F.lit(3.0),
    ]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    exp = [
        r["p"]
        for r in df.select(learn.predict_expr(w, feats).alias("p")).collect()
    ]
    assert list(got) == exp


def test_learned_scorer_plan_stays_arrow(spark):
    df = spark.createDataFrame([("hash scan", "weapon")], ["name", "label"])
    out = scoring.score_mentions(df, scorer=scoring.make_logreg_scorer([0.1, 0.2, 0.3]))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_empty_frame_raises(spark):
    import pytest

    df = spark.createDataFrame([], "x double, y double")
    with pytest.raises(ValueError):
        learn.train_logreg(df, [F.col("x")], F.col("y"))


def test_sql_chain_replays_training(spark):
    """End-to-end engine-parity on the toy frame: DuckDB runs the generated
    CTE chain, Spark runs train_logreg — identical weights to the last
    bit."""
    import duckdb

    rows = [(float(i % 10) / 10.0, 1.0 if (i % 10) > 5 else 0.0) for i in range(200)]
    con = duckdb.connect()
    con.register("tbl", pd.DataFrame(rows, columns=["x", "y"]))
    con.execute("CREATE TABLE t AS SELECT * FROM tbl")
    sql = learn.logreg_sql(
        "feats AS (SELECT x, y FROM t)", ["1.0", "x"], "y", n_iters=4
    )
    duck_w = con.execute(sql + " SELECT w0, w1 FROM w4").fetchone()
    spark_w = learn.train_logreg(
        spark.createDataFrame(rows, "x double, y double"),
        [F.lit(1.0), F.col("x")],
        F.col("y"),
        n_iters=4,
    )
    assert list(duck_w) == spark_w
