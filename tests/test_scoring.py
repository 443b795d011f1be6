"""Batched mention scoring: stub determinism, pluggable scorer, Arrow plan."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.operators import scoring


def _mentions(spark):
    rows = [
        ("d1", "F-16", "aircraft", "the F-16 returned to base"),
        ("d1", "Eurofighter Typhoon", "aircraft", None),
        ("d2", "x", "unit", "short"),
        ("d2", "a" * 40, "unit", "c" * 500),  # caps: name→20, ctx→200
    ]
    return spark.createDataFrame(rows, ["doc", "name", "label", "context"])


def test_default_scorer_matches_local_formula(spark):
    got = {
        (r["name"], round(r["score"], 9))
        for r in scoring.score_mentions(_mentions(spark)).collect()
    }
    local = scoring.default_scorer(
        pd.DataFrame(
            {
                "name": ["F-16", "Eurofighter Typhoon", "x", "a" * 40],
                "label": ["aircraft", "aircraft", "unit", "unit"],
                "context": ["the F-16 returned to base", None, "short", "c" * 500],
            }
        )
    )
    want = {
        (n, round(float(s), 9))
        for n, s in zip(["F-16", "Eurofighter Typhoon", "x", "a" * 40], local)
    }
    assert got == want
    # scores are probabilities and monotone in the capped feature sum
    assert all(0.0 < s < 1.0 for _, s in got)


def test_custom_scorer_plugs_in(spark):
    def model(batch: pd.DataFrame) -> np.ndarray:
        # a stand-in for batched inference: one vectorized call per batch
        return np.where(batch["label"].to_numpy() == "aircraft", 0.9, 0.1)

    scored = scoring.score_mentions(_mentions(spark), scorer=model)
    by_label = {
        r["label"]: r["score"]
        for r in scored.select("label", "score").distinct().collect()
    }
    assert by_label == {"aircraft": 0.9, "unit": 0.1}

    kept = scoring.filter_scored(scored, threshold=0.5)
    assert {r["label"] for r in kept.collect()} == {"aircraft"}


def test_scoring_is_arrow_batched_not_row_python(spark):
    """The plan must carry the vectorized Arrow UDF node, not row-at-a-time
    BatchEvalPython (the north-star 'never per-row Python' clause)."""
    plan = scoring.score_mentions(_mentions(spark))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_missing_context_column_scores_as_empty(spark):
    no_ctx = _mentions(spark).select("doc", "name", "label")
    scored = scoring.score_mentions(no_ctx)
    row = {r["name"]: r["score"] for r in scored.collect()}
    local = scoring.default_scorer(
        pd.DataFrame({"name": ["F-16"], "label": ["aircraft"], "context": [None]})
    )[0]
    assert abs(row["F-16"] - float(local)) < 1e-12
