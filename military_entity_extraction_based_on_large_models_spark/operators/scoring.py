"""Batched model scoring of candidate mentions.

North-star clause: "gazetteer + trie/Aho-Corasick span matching plus batched
model scoring, never per-row Python".  The reference scores candidates with
one LLM call per document (entity_extract.py:34-52, qwen_entity_judge.py:
61-77 — a sequential HTTP loop); this stage is the Spark-native replacement
slot: candidate mentions flow through a ``pandas_udf`` in Arrow batches, the
scorer sees a WHOLE batch at once (the shape batched model inference wants —
an ONNX session / torch module / HTTP batch endpoint), and nothing executes
per-row in Python.

The default scorer is a deterministic lexical-confidence STUB (documented
fake — no model weights ship in this environment): a rational-sigmoid over
cheap lexical features, chosen to be pure double arithmetic so the driver
oracle replicates the stage end-to-end in ANSI SQL (same device as the
media-decode fake and the IVF/LSH plan-side constants).  A real model slots
in via ``scorer=`` with zero plan change — the UDF stays Arrow-batched.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# stub "model" weights: z = bias + w_name·min(|name|,20) + w_ctx·min(|ctx|,200)
_BIAS, _W_NAME, _W_CTX = -1.0, 0.15, 0.02
_NAME_CAP, _CTX_CAP = 20, 200


def default_scorer(batch: pd.DataFrame) -> np.ndarray:
    """Deterministic lexical-confidence stub (FAKE model — see module doc).

    score = 0.5 + 0.5·z/(1+|z|)  (rational sigmoid: exact double arithmetic,
    no libm exp whose last-ulp behavior differs across engines), with
    z = −1 + 0.15·min(|name|, 20) + 0.02·min(|context|, 200).
    """
    name_len = batch["name"].fillna("").str.len().clip(upper=_NAME_CAP)
    ctx_len = batch["context"].fillna("").str.len().clip(upper=_CTX_CAP)
    z = (_BIAS + _W_NAME * name_len + _W_CTX * ctx_len).to_numpy(dtype="float64")
    return 0.5 + 0.5 * z / (1.0 + np.abs(z))


# the same stub as a DuckDB/ANSI-SQL expression — oracle parity
def default_scorer_sql(name_expr: str, ctx_expr: str) -> str:
    z = (
        f"({_BIAS} + {_W_NAME} * least(length(coalesce({name_expr}, '')), {_NAME_CAP})"
        f" + {_W_CTX} * least(length(coalesce({ctx_expr}, '')), {_CTX_CAP}))"
    )
    return f"(0.5 + 0.5 * {z} / (1.0 + abs({z})))"


def make_logreg_scorer(weights: list[float]) -> Callable[[pd.DataFrame], np.ndarray]:
    """A REAL learned model for the scoring slot: rational-sigmoid logistic
    regression over name features (bias, capped name length /20, capped
    word count /3) with weights from ``learn.train_logreg``.  numpy
    elementwise IEEE ops in the same left-associative order as the trainer
    and the SQL oracle, so scores replay bit-exactly in any engine."""
    w0, w1, w2 = (float(w) for w in weights)

    def scorer(batch: pd.DataFrame) -> np.ndarray:
        names = batch["name"].fillna("")
        x1 = np.minimum(names.str.len().to_numpy(dtype="float64"), 20.0) / 20.0
        words = names.str.count(" ").to_numpy(dtype="float64") + 1.0
        x2 = np.minimum(words, 3.0) / 3.0
        z = (w0 * 1.0) + w1 * x1
        z = z + w2 * x2
        return 0.5 + 0.5 * z / (1.0 + np.abs(z))

    return scorer


def score_mentions(
    mentions: DataFrame,
    scorer: Callable[[pd.DataFrame], np.ndarray] | None = None,
    score_col: str = "score",
) -> DataFrame:
    """Attach a model confidence to every candidate mention row.

    ``scorer(batch) -> float array`` receives a pandas frame with columns
    (name, label, context) — one call per Arrow batch (sized by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``), never per row.  The
    callable must be picklable (cloudpickle: module functions, lambdas, and
    bound model objects all work); heavyweight models should lazy-load
    per-executor inside the callable and cache on an attribute or module
    global, exactly like extract._get_automaton caches the Aho-Corasick
    automaton.
    """
    fn = scorer or default_scorer

    @pandas_udf("double")
    def _score(name: pd.Series, label: pd.Series, context: pd.Series) -> pd.Series:
        out = fn(pd.DataFrame({"name": name, "label": label, "context": context}))
        return pd.Series(np.asarray(out, dtype="float64"))

    ctx = (
        F.col("context")
        if "context" in mentions.columns
        else F.lit(None).cast("string")
    )
    return mentions.withColumn(
        score_col, _score(F.col("name"), F.col("label"), ctx)
    )


def filter_scored(
    mentions: DataFrame, threshold: float = 0.5, score_col: str = "score"
) -> DataFrame:
    """Confidence gate — the reference's judge-accept step as a filter."""
    return mentions.where(F.col(score_col) >= threshold)
