"""Distributed n-gram language-model training + perplexity-style scoring.

The standard quality filter in large-scale LLM data pipelines (CCNet —
Wenzek et al. 2020; the same idea drives the Gopher/RefinedWeb quality
stages) scores every document by an n-gram language model's average
log-probability and drops the tail.  This module trains a word-bigram LM
with add-one (Laplace) smoothing as plain DataFrame aggregates and scores
documents with a deterministic fixed-point device, so the scores are
bit-identical at any parallelism AND reproducible in DuckDB:

    P(w2 | w1) = (c(w1, w2) + 1) / (c(w1) + V)

    contrib_micro = CAST(round(ln(P) * 1e6) AS BIGINT)   # per bigram
    score_micro   = SUM(contrib_micro)                    # per doc
    avg_logp      = score_micro / (1e6 * n_bigrams)       # one IEEE div

Float sums are order-dependent, so the per-bigram ln is rounded to
micro-units and summed as BIGINT (the operators/ranking.py BM25 device);
everything before the single ln is exact integer arithmetic plus one
correctly-rounded IEEE division.

Scale shape (100 TB corpus):

* bigram/unigram extraction is a shuffle-free HOF projection + explode
  (no window over token rows — adjacent pairs are formed INSIDE the
  token array);
* training is two hash aggregates with map-side partial combine; the
  ``min_count`` prune bounds the model tables (prune-then-store is how
  real n-gram LMs like KenLM ship);
* V (vocabulary size, BEFORE pruning — smoothing needs the true event
  space) travels as a ONE-ROW broadcast frame, never a driver collect
  (operators/assoc.py convention);
* scoring joins each document's bigram occurrences against the model —
  equi joins on (w1, w2) / (w1) that AQE demotes to broadcasts when the
  pruned model fits (the common case after min_count), and the natural
  hot keys ("of the"-class bigrams) sit on the build side where they
  cost nothing;
* OOV semantics: an unseen bigram backs off to c(w1,w2)=0 and an unseen
  left context to c(w1)=0 — both the genuine Laplace values, via
  coalesce after left joins, NOT row drops.

Training/scoring on the same corpus (the query surface below) is the
self-scoring degenerate case; production trains on a held reference
corpus (CCNet uses Wikipedia) and scores the crawl — same plan, two
inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.functions.text import (
    bind_once,
    word_tokens,
)

_MICRO = 1_000_000


def doc_bigrams(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, w1, w2) — one row per adjacent word-token pair occurrence.

    Tokenization is functions/text.word_tokens (lowercased, Unicode-aware
    split).  Docs with < 2 tokens emit no rows.  Shuffle-free: the pair
    list is zipped from the bound token array (bind_once — tokenizing
    exactly once per row; the original element_at-in-lambda form re-split
    the whole document PER PAIR, quadratic in document length: 36× slower
    at sf1, caught by the sf10 sweep), then exploded.
    """

    def _pairs(tk):
        m = F.greatest(F.size(tk) - 1, F.lit(0))
        return F.zip_with(
            F.slice(tk, 1, m),
            F.slice(tk, 2, m),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )

    pairs = bind_once(word_tokens(F.col(text_col)), _pairs)
    return docs.select(F.col(id_col), F.explode(pairs).alias("_bg")).select(
        id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2")
    )


def train_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """→ (unigrams(w, c1), bigrams(w1, w2, c12), vocab(_v)).

    Counts are token OCCURRENCES (not document frequencies).  Rows below
    ``min_count`` are pruned from the shipped model tables — the Laplace
    backoff treats them as unseen, which only ever LOWERS a pruned
    event's probability (the conservative direction for a quality
    filter).  ``vocab`` is a one-row frame holding V, the distinct
    unigram count BEFORE pruning (smoothing's event space must not
    shrink with the prune).
    """
    toks = docs.select(
        F.explode(word_tokens(F.col(text_col))).alias("w")
    )
    unigrams = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    vocab = unigrams.agg(F.count(F.lit(1)).alias("_v"))
    bigrams = (
        doc_bigrams(docs, text_col, id_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    if min_count > 1:
        unigrams = unigrams.where(F.col("c1") >= min_count)
        bigrams = bigrams.where(F.col("c12") >= min_count)
    return unigrams, bigrams, vocab


def score_docs_bigram(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, n_bigrams, score_micro, avg_logp) for every doc with >= 1
    bigram.

    avg_logp is the add-one-smoothed average bigram log-probability —
    higher (closer to 0) = more LM-like text; filter the low tail.  The
    value is one IEEE division of two exactly-representable integers
    (BIGINT micro-sum / BIGINT n*1e6), so it replays bit-for-bit in the
    DuckDB twin.
    """
    bg = doc_bigrams(docs, text_col, id_col)
    uni_w1 = unigrams.select(F.col("w").alias("w1"), "c1")
    joined = (
        bg.join(bigrams, ["w1", "w2"], "left")
        .join(uni_w1, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.coalesce(F.col("c12"), F.lit(0)).alias("_c12"),
            F.coalesce(F.col("c1"), F.lit(0)).alias("_c1"),
            F.col("_v"),
        )
    )
    contrib = F.round(
        F.log(
            (F.col("_c12") + 1).cast("double")
            / (F.col("_c1") + F.col("_v")).cast("double")
        )
        * F.lit(_MICRO)
    ).cast("long")
    return (
        joined.select(F.col(id_col), contrib.alias("_m"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("_m").alias("score_micro"),
        )
        .withColumn(
            "avg_logp",
            F.col("score_micro").cast("double")
            / (F.col("n_bigrams") * F.lit(_MICRO)).cast("double"),
        )
    )
