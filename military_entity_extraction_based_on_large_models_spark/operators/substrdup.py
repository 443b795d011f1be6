"""Exact substring-duplication spans: the suffix-array dedup of
"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
2021), re-expressed relationally at k-gram granularity.

MinHash/SimHash (dedup.py) and the exact set-similarity join (setsim.py)
operate on WHOLE documents; training corpora also rot from PARTIAL
duplication — boilerplate headers, license blocks, quoted passages —
where the document as a whole is unique but long internal substrings
repeat across the corpus.  Lee et al. remove every substring of ≥ N
tokens that appears more than once, using a suffix array; a suffix array
is a sequential in-memory structure, so the Spark-first form is the
k-gram equivalent, which needs only hash aggregation and one window:

1. explode each doc into its ``n − k + 1`` overlapping k-grams (token
   granularity, the text.py whitespace convention) with positions;
2. a k-gram is DUPLICATED iff it occurs ≥ 2 times in the corpus (any
   two occurrences — cross- or within-doc, exactly the suffix-array
   semantics: within-doc repetition is still memorizable content);
3. per doc, duplicated k-gram positions cover token intervals
   ``[pos, pos + k)``; merging overlap/adjacency (the intervals.py
   gaps-and-islands running-max idiom, integer token coordinates)
   yields the MAXIMAL duplicated spans — identical to the set of
   maximal repeated substrings of length ≥ k, because every repeated
   substring of length m ≥ k is covered by its m − k + 1 duplicated
   k-grams and conversely.

Exactness: the k-gram key is the JOINED TOKEN STRING itself, not a hash,
so there are no collisions and the DuckDB twin replays bit-for-bit.  At
100 TB substitute ``F.xxhash64(gram)`` for the string key (documented
swap, collision odds ~n²/2⁶⁴) — the plan is unchanged, the shuffle rows
shrink from strings to 8 bytes.

Scale shape: one explode to one row per token position (so the gram
STRING column is ×k bytes of the input — this is exactly what the
xxhash64 swap eliminates at scale, hashing before the shuffle so both
the aggregate and the join move 8-byte keys), one k-gram count aggregate
(map-side partial: duplicated grams collapse early), one equi join of
positions against the duplicated gram set (AQE-splittable; the
duplicated-gram frame is usually tiny relative to positions), one
per-doc window for the island merge (per-doc sequential — bounded by
document length, the sessionize skew ruling), one (doc, island)
aggregate.  Nothing quadratic anywhere: corpus-wide duplication cost is
O(total tokens), vs the suffix array's O(n log n) single machine.

Reference anchor: the reference deduplicates mentions only
(deduplicate_entities, utils.py:41-60); corpus-level substring hygiene
is the training-data-pipeline extension mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.functions.text import (
    tokens,
)


def _kgram_positions(
    docs: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(doc_id, n_tokens, pos, gram): every k-gram with its 0-based token
    position; docs shorter than k tokens contribute no positions but are
    kept in stats via n_tokens."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_t")
    ).select("doc_id", "_t", F.size("_t").cast("bigint").alias("n_tokens"))
    pos = F.explode(
        F.when(
            F.col("n_tokens") >= k,
            F.sequence(F.lit(0), F.col("n_tokens") - k),
        ).otherwise(F.array().cast("array<bigint>"))
    ).alias("pos")
    return toks.select("doc_id", "n_tokens", "_t", pos).select(
        "doc_id",
        "n_tokens",
        "pos",
        # separator is a space: tokens are whitespace-split so none
        # contains one; any other byte could legally appear inside a token
        F.array_join(
            F.slice("_t", F.col("pos").cast("int") + 1, k), " "
        ).alias("gram"),
    )


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    hash_grams: bool = False,
) -> DataFrame:
    """Maximal duplicated token spans per document →
    ``(doc_id, span_start, span_end, n_grams)``.

    A span ``[span_start, span_end)`` (0-based token indices) is a
    maximal run of tokens every one of which lies inside some k-gram
    occurring ≥ 2 times in the corpus; ``n_grams`` counts the duplicated
    k-grams merged into the span.  Every substring of ≥ k tokens that
    appears twice anywhere in the corpus is contained in such a span.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    grams = _kgram_positions(docs, id_col, text_col, k)
    if hash_grams:
        # the 100 TB shuffle-width variant (module docstring): the count
        # aggregate and the join move 8-byte keys instead of ~k-token
        # strings; collision odds ~n²/2⁶⁴ — property-tested equal to the
        # exact string path on every fixture
        grams = grams.withColumn("gram", F.xxhash64("gram"))
    dup = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_occ"))
        .where(F.col("_occ") >= 2)
        .select("gram")
    )
    hits = grams.join(dup, "gram").select(
        "doc_id", "pos", (F.col("pos") + k).alias("_end")
    )
    # gaps-and-islands over token coordinates (intervals.py idiom): all
    # hit intervals have equal length k, so position order IS (start,
    # end) order and the running max degenerates to the previous end —
    # kept as running max anyway for the shared shape
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_max_end = F.max("_end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_max_end.isNull() | (F.col("pos") > prev_max_end), F.lit(1)
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = hits.withColumn("_island", F.sum(is_new).over(run))
    return (
        marked.groupBy("doc_id", "_island")
        .agg(
            F.min("pos").alias("span_start"),
            F.max("_end").alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select("doc_id", "span_start", "span_end", "n_grams")
    )


def duplicate_span_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Per-document duplication coverage →
    ``(doc_id, n_tokens, dup_tokens, dup_micro)``.

    ``dup_tokens`` = tokens covered by some duplicated span (union, no
    double counting); ``dup_micro`` = floor(10⁶ · dup_tokens / n_tokens)
    — the integer-rational fraction convention (0 for empty docs).  The
    curation decision feed: drop or trim documents above a duplication
    budget.  Docs with no duplicated span appear with dup_tokens = 0 —
    the left join keeps curation totals honest.
    """
    spans = duplicate_spans(docs, id_col, text_col, k)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens")
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
    )
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("dup_tokens"), F.lit(0)).alias("dup_tokens"),
        F.when(F.col("n_tokens") > 0,
               F.expr("coalesce(dup_tokens, 0) * 1000000 DIV n_tokens"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("dup_micro"),
    )


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_span: int | None = None,
) -> DataFrame:
    """Cut duplicated spans out of every document →
    ``(doc_id, clean_text, n_tokens, kept_tokens)``.

    The trim stage of Lee et al.'s pipeline, in its AGGRESSIVE variant:
    every span from :func:`duplicate_spans` of at least ``min_span``
    tokens (default k — all spans) is removed from EVERY document
    containing it, and the survivors are re-joined with single spaces.
    Lee et al. keep one copy per duplicate cluster; that needs a global
    choice of canonical occurrence (an extra CC-style pass over span
    overlap — compose with canonicalize if needed).  Removing all copies
    is the deliberately simpler contract stated here: correct for
    boilerplate/license stripping, lossy for content that exists ONLY as
    duplicates.  Documents whose every token is duplicated come back with
    empty ``clean_text`` rather than vanishing.

    Scale shape: duplicate_spans' plan, plus one per-doc span collect
    (bounded: ≤ n_tokens/k spans per doc), a broadcast-free join back to
    the token arrays, and a pure-codegen filter-by-position rebuild —
    no Python in the row path.
    """
    if min_span is not None and min_span < k:
        raise ValueError("min_span must be >= k")
    spans = duplicate_spans(docs, id_col, text_col, k)
    if min_span is not None:
        spans = spans.where(
            F.col("span_end") - F.col("span_start") >= min_span
        )
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_t")
    )
    joined = base.join(per_doc, "doc_id", "left")
    covered = lambda i: F.exists(  # noqa: E731
        F.col("_spans"),
        lambda s: (s["span_start"] <= i) & (i < s["span_end"]),
    )
    kept = F.when(F.col("_spans").isNull(), F.col("_t")).otherwise(
        F.filter(
            F.col("_t"),
            lambda t, i: ~covered(i.cast("bigint")),
        )
    )
    return joined.select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size("_t").cast("bigint").alias("n_tokens"),
        F.size(kept).cast("bigint").alias("kept_tokens"),
    )
