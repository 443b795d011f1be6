"""Winnowing fingerprints (MOSS) and code-clone pair detection.

The reference corpus is source code (BASELINE.json input_hint: repo /
path / commit / lang / content), and the canonical algorithm for
detecting *partial* overlap between code files — shared functions,
vendored snippets, assignment plagiarism — is winnowing (Schleimer,
Wilkerson, Aiken, SIGMOD 2003: the MOSS fingerprinting scheme).  Unlike
the whole-document fingerprint (functions/text.fingerprint_text) or the
set-similarity near-dup family (operators/dedup), winnowing guarantees:
any shared substring of length >= w + k - 1 between two documents
produces at least one IDENTICAL selected fingerprint in both — a
*local* detection guarantee that MinHash (a global set sketch) cannot
give.

Algorithm (per document, exactly the paper's scheme):

1. normalize: lowercase + collapse whitespace runs to one space + trim
   (the shared-dialect explicit class from functions/text.py — never
   ``\\s``);
2. hash every k-gram: h_i = 40-bit integer from md5 of the k-char
   substring at position i (the cross-engine md5->BIGINT device from
   operators/ranking.py — both engines compute the identical value);
3. winnow: slide a window of w consecutive k-gram hashes; in each
   window select the minimum hash, breaking ties by RIGHTMOST position
   (the paper's robust-winnowing tie rule); the fingerprint set is the
   distinct selected (hash, position) pairs.

Cross-engine determinism device: selection needs argmin-with-tie-break
inside a sliding window, which plain SQL cannot express as one
aggregate.  We fold (hash, position) into ONE BIGINT key

    key_i = h_i * 2^POS_BITS + (2^POS_BITS - 1 - i)

so ``min(key)`` over a window IS lexicographic min on (hash, -position)
— i.e. smallest hash, rightmost position on ties — and both engines
agree bit-for-bit with a plain integer ``min``.  h_i < 2^40 and
i < 2^20, so key < 2^60: no BIGINT overflow.  Documents longer than
2^20 - 1 normalized chars would alias positions; ``winnow_fingerprints``
fails fast on them (a 1 MiB single *document* is a corpus bug at this
layer — chunk first with functions/text.chunk_texts).

Scale shape (100 TB corpus):

* fingerprint extraction is ONE shuffle-free codegen projection —
  nested higher-order functions (transform / slice / array_min) over
  the content column, no Python, no window shuffle (the per-position
  sliding window is evaluated as array slices INSIDE the row, so the
  engine never materializes position rows across the cluster);
* cost per doc is O(n * k) hashing + O(n * w) window mins — k and w
  are small constants (defaults 8 and 4);
* ``clone_pairs`` joins fingerprint postings on the fingerprint value —
  an equi join, never all-pairs; ubiquitous fingerprints (boilerplate
  grams shared by half the corpus — the hot keys) are dropped by the
  ``max_df`` document-frequency cap, a DOCUMENTED semantic exactly like
  ``pairs_from_buckets``'s mega-bucket cap, so no reducer sees a
  quadratic bucket;
* the containment denominator uses the PRE-cap per-doc fingerprint
  counts, so the df cap only removes candidate evidence, it never
  inflates scores.

Reference anchors: the reference deduplicates extracted entities by
exact identity only (reflect_workflow1.py:44-53) and has no sub-document
overlap detection; this module is part of the "training-data pipeline"
operator family the round brief mandates beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Shared-dialect whitespace class (Java \s includes \x0B, RE2's does not).
_WS_RUN = "[ \\t\\n\\x0B\\f\\r]+"

POS_BITS = 20
_POS_MOD = 1 << POS_BITS  # 1048576
_MAX_POS = _POS_MOD - 1


def normalized_text(col: F.Column) -> F.Column:
    """Lowercase, collapse whitespace runs to one space, trim."""
    return F.trim(F.regexp_replace(F.lower(col), _WS_RUN, " "))


def _gram_hash(sub: F.Column) -> F.Column:
    """40-bit integer hash of a k-gram: hex digits 4..13 of md5.

    Identical in DuckDB as CAST('0x' || substring(md5(g), 4, 10) AS
    BIGINT) — the operators/ranking.py device, narrowed to 10 hex chars
    so key packing stays under 2^60.
    """
    return F.conv(F.substring(F.md5(sub), 4, 10), 16, 10).cast("long")


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """(id_col, fp BIGINT, pos INT) — distinct winnowed fingerprints.

    ``pos`` is the 1-based position of the selected k-gram in the
    normalized text.  Documents shorter than k normalized chars emit no
    fingerprints (nothing to guarantee — no shared substring of the
    guarantee length can exist).  Documents with fewer than w k-grams
    get ONE window covering all their k-grams (the scheme degrades to
    "select the global min", preserving determinism).

    The plan is one shuffle-free projection + one explode: hashing and
    window selection run as nested HOFs inside the row.
    """
    if k < 1 or w < 1:
        raise ValueError("winnow_fingerprints: k and w must be >= 1")
    norm = normalized_text(F.col(text_col)) if normalize else F.col(text_col)
    d = docs.select(F.col(id_col), norm.alias("_norm"))
    npos = F.length("_norm") - F.lit(k - 1)
    # keys[i] = h_i * 2^POS_BITS + (POS_MOD - 1 - i): integer min == argmin
    # on (hash, rightmost position).  Guard sequence() against npos < 1 —
    # Spark's sequence(1, 0) infers step -1 and yields [1, 0].
    keys = F.when(
        npos > F.lit(_MAX_POS),
        F.raise_error(
            F.concat(
                F.lit(
                    "winnow_fingerprints: document exceeds 2^20 normalized "
                    "chars (position packing would alias); chunk first. id="
                ),
                F.col(id_col).cast("string"),
            )
        ).cast("array<bigint>"),
    ).when(
        npos >= 1,
        F.transform(
            F.sequence(F.lit(1), npos),
            lambda i: _gram_hash(F.col("_norm").substr(i, F.lit(k)))
            * F.lit(_POS_MOD)
            + (F.lit(_MAX_POS) - i),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    d = d.withColumn("_keys", keys)
    nwin = F.greatest(F.size("_keys") - F.lit(w - 1), F.lit(1))
    sel = F.when(
        F.size("_keys") >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), nwin),
                lambda s: F.array_min(F.slice(F.col("_keys"), s, w)),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    out = d.select(F.col(id_col), F.explode(sel).alias("_key"))
    return out.select(
        F.col(id_col),
        # integer shift, NOT `/`: the 60-bit key exceeds a double's 53-bit
        # mantissa, so float division mis-rounds the decoded hash.
        F.shiftright(F.col("_key"), POS_BITS).alias("fp"),
        (F.lit(_MAX_POS) - F.col("_key") % F.lit(_POS_MOD))
        .cast("int")
        .alias("pos"),
    )


def clone_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 2,
    min_score: float = 0.0,
    max_df: int | None = 1000,
    materialize: bool = True,
) -> DataFrame:
    """(id_a, id_b, shared, n_a, n_b, score) — clone candidate pairs.

    ``shared`` counts DISTINCT fingerprint values present in both docs;
    ``score`` is the containment shared / min(n_a, n_b) where n_* are
    each doc's distinct-fingerprint counts BEFORE the df cap (the cap
    can only lower scores, never inflate them).  Fingerprints appearing
    in more than ``max_df`` documents are dropped from pairing — the
    boilerplate/hot-key cap, a documented semantic (candidates whose
    ONLY shared grams are ubiquitous are not emitted); pass ``None``
    for exhaustive pairing.

    Plan: distinct fp postings (one aggregate), per-doc counts reused
    from the same shuffle, then ONE equi self-join on fp + one pair
    aggregate.  Never all-pairs.

    The postings frame feeds FOUR consumers (doc counts, df counts, both
    self-join sides), so by default it is pinned with a lazy
    ``localCheckpoint`` — without it the upstream fingerprint extraction
    (an md5 per character position) re-runs once per consumer, a ~6×
    waste that dominates at corpus scale (the operators/assoc.py
    rationale).  ``materialize=False`` keeps the plan fully lazy for
    callers that persisted their fingerprints already.
    """
    postings = fps.select(F.col(id_col).alias("id"), "fp").distinct()
    if materialize:
        postings = postings.localCheckpoint(eager=False)
    doc_n = postings.groupBy("id").agg(F.count("*").alias("n"))
    dfc = postings.groupBy("fp").agg(F.count("*").alias("df"))
    dfc = dfc.where(F.col("df") >= 2)
    if max_df is not None:
        dfc = dfc.where(F.col("df") <= max_df)
    pooled = postings.join(dfc.select("fp"), "fp")
    a = pooled.select(F.col("fp"), F.col("id").alias("id_a"))
    b = pooled.select(F.col("fp"), F.col("id").alias("id_b"))
    shared = (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    out = (
        shared.join(doc_n.select(F.col("id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .join(doc_n.select(F.col("id").alias("id_b"), F.col("n").alias("n_b")), "id_b")
        .withColumn(
            "score",
            F.col("shared").cast("double") / F.least("n_a", "n_b").cast("double"),
        )
    )
    if min_score > 0.0:
        out = out.where(F.col("score") >= min_score)
    return out.select("id_a", "id_b", "shared", "n_a", "n_b", "score")
