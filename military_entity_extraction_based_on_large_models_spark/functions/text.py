"""Text-analysis column functions for corpus curation at scale.

All pure column expressions (JVM codegen; no Python), designed to be
DuckDB-oracle-expressible so the driver's correctness gate covers them:

* token_count       — whitespace tokenization count
* quality features  — length, punctuation ratio, stopword ratio, mean token
                      length, and a composite quality score
* fingerprint       — md5 document fingerprint (exact-dup key)
* shingles          — word n-gram array (dedup/minhash input)
* lang_id           — tiny deterministic n-gram/stopword heuristic (its word
                      lists are arbitrary; the semantics — argmax of per-
                      language evidence counts — mirror public langid designs)
* chunk_texts       — token-window chunking with overlap (LLM training-
                      window prep)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# explicit whitespace class, identical under Java regex (Spark) and RE2
# (DuckDB oracle): Java's \s includes \x0B, RE2's does not
WS_CLASS = "[ \\t\\n\\x0B\\f\\r]"

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on", "for",
]

# tiny per-language evidence lists for the heuristic language identifier
LANG_EVIDENCE: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "die", "und", "ist"],
    "fr": ["le", "la", "et", "est"],
}


def bind_once(expr: Column, body) -> Column:
    """Evaluate ``expr`` ONCE per row and pass the VALUE into ``body``.

    A higher-order-function lambda that references an outer expression
    TREE re-evaluates that tree for EVERY array element — codegen's
    common-subexpression elimination does not span HOF lambda bodies, so
    ``transform(sequence(...), lambda i: element_at(tokens(text), i))``
    re-runs the full tokenizing regex split per element: O(T) splits of
    the whole document per row, O(T²·len) work (measured 36× on the
    bigram builder at sf1; the dedup.py minhash docstring records the
    same hazard).  Wrapping the expression as the sole element of an
    array and mapping ``body`` over it binds the evaluated VALUE to a
    lambda variable — lambda variables are row values, immune to both
    per-element re-evaluation and optimizer re-inlining
    (CollapseProject cannot substitute into a lambda binding).

    ``body``: Column -> Column, receives the bound value.
    """
    return F.get(F.transform(F.array(expr), body), 0)


def tokens(col: Column) -> Column:
    """Whitespace tokens, empties removed (BPE-ish splitting is regex-based:
    split on any non-word run).  The whitespace class is EXPLICIT because the
    oracle runs on RE2, whose \\s lacks Java's vertical tab (r3 review)."""
    return F.filter(F.split(col, WS_CLASS + "+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def word_tokens(col: Column) -> Column:
    """Lowercased word tokens split on non-letter/digit runs (Unicode-aware:
    accented characters are letters, not separators — the ASCII class
    mangled the de/fr text lang_id explicitly supports; r3 review)."""
    return F.filter(
        F.split(F.lower(col), r"[^\p{L}\p{N}]+"), lambda t: t != ""
    )


def _gram_at(toks: Column, i: Column, n: int) -> Column:
    """The n-gram starting at 0-based position ``i`` of a BOUND token array,
    assembled with element_at + concat instead of slice + concat_ws: the
    slice allocated a fresh n-element array per position and concat_ws then
    walked it — measured 3.7× slower at sf1 for the 50k-doc shingle pass.
    Tokens are never null (split yields strings, empties filtered), so
    concat ≡ concat_ws here and the produced strings are bit-identical."""
    parts: list[Column] = []
    for k in range(n):
        if k:
            parts.append(F.lit(" "))
        parts.append(F.element_at(toks, i + F.lit(k + 1)))
    return F.concat(*parts)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are not letter/digit/space
    (Unicode-aware — see word_tokens)."""
    stripped = F.regexp_replace(col, r"[\p{L}\p{N} \t\n\x0B\f\r]", "")
    return F.when(
        F.length(col) > 0, F.length(stripped).cast("double") / F.length(col)
    ).otherwise(F.lit(0.0))


def stopword_ratio(col: Column) -> Column:
    toks = word_tokens(col)
    stops = F.filter(toks, lambda t: t.isin(STOPWORDS))
    return F.when(
        F.size(toks) > 0, F.size(stops).cast("double") / F.size(toks)
    ).otherwise(F.lit(0.0))


def mean_token_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(
        F.size(toks) > 0, total.cast("double") / F.size(toks)
    ).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite curation score in [0,1]: rewards moderate length and normal
    punctuation/stopword profiles (public-heuristic style, cf. C4/Gopher
    rules)."""
    length_ok = F.when(
        (F.length(col) >= 20) & (F.length(col) <= 5000), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(col) <= 0.6, F.lit(1.0)).otherwise(F.lit(0.0))
    tok_ok = F.when(
        (mean_token_len(col) >= 2.0) & (mean_token_len(col) <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    return (length_ok + punct_ok + stop_ok + tok_ok) / F.lit(4.0)


def fingerprint(col: Column) -> Column:
    """Exact-duplicate key: md5 over whitespace-normalized lowercase text.

    Collapse runs FIRST, then trim: trim() strips only ASCII spaces, so
    trimming first left a trailing tab/newline behind as a distinct
    fingerprint ('abc ' vs 'abc\\n' — r3 review)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), WS_CLASS + "+", " ")))


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram array over lowercased word tokens (minhash/jaccard input).

    The token array is bound ONCE (bind_once): referenced directly inside the
    per-position lambda, the full regex split re-ran for EVERY shingle —
    O(T) splits per row, the same quadratic-HOF hazard bind_once documents
    (measured at sf1: 2.33 s → 0.99 s for the 50k-doc shingle pass, values
    bit-identical)."""

    def body(toks: Column) -> Column:
        return F.when(F.size(toks) >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: _gram_at(toks, i, n),
                )
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))

    return bind_once(word_tokens(col), body)


def char_shingles(col: Column, n: int = 3) -> Column:
    """Character n-gram array over the lowercased string (fuzzy name
    blocking/verification input).  For strings shorter than n, the single
    (short) string itself is the shingle set.  The lowered string is bound
    once — inlined in the lambda it would re-lower per position (same
    hazard as ``shingles``, linear-sized here but still O(len) re-lowers)."""

    def body(lowered: Column) -> Column:
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.length(lowered) - n, F.lit(0))),
                lambda i: lowered.substr(i + F.lit(1), F.lit(n)),
            )
        )

    return bind_once(F.lower(col), body)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays.

    |A ∪ B| is computed as |A| + |B| − |A ∩ B| — exact for the
    distinct-element arrays this contract requires — so only the intersect
    walks the data; the array_union hash-set build per pair is dropped
    (values bit-identical: same ints, same division)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def lang_evidence(col: Column, lang: str) -> Column:
    toks = word_tokens(col)
    return F.size(F.filter(toks, lambda t: t.isin(LANG_EVIDENCE[lang])))


def lang_id(col: Column) -> Column:
    """argmax of per-language stopword evidence; 'und' (undetermined) when no
    evidence at all."""
    pairs = [
        F.struct(lang_evidence(col, lang).alias("n"), F.lit(lang).alias("lang"))
        for lang in sorted(LANG_EVIDENCE)
    ]
    best = F.array_max(F.array(*pairs))  # max by (n, then lang desc)
    return F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und"))


def chunk_texts(col: Column, size: int = 64, overlap: int = 16) -> Column:
    """Token-window chunks: array of strings, each ``size`` whitespace tokens,
    consecutive chunks overlapping by ``overlap`` (the standard LLM
    training-window prep).  Pure column expressions (codegen, no Python):
    start indices via ``sequence`` with step size−overlap, chunk assembly via
    ``slice`` + ``concat_ws``.  Zero-token documents produce zero chunks; a
    final partial window is kept (training pipelines pad it downstream)."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    step = size - overlap

    # tokenize ONCE per row (bind_once): with the token expression inlined
    # in the chunk lambda, every chunk re-ran the full split — quadratic in
    # document length (the doc_bigrams 36× bug, caught by the sf10 sweep)
    def _chunks(tk: Column) -> Column:
        n = F.size(tk)
        starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(step))
        return F.when(n > 0,
            F.transform(
                F.filter(starts, lambda s: s < n),
                lambda s: F.concat_ws(" ", F.slice(tk, s + 1, size)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return bind_once(tokens(col), _chunks)


# PII scrubbing patterns — shared literal character-class syntax so Java
# regex (Spark) and RE2 (DuckDB oracle) match IDENTICAL spans; no \b, no \d
# shorthand (dialect-divergent on Unicode), no backtracking constructs.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PII_LONG_NUMBER = "[0-9][0-9][0-9][0-9][0-9][0-9]+"  # >= 6 consecutive digits


def scrub_pii(col: Column) -> Column:
    """Replace email addresses and long digit runs (IDs, phone-ish numbers)
    with typed placeholder tokens — the standard pre-training cleanup pass,
    as a pure codegen expression (two regexp_replace, no Python).  Email
    first: a scrubbed email must not leave its digits for the number pass."""
    no_email = F.regexp_replace(col, PII_EMAIL, "<EMAIL>")
    return F.regexp_replace(no_email, PII_LONG_NUMBER, "<NUM>")


def pii_count(col: Column, pattern: str) -> Column:
    """Occurrences of a PII pattern (audit metric for the scrub pass)."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def ngram_list(col: Column, n: int) -> Column:
    """Word n-gram MULTISET — order preserved, duplicates kept (the
    repetition-feature input; ``shingles`` dedups for Jaccard/minhash).
    Docs shorter than n tokens yield their whole token string as the one
    pseudo-gram, mirroring ``shingles``' fallback.  Tokens bound once —
    inlined, the split re-ran per gram position (quadratic; see
    ``shingles``)."""

    def body(toks: Column) -> Column:
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: _gram_at(toks, i, n),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))

    return bind_once(word_tokens(col), body)


def _bind_once(arr: Column, body) -> Column:
    """Evaluate the array expression ONCE and pass it to ``body`` as a bound
    lambda VALUE — every plain-Column reference would re-evaluate the whole
    expression per use (higher-order functions sit outside codegen and CSE;
    same hazard minhash_band_buckets documents)."""
    return F.get(F.transform(F.array(arr), body), 0)


def dup_ngram_frac(col: Column, n: int = 5) -> Column:
    """Fraction of word n-grams that are repeats of an earlier one —
    1 - distinct/total (0.0 for docs shorter than n tokens).  The
    repetition signal of the public Gopher-style quality rules, over
    n-grams instead of lines (synthetic corpora and much web text carry no
    newline structure)."""

    def body(grams):
        total = F.size(grams)
        return F.when(
            total > 0,
            1.0 - F.size(F.array_distinct(grams)).cast("double") / total.cast("double"),
        ).otherwise(F.lit(0.0))

    return _bind_once(ngram_list(col, n), body)


def top_ngram_frac(col: Column, n: int = 2) -> Column:
    """Fraction of all word n-grams taken by the single most frequent one
    (Gopher's top-n-gram rule).  Per distinct gram, count its occurrences
    with a filter scan — O(d·t) per row on per-document-small arrays; the
    gram array is bound once."""

    def body(grams):
        total = F.size(grams)
        counts = F.transform(
            F.array_distinct(grams),
            lambda d: F.size(F.filter(grams, lambda x: x == d)),
        )
        return F.when(
            total > 0,
            F.array_max(counts).cast("double") / total.cast("double"),
        ).otherwise(F.lit(0.0))

    return _bind_once(ngram_list(col, n), body)
