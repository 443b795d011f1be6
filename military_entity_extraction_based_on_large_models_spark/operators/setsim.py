"""Exact threshold set-similarity join via prefix filtering (AllPairs /
PPJoin family — Bayardo et al., WWW'07; Xiao et al., WWW'08).

The EXACT counterpart of the repo's probabilistic near-dup paths: MinHash
LSH (dedup.py) trades recall for speed; this operator returns EVERY pair
with Jaccard ≥ t and nothing else, still without an all-pairs scan.  The
prefix-filtering theorem does the pruning: order every set by one global
token order, keep each set's first ``p = n − ceil(t·n) + 1`` tokens —
any two sets with J ≥ t MUST share a prefix token (if their prefixes were
disjoint, the intersection could use at most the suffix tokens, bounding
J below t), so the candidate set built from a prefix-token equi-join is a
provable superset and the exact verify loses nothing.

Ordering tokens rarest-first (ascending document frequency) makes
prefixes maximally selective — common tokens land in suffixes and never
generate candidates, which is what keeps the candidate count near-linear
on Zipfian corpora at 100 TB.

Scale shape: one posting-list aggregate for document frequencies, one
per-doc sort aggregate to build the globally-ordered arrays, one
prefix-token equi-join (never Cartesian — plan-gated), distinct
candidate pairs, then a verify join that brings both ordered arrays to
the pair and computes the intersection JVM-side (``array_intersect`` on
DISTINCT elements).  A stop-token cap (``max_df``) is deliberately NOT
needed for correctness — frequent tokens prune themselves out of
prefixes — but extremely hot prefix tokens can still skew the candidate
join; the winnow.clone_pairs ``max_df`` cap is the documented opt-in for
that regime.

Determinism: the global order is ``(df, token)`` — total, engine-neutral.
The threshold is a RATIONAL ``(t_num, t_den)`` and every comparison is
integer (``inter·den ≥ num·union``; ceil via integer arithmetic), so the
pair set and the reported ``jaccard_micro`` replay bit-for-bit in SQL —
the doc_bm25 determinism convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def setsim_join(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "toks",
    t_num: int = 1,
    t_den: int = 2,
) -> DataFrame:
    """All pairs with Jaccard(tokens) ≥ t_num/t_den — exact.

    Input: ``(id_col, tokens_col array<string>)``; duplicates inside a
    set are collapsed (Jaccard is over SETS).  Output: ``(id_a, id_b,
    inter, uni, jaccard_micro)`` with ``id_a < id_b``.
    """
    if not (0 < t_num <= t_den):
        raise ValueError("threshold must satisfy 0 < t_num/t_den <= 1")
    ids = F.col(id_col)
    base = docs.select(
        ids.alias("_id"), F.array_distinct(F.col(tokens_col)).alias("_toks")
    )
    posting = base.select("_id", F.explode("_toks").alias("_tok"))
    dfreq = posting.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    # globally-ordered token array per doc: sort by (df, token) — struct
    # order gives the total order; transform strips back to the token
    ordered = (
        posting.join(dfreq, "_tok")
        .groupBy("_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_df"), F.col("_tok")))
            ).alias("_sorted")
        )
        .select(
            "_id",
            F.transform("_sorted", lambda s: s["_tok"]).alias("_stoks"),
            F.size("_sorted").cast("bigint").alias("_n"),
        )
    )
    # prefix length p = n - ceil(t*n) + 1, ceil in integers
    p = (
        F.col("_n")
        - F.expr(f"(_n * {int(t_num)} + {int(t_den)} - 1) DIV {int(t_den)}")
        + F.lit(1)
    )
    pref = ordered.select(
        "_id", "_n", F.explode(F.slice("_stoks", 1, p)).alias("_ptok")
    )
    a, b = pref.alias("a"), pref.alias("b")
    # length filter rides the candidate join: t*na <= nb (a<b by id, so
    # apply both directions) — integer form num*na <= den*nb
    cand = (
        a.join(
            b,
            (F.col("a._ptok") == F.col("b._ptok"))
            & (F.col("a._id") < F.col("b._id"))
            & (F.col("a._n") * t_num <= F.col("b._n") * t_den)
            & (F.col("b._n") * t_num <= F.col("a._n") * t_den),
        )
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .distinct()
    )
    la = ordered.select(
        F.col("_id").alias("id_a"),
        F.col("_stoks").alias("_ta"),
        F.col("_n").alias("_na"),
    )
    lb = ordered.select(
        F.col("_id").alias("id_b"),
        F.col("_stoks").alias("_tb"),
        F.col("_n").alias("_nb"),
    )
    verified = (
        cand.join(la, "id_a")
        .join(lb, "id_b")
        .withColumn(
            "inter",
            F.size(F.array_intersect("_ta", "_tb")).cast("bigint"),
        )
        .withColumn("uni", F.col("_na") + F.col("_nb") - F.col("inter"))
        .where(F.col("inter") * t_den >= F.col("uni") * t_num)
    )
    return verified.select(
        "id_a",
        "id_b",
        "inter",
        "uni",
        F.expr("(inter * 1000000) DIV uni").cast("bigint").alias(
            "jaccard_micro"
        ),
    )
