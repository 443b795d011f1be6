"""Edit-distance similarity join — typo-tolerant entity alias matching.

The linking stage's fuzzy path (linking.py) blocks on character-shingle
MinHash and verifies with shingle Jaccard; that misses the classic
TYPO metric: two surface forms within Levenshtein distance d (dropped /
inserted / substituted characters — "Pattriot" vs "Patriot") can share
few 3-shingles.  This operator is the exact complement: every unordered
pair of names with edit distance ≤ d, computed without an all-pairs
scan.

Blocking is FastSS deletion neighborhoods (Bocek et al. 2007, the
SymSpell scheme), which is PROVABLY COMPLETE: if ed(a, b) ≤ d then the
≤d-deletion neighborhoods D_d(a) and D_d(b) intersect, so an equi
self-join on deletion keys yields a candidate superset — never a missed
pair (property-tested against brute force).  Verification is the exact
built-in ``levenshtein`` (JVM-side in Spark, identical semantics in
DuckDB), so precision is exact and the whole operator is
engine-reproducible with zero Python.

Scale shape (100 TB alias tables): neighborhood generation is a
shuffle-free codegen projection — O(len) keys per name at d=1,
O(len²) at d=2 (enforced d ∈ {1, 2}; entity surface forms are short
strings, which is the regime this blocking is designed for).  The
candidate stage is ONE equi self-join on the exploded key table with a
distinct pair reduction BEFORE the verify — cost is Σ_key df(key)²,
the setsim/winnow posting-list shape.  Hot keys (very short names
collapse to few deletion variants) can be capped with ``max_key_df``:
keys above the cap are DROPPED with the same documented recall-trade
semantics as the LSH mega-bucket cap — completeness holds only for
pairs sharing a surviving key; the default (None) is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one deletion pass as a SQL expression over column {c}: all strings
# obtained by deleting exactly one character (empty array for '')
_DEL1 = (
    "CASE WHEN length({c}) = 0 THEN array() "
    "ELSE transform(sequence(1, length({c})), i -> "
    "concat(substring({c}, 1, i - 1), substring({c}, i + 1, length({c})))) END"
)


def _deletion_keys(col: str, max_dist: int) -> str:
    """SQL expression: array of all ≤max_dist-deletion variants of
    ``col`` (including the string itself), distinct."""
    d1 = _DEL1.format(c=col)
    if max_dist == 1:
        return f"array_distinct(concat(array({col}), {d1}))"
    d2 = (
        f"flatten(transform({d1}, s -> "
        "CASE WHEN length(s) = 0 THEN array() "
        "ELSE transform(sequence(1, length(s)), i -> "
        "concat(substring(s, 1, i - 1), substring(s, i + 1, length(s)))) END))"
    )
    return f"array_distinct(concat(array({col}), {d1}, {d2}))"


def edit_distance_join(
    names: DataFrame,
    name_col: str = "name",
    max_dist: int = 1,
    max_key_df: int | None = None,
) -> DataFrame:
    """All unordered pairs of DISTINCT names with levenshtein ≤ max_dist →
    (name_a, name_b, dist), name_a < name_b.

    ``max_dist`` must be 1 or 2 (deletion-neighborhood size is
    O(len^d)).  ``max_key_df`` drops deletion keys matching more than
    that many names before pairing (documented recall trade for
    degenerate very-short-name corpora; None = provably complete).
    """
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")
    distinct = names.select(F.col(name_col).alias("name")).distinct()
    keyed = distinct.select(
        "name", F.explode(F.expr(_deletion_keys("name", max_dist))).alias("k")
    )
    if max_key_df is not None:
        hot = (
            keyed.groupBy("k")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_key_df)
            .select("k")
        )
        keyed = keyed.join(hot, "k", "left_anti")
    a = keyed.select(F.col("name").alias("name_a"), "k")
    b = keyed.select(F.col("name").alias("name_b"), "k")
    cand = (
        a.join(b, "k")
        .where(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    return cand.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
    ).where(F.col("dist") <= max_dist)


def edit_distance_join_sql(names_sql: str, max_dist: int = 1) -> str:
    """DuckDB twin — deliberately the BRUTE-FORCE all-pairs join, so the
    oracle gates the FastSS blocking's completeness theorem itself (the
    doc_setsim_pairs stance), not a re-implementation of it."""
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")
    return f"""
        WITH ed_names AS (SELECT DISTINCT name FROM ({names_sql}) t)
        SELECT a.name AS name_a, b.name AS name_b,
               CAST(levenshtein(a.name, b.name) AS INT) AS dist
        FROM ed_names a JOIN ed_names b ON a.name < b.name
        WHERE levenshtein(a.name, b.name) <= {int(max_dist)}
    """
