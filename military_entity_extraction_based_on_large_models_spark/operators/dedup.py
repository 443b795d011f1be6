"""Corpus deduplication — the training-data-pipeline operator family.

The reference's dedup is per-list (name,label) set semantics
(reflect_workflow1.py:44-53); at corpus scale a curation pipeline needs
document-level dedup.  Five public-algorithm strategies, all shuffle-lean:

* exact_dedup           — hash-groupBy on a normalized md5 fingerprint; one
                          shuffle on a short key, map-side partial agg.
* minhash_lsh_pairs     — shingle → minhash (k hash funcs via xxhash64 seeds)
                          → band → bucket-join.  The self-join is restricted
                          to same-(band, bucket), so candidate generation is
                          linear-ish, never the O(n²) cross join.
* simhash               — 64-bit simhash per doc from token hashes; near-dup
                          pairs = identical value per 16-bit band (public
                          Charikar/Manku-Jain-Sarma design).
* ngram_jaccard_pairs   — exact Jaccard verification on candidate pairs
                          (used downstream of LSH; also exposed standalone).
* embedding_neardup     — cosine ≥ τ pairs over embeddings, blocked by a
                          random-hyperplane LSH sign-bucket so the self-join
                          never goes quadratic.

All pure DataFrame ops; no Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions import vectors as V


def exact_dedup(docs: DataFrame, text_col: str = "content", id_col: str = "doc_sha") -> DataFrame:
    """Keep one representative per normalized-text fingerprint (min id wins —
    deterministic).  Returns the surviving rows."""
    fp = docs.withColumn("_fp", T.fingerprint(F.col(text_col)))
    w = Window.partitionBy("_fp").orderBy(F.col(id_col))
    return (
        fp.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )


def exact_dup_groups(docs: DataFrame, text_col: str = "content", id_col: str = "doc_sha") -> DataFrame:
    """(fingerprint, dup_count, doc_ids) for groups with >1 member."""
    return (
        docs.withColumn("fingerprint", T.fingerprint(F.col(text_col)))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .where(F.col("dup_count") > 1)
    )


def _seeded_hash(seed: int):
    """Factory closure: a default param would make PySpark treat the lambda
    as the (element, index) two-arg variant and bind the seed to the index."""
    return lambda s: F.xxhash64(s, F.lit(seed))


def _minhash_signature(df: DataFrame, shingle_col: str, n_hashes: int) -> DataFrame:
    for h in range(n_hashes):
        df = df.withColumn(
            f"_mh{h}",
            F.array_min(F.transform(F.col(shingle_col), _seeded_hash(h))),
        )
    return df


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "content",
    id_col: str = "doc_sha",
    n_hashes: int = 32,
    n_bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash-LSH.

    Defaults (32 hashes, 8 bands of 4) put the S-curve threshold at
    J ≈ (1/8)^(1/4) ≈ 0.59 — standard near-dup territory."""
    rows_per_band = n_hashes // n_bands
    base = docs.select(
        F.col(id_col).alias("id"), T.shingles(F.col(text_col), shingle_n).alias("_sh")
    ).where(F.size("_sh") > 0)
    sig = _minhash_signature(base, "_sh", n_hashes)
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"_mh{h}") for h in range(b * rows_per_band, (b + 1) * rows_per_band)]
        bands.append(sig.select("id", F.lit(b).alias("band"), F.xxhash64(*cols).alias("bucket")))
    banded = bands[0]
    for extra in bands[1:]:
        banded = banded.unionByName(extra)
    a, b_ = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidate_pairs: DataFrame | None = None,
    text_col: str = "content",
    id_col: str = "doc_sha",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs (or LSH candidates if None).

    Returns (id_a, id_b, jaccard) for pairs with jaccard ≥ threshold.
    """
    if candidate_pairs is None:
        candidate_pairs = minhash_lsh_pairs(
            docs, text_col=text_col, id_col=id_col, shingle_n=shingle_n
        )
    sh = docs.select(
        F.col(id_col).alias("id"), T.shingles(F.col(text_col), shingle_n).alias("sh")
    )
    joined = (
        candidate_pairs.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        joined.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(docs: DataFrame, text_col: str = "content", id_col: str = "doc_sha", bits: int = 64) -> DataFrame:
    """64-bit SimHash per document from word-token xxhash64s.

    For each bit position, sum ±1 over token-hash bits; sign → output bit.
    Expressed with higher-order functions over the token array (JVM-side).
    """
    toks = docs.select(F.col(id_col).alias("id"), T.word_tokens(F.col(text_col)).alias("t"))
    hashed = toks.withColumn("h", F.transform("t", lambda t: F.xxhash64(t)))
    def _vote(bit: int):
        # factory closure: F.aggregate requires the merge lambda to take
        # exactly (acc, x) — no extra default params
        return lambda acc, hv: acc + F.when(
            F.shiftright(hv, bit).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    sim = F.lit(0).cast("long")
    for bit in range(bits):
        votes = F.aggregate("h", F.lit(0), _vote(bit))
        sim = sim + F.when(
            votes > 0, F.shiftleft(F.lit(1).cast("long"), bit)
        ).otherwise(F.lit(0).cast("long"))
    return hashed.select("id", sim.alias("simhash"))


def simhash_neardup_pairs(
    docs: DataFrame, text_col: str = "content", id_col: str = "doc_sha", n_bands: int = 4
) -> DataFrame:
    """Near-dup candidates: docs sharing any 16-bit simhash band (Hamming-
    distance blocking, Manku-Jain-Sarma style)."""
    sh = simhash(docs, text_col, id_col)
    width = 64 // n_bands
    bands = []
    for b in range(n_bands):
        bands.append(
            sh.select(
                "id",
                F.lit(b).alias("band"),
                F.shiftrightunsigned("simhash", b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bucket"),
            )
        )
    banded = bands[0]
    for extra in bands[1:]:
        banded = banded.unionByName(extra)
    a, b_ = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 8,
) -> DataFrame:
    """Cosine-similar pairs (cos ≥ threshold) with random-hyperplane LSH
    blocking: sign-bit sketch over n_planes pseudo-random hyperplanes (seeded
    by xxhash64 of the dimension index — deterministic, no stored planes);
    only same-sketch pairs are compared exactly."""
    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    # pseudo-random hyperplane: component j of plane k = hash(j,k) mapped to
    # ±1; same deterministic sketch as similarity._sketch
    from .similarity import _sketch

    sk = base.withColumn("sketch", _sketch(F.col("v"), n_planes))
    a, b_ = sk.alias("a"), sk.alias("b")
    cand = a.join(
        b_,
        (F.col("a.sketch") == F.col("b.sketch")) & (F.col("a.id") < F.col("b.id")),
    )
    cos = V.cosine(F.col("a.v"), F.col("b.v"))
    return (
        cand.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine"
        )
    )
