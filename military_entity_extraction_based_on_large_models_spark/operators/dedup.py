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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions import vectors as V
from ..plans.parallelism import scale_out


def exact_dedup(docs: DataFrame, text_col: str = "content", id_col: str = "doc_sha") -> DataFrame:
    """Keep one representative per normalized-text fingerprint: the row that is
    lexicographically smallest on (id, remaining columns) — fully deterministic
    even when ids tie (the id is often itself a content hash, so a degenerate
    duplicate class CAN share one id across millions of rows).

    Plan shape: a single ``min(struct(...))`` hash aggregate.  Min is
    algebraic, so each map task pre-reduces every fingerprint class to one
    candidate row before the shuffle — a corpus-scale degenerate class (empty
    files, license boilerplate) costs one row per map task, not a one-task
    window straggler.  (The previous ``row_number`` window serialized each
    class on a single reducer and is never split by AQE skew handling.)"""
    from pyspark.sql.types import MapType

    cols = docs.columns
    unorderable = [
        f.name for f in docs.schema.fields if isinstance(f.dataType, MapType)
    ]
    if unorderable:
        # min(struct) needs an orderable row; fail with the fix, not with
        # Spark's analyzer error on the internal struct
        raise ValueError(
            f"exact_dedup cannot order map-typed columns {unorderable}; "
            "drop them or convert with map_entries() first"
        )
    fp = docs.withColumn("_fp", T.fingerprint(F.col(text_col)))
    ordered = F.struct(id_col, *[c for c in cols if c != id_col])
    rep = fp.groupBy("_fp").agg(F.min(ordered).alias("_rep"))
    return rep.select(*[F.col(f"_rep.{c}").alias(c) for c in cols])


def exact_dup_groups(
    docs: DataFrame,
    text_col: str = "content",
    id_col: str = "doc_sha",
    max_ids: int | None = 10_000,
) -> DataFrame:
    """(fingerprint, dup_count, doc_ids) for groups with >1 member.

    ``dup_count`` is always exact (algebraic count, map-side combine).  The
    sorted ``doc_ids`` list is materialized only for groups of at most
    ``max_ids`` members; a bigger group — at corpus scale a degenerate
    duplicate class with millions of members — reports NULL instead of
    funnelling the whole id list through one reducer (same documented-cap
    semantic as ``pairs_from_buckets``; pass ``None`` for exhaustive lists).
    The id collection runs only over rows semi-joined to the small dup
    groups, so reducer memory is bounded by ``max_ids``."""
    fpn = docs.select(
        F.col(id_col).alias("_id"), T.fingerprint(F.col(text_col)).alias("fingerprint")
    )
    counts = (
        fpn.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )
    listable = counts if max_ids is None else counts.where(F.col("dup_count") <= max_ids)
    ids = (
        fpn.join(listable.select("fingerprint"), "fingerprint", "left_semi")
        .groupBy("fingerprint")
        .agg(F.sort_array(F.collect_list("_id")).alias("doc_ids"))
    )
    return counts.join(ids, "fingerprint", "left").select(
        "fingerprint", "dup_count", "doc_ids"
    )


def _seeded_hash(seed: int):
    """Factory closure: a default param would make PySpark treat the lambda
    as the (element, index) two-arg variant and bind the seed to the index."""
    return lambda s: F.xxhash64(s, F.lit(seed))


_MAX_LONG = (1 << 63) - 1


def minhash_band_buckets(shingles_col, n_hashes: int, n_bands: int):
    """Column expression: shingle array → array of n_bands LSH bucket ids.

    Built as ONE ``aggregate(..., finish=...)`` expression on purpose.
    Spark's higher-order functions don't participate in whole-stage codegen,
    so CollapseProject + per-column signatures would re-evaluate the shingle
    transform once per minhash column (32×).  Inside a single expression the
    array input and the ``finish`` lambda variable are bound VALUES — the
    shingle hash pass and the min-signature each evaluate exactly once per
    row.
    """
    rows_per_band = n_hashes // n_bands

    def merge(acc, x):
        return F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(n_hashes - 1)),
            lambda m, i: F.least(m, F.xxhash64(x, i)),
        )

    def finish(mins):
        return F.transform(
            F.sequence(F.lit(0), F.lit(n_bands - 1)),
            lambda b: F.aggregate(
                F.slice(mins, b * F.lit(rows_per_band) + F.lit(1), F.lit(rows_per_band)),
                F.lit(0).cast("long"),
                lambda a, v: F.xxhash64(a, v),
            ),
        )

    hv = F.transform(shingles_col, lambda s: F.xxhash64(s))
    return F.aggregate(
        hv,
        F.array_repeat(F.lit(_MAX_LONG), n_hashes),
        merge,
        finish,
    )


def pairs_from_buckets(
    banded: DataFrame,
    max_bucket_size: int | None = 10_000,
    array_path_max: int = 512,
    distinct: bool = True,
) -> DataFrame:
    """(id, band, bucket) → distinct candidate pairs (id_a < id_b).

    One groupBy shuffle builds the per-bucket sorted id set, then TWO pair
    regimes split on bucket size (r5 — found by the sf1 robustness sweep):

    * buckets ≤ ``array_path_max`` ids: the columnar triangle — flatten of
      a per-element slice transform, zero extra shuffle, the expensive
      upstream (signatures/sketches) evaluated exactly once.  The triangle
      is materialized as ONE array value per bucket, so its memory is
      O(size²) — at 512 ids that is ≤ ~131k pair structs (~4 MB), safe;
      at the old single-regime 10k cap it was 50M structs in a single
      interpreted Flatten allocation, which OOMed an 8 GiB executor the
      first time real near-dup-heavy data (the tiled sf1 corpus) pushed a
      simhash bucket near the cap.
    * larger buckets: re-explode the id set and self-join on (band, bucket)
      with ``id_a < id_b`` — the same pairs STREAMED through a join instead
      of materialized as an array; the join reads the aggregate's shuffle
      output (ReusedExchange — same subtree both sides), so signatures are
      still not recomputed.

    ``max_bucket_size`` still skips buckets beyond the cap (default 10k ids
    ≈ 50M pairs): a bucket that large means a degenerate equal-signature
    class — mass exact duplicates, or below-min-length inputs that all
    collapse to one signature — whose members are better handled by
    ``exact_dedup`` upstream.  Pass ``None`` for the exhaustive behavior.
    The cap is a documented semantic (not silent truncation): candidates
    WITHIN an oversized bucket are not emitted.

    ``distinct=False`` returns the pair MULTISET (a pair repeats once per
    shared band) and skips the dedup shuffle — for consumers that apply a
    selective per-pair filter first and dedup the survivors (r7:
    ``ngram_jaccard_pairs(distinct_candidates=False)``).  On weakly-
    selective generators the distinct is the dominant candidate-stage
    shuffle (simhash 8-bit bands at sf0.1: 6.8M raw pairs), and
    ``distinct ∘ filter ≡ filter ∘ distinct`` for a deterministic per-row
    filter, so deferring it is output-neutral."""
    # value-wise no-op (band is a posexplode position, bucket an xxhash64 —
    # neither is ever null), but REQUIRED for exchange reuse: the big-bucket
    # inner self-join infers isnotnull(band)/isnotnull(bucket) and pushes
    # them below the aggregate, so without the same filter here the small
    # branch's exchange is canonically different and the expensive banding
    # subtree (shingles + 32-way minhash over every doc) executes twice.
    # With it, all three consumers collapse onto ONE ReusedExchange.
    banded = banded.where(F.col("band").isNotNull() & F.col("bucket").isNotNull())
    grouped = (
        banded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_set("id")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    if max_bucket_size is not None:
        grouped = grouped.where(F.size("ids") <= max_bucket_size)
    small = grouped.where(F.size("ids") <= array_path_max)
    big = grouped.where(F.size("ids") > array_path_max)
    combos = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size("ids")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    small_pairs = (
        small.select(F.explode(combos).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
    )
    a = big.select("band", "bucket", F.explode("ids").alias("id_a"))
    b = big.select("band", "bucket", F.explode("ids").alias("id_b"))
    # SHUFFLE_HASH, not the planner's pick: size estimates after the
    # aggregate are tiny, so Catalyst BROADCASTS one side — and a
    # BroadcastExchange cannot reuse the shuffle Exchange the other two
    # branches read, so the whole upstream banding pipeline (shingles +
    # 32-way minhash over every doc) executed a SECOND time just to build
    # a broadcast of the (usually empty) big-bucket side.  Both sides of a
    # shuffled-hash join keep hash(band, bucket) partitioning, which the
    # aggregate's own exchange already provides — explode preserves it —
    # so all three consumers collapse onto ONE ReusedExchange and no new
    # exchange or sort is added.  (Measured at sf1: pairs stage 5.2 s →
    # banding-only cost; plan: 3 copies of the banding subtree → 1.)
    big_pairs = (
        a.join(b.hint("shuffle_hash"), ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    out = small_pairs.unionByName(big_pairs)
    return out.distinct() if distinct else out


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
    J ≈ (1/8)^(1/4) ≈ 0.59 — standard near-dup territory.

    Plan shape: signature computed ONCE per row; bands emitted with one
    posexplode (no per-band re-projection); pairs via pairs_from_buckets
    (single shuffle)."""
    # repartition the NARROW projection first; shingling (the expensive
    # expression) must run after the exchange or it executes single-threaded
    # at shuffle write when the scan has few splits
    narrow = scale_out(docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t")))
    bands = minhash_band_buckets(T.shingles(F.col("_t"), shingle_n), n_hashes, n_bands)
    banded = narrow.select("id", F.posexplode(bands).alias("band", "bucket"))
    return pairs_from_buckets(banded)


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidate_pairs: DataFrame | None = None,
    text_col: str = "content",
    id_col: str = "doc_sha",
    shingle_n: int = 3,
    threshold: float = 0.8,
    distinct_candidates: bool = True,
    slim_prefilter: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs (or LSH candidates if None).

    Returns (id_a, id_b, jaccard) for pairs with jaccard ≥ threshold.

    Two verify-stage regimes, chosen by the CANDIDATE GENERATOR'S
    SELECTIVITY (sf10 A/B in OPTIMIZATION_r07.md §7):

    * ``slim_prefilter=False`` (default — right for SELECTIVE generators
      like banded MinHash, where most candidates survive the size bound):
      arrays join directly and the size-bound prefilter runs as the join
      condition.  Adding a slim pass here is pure overhead — measured
      +81 s on 26M minhash candidates at sf10 (survivors ≈ candidates,
      so the arrays ship anyway and the two extra joins buy nothing).
    * ``slim_prefilter=True`` (right for WEAKLY-selective generators like
      coarse simhash bands, where the bound kills most candidates): the
      candidate stream first joins only (id, |shingles|) and the bound
      drops doomed pairs before ANY shingle array moves; arrays join
      back for survivors alone.  6.8M raw simhash pairs → 727k
      survivors at sf0.1, end-to-end warm 6.5 → 5.1 s.

    ``distinct_candidates=False`` declares that ``candidate_pairs`` is a
    MULTISET (e.g. a generator called with ``distinct=False``).  With
    ``slim_prefilter=True`` the dedup shuffle then runs on the slim
    size-bound SURVIVORS instead of the raw pair stream —
    ``distinct ∘ filter ≡ filter ∘ distinct`` for this deterministic
    per-row bound, so the output set is identical; otherwise the
    multiset is deduped up front.  Either way the emitted rows are
    set-semantics, identical to the default path.
    """
    if candidate_pairs is None:
        candidate_pairs = minhash_lsh_pairs(
            docs, text_col=text_col, id_col=id_col, shingle_n=shingle_n
        )
    sh = docs.select(
        F.col(id_col).alias("id"), T.shingles(F.col(text_col), shingle_n).alias("sh")
    )
    # size-bound prefilter (both regimes): |A∩B| ≤ min(|A|,|B|) and
    # x/(|A|+|B|−x) is monotone in x (correctly-rounded double division
    # preserves the monotonicity — both sides are exact small ints), so
    # J(A,B) ≤ min/(|A|+|B|−min); pairs whose bound is below the
    # threshold cannot pass the final filter and are dropped before the
    # O(n) intersect.  Output provably unchanged in both regimes.
    # (guarded on threshold > 0: at threshold ≤ 0 the final filter keeps
    # zero-jaccard pairs, which the 0/0 bound of two empty arrays would
    # mis-drop)
    slim_bound_applied = False
    if threshold > 0 and slim_prefilter:
        sizes = sh.select("id", F.size("sh").alias("_n"))
        slim = (
            candidate_pairs.join(
                sizes.withColumnRenamed("id", "id_a").withColumnRenamed("_n", "_na"),
                "id_a",
            ).join(
                sizes.withColumnRenamed("id", "id_b").withColumnRenamed("_n", "_nb"),
                "id_b",
            )
        )
        mn = F.least("_na", "_nb").cast("double")
        bound = mn / ((F.col("_na") + F.col("_nb")).cast("double") - mn)
        candidate_pairs = slim.where(bound >= threshold).select("id_a", "id_b")
        slim_bound_applied = True
        if not distinct_candidates:
            candidate_pairs = candidate_pairs.distinct()
    elif not distinct_candidates:
        # no slim stage to defer past — dedup the multiset up front so the
        # array joins and the emitted rows stay set-semantics
        candidate_pairs = candidate_pairs.distinct()
    joined = (
        candidate_pairs.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    if threshold > 0 and not slim_bound_applied:
        mn = F.least(F.size("sh_a"), F.size("sh_b")).cast("double")
        bound = mn / ((F.size("sh_a") + F.size("sh_b")).cast("double") - mn)
        joined = joined.where(bound >= threshold)
    # |A ∪ B| = |A| + |B| − |A ∩ B|: shingle arrays are distinct-element
    # (array_distinct upstream), so the identity is exact and the
    # array_union pass — a second hash-set build + array materialization
    # per pair — is dropped.  Same ints, same double division: jaccard
    # values bit-identical.
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
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
    narrow = scale_out(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    )

    # single-pass: one aggregate carries a 64-wide vote vector (element b =
    # ± count of bit b over token hashes); the finish lambda folds signs to
    # the long.  One expression → tokens/hashes evaluated once per row (see
    # minhash_band_buckets for why per-bit columns would re-evaluate them).
    def merge(acc, hv):
        # bit positions are Python ints (shift amounts must be literals)
        contribs = F.array(
            *[
                F.when(
                    F.shiftright(hv, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
                for b in range(bits)
            ]
        )
        return F.zip_with(acc, contribs, lambda v, c: v + c)

    def finish(votes):
        # two's-complement assembly: bit 63 contributes -2^63
        total = F.lit(0).cast("long")
        for b in range(bits):
            weight = -(1 << 63) if b == 63 else (1 << b)
            total = total + F.when(
                votes[b] > 0, F.lit(weight).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return total

    hv = F.transform(T.word_tokens(F.col("_t")), lambda t: F.xxhash64(t))
    sim = F.aggregate(hv, F.array_repeat(F.lit(0), bits), merge, finish)
    return narrow.select("id", sim.alias("simhash"))


def simhash_neardup_pairs(
    docs: DataFrame,
    text_col: str = "content",
    id_col: str = "doc_sha",
    n_bands: int = 4,
    max_hamming: int | None = None,
    distinct: bool = True,
) -> DataFrame:
    """Near-dup candidates: docs sharing any 16-bit simhash band (Hamming-
    distance blocking, Manku-Jain-Sarma style).

    ``max_hamming`` adds the second half of the Manku design: candidate
    pairs are kept only when the FULL 64-bit signatures differ in at most
    that many bits — one xor + popcount per pair over an 8-byte join, so
    the expensive downstream verify (shingle-array Jaccard) touches a far
    smaller set.  On low-entropy corpora band collisions are weakly
    selective (9% of all pairs at sf0.1) and this filter is the difference
    between verifying 232k pairs and 2k.  None (default) keeps the pure
    banding semantics — the Hamming cap is probabilistic (a J >= 0.9 pair
    can exceed it), so the pigeonhole recall guarantee only covers pairs
    within the cap.

    ``distinct=False`` passes through to ``pairs_from_buckets``: the pair
    multiset (one row per shared band) with no dedup shuffle, for
    filter-first consumers (see pairs_from_buckets)."""
    sh = simhash(docs, text_col, id_col)
    width = 64 // n_bands
    band_buckets = F.array(
        *[
            F.shiftrightunsigned("simhash", b * width).bitwiseAND(
                F.lit((1 << width) - 1)
            )
            for b in range(n_bands)
        ]
    )
    banded = sh.select("id", F.posexplode(band_buckets).alias("band", "bucket"))
    cand = pairs_from_buckets(banded, distinct=distinct)
    if max_hamming is not None:
        sa = sh.select(F.col("id").alias("id_a"), F.col("simhash").alias("_ha"))
        sb = sh.select(F.col("id").alias("id_b"), F.col("simhash").alias("_hb"))
        cand = (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .where(
                F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))) <= max_hamming
            )
            .select("id_a", "id_b")
        )
    return cand


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
    base = scale_out(emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")))
    # pseudo-random hyperplane: component j of plane k = hash(j,k) mapped to
    # ±1; same deterministic sketch as similarity._sketch
    from .similarity import _sketch

    sk = base.select(
        "id", F.lit(0).alias("band"), _sketch(F.col("v"), n_planes).alias("bucket")
    )
    # candidate ids first (sketch computed once), vectors joined back only
    # for the surviving candidate pairs — the exact-rescore fetch stays
    # proportional to candidates, not corpus²
    cand = pairs_from_buckets(sk)
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", V.cosine(F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def minhash_band_table(
    docs: DataFrame,
    text_col: str = "content",
    id_col: str = "doc_sha",
    n_hashes: int = 32,
    n_bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, band, bucket) — the MATERIALIZABLE LSH index of a corpus.

    This is minhash_lsh_pairs' banding stage exposed as a table: write it
    out once per corpus snapshot and incremental batches join against it
    (lsh_pairs_incremental) instead of re-sketching 100 TB per refresh.
    Same single-expression signature + one posexplode plan.
    """
    narrow = scale_out(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    )
    bands = minhash_band_buckets(
        T.shingles(F.col("_t"), shingle_n), n_hashes, n_bands
    )
    return narrow.select("id", F.posexplode(bands).alias("band", "bucket"))


def lsh_pairs_incremental(
    new_bands: DataFrame,
    corpus_bands: DataFrame,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Candidate pairs TOUCHING THE NEW BATCH only: new×corpus plus
    new×new — never corpus×corpus.  The incremental dedup workflow: the
    stored corpus index never re-pairs against itself, so a daily batch
    costs O(batch + matching buckets), not O(corpus²) or even a corpus
    re-scan.

    Caller contract: new and corpus id sets are DISJOINT (a re-submitted
    id belongs in the new batch only).  Pairs are normalized
    (id_a < id_b) and distinct, identical to pairs_from_buckets, so
    downstream verify/CC composition is unchanged.  ``max_bucket_size``
    keeps the degenerate-bucket semantic: corpus buckets over the cap are
    skipped in the cross join (their members are exact_dedup's job), and
    the new×new triangle inherits pairs_from_buckets' own cap.  (r7: the
    cap counts DISTINCT corpus members per bucket — identical to the row
    count for ``minhash_band_table``-produced inputs, which emit exactly
    one row per (id, band).)

    Plan shape (r7): each banding is aggregated ONCE.  The old row-level
    formulation consumed ``corpus_bands`` twice (eligibility count + the
    join) and ``new_bands`` twice (cross join + the intra triangle), and
    none of the four subtrees could reuse another's exchange — the whole
    shingle+minhash pass over each side executed twice.  Both sides now
    fold to per-bucket sorted id arrays; the cross pairs come from one
    bucket-aligned join of the two aggregates, and the new-batch
    aggregate is canonically identical to pairs_from_buckets' bucket
    aggregate (same pre-applied isnotnull filter, same sorted
    collect_set), so the intra triangle reads it as a ReusedExchange.
    The corpus aggregate collects ids BEFORE the cap filter — the same
    collect-then-filter semantics pairs_from_buckets has always used for
    every bucket of the full corpus, so no new degenerate-bucket memory
    class is introduced: mass-duplicate classes are exact_dedup's job
    upstream, per the existing contract.
    """
    nb = new_bands.where(
        F.col("band").isNotNull() & F.col("bucket").isNotNull()
    )
    nagg = nb.groupBy("band", "bucket").agg(
        F.sort_array(F.collect_set("id")).alias("ids")
    )
    corp = corpus_bands.select(F.col("id").alias("_cid"), "band", "bucket")
    corp = corp.where(F.col("band").isNotNull() & F.col("bucket").isNotNull())
    cagg = corp.groupBy("band", "bucket").agg(
        F.sort_array(F.collect_set("_cid")).alias("_cids")
    )
    if max_bucket_size is not None:
        cagg = cagg.where(F.size("_cids") <= max_bucket_size)
    cross = (
        nagg.join(cagg, ["band", "bucket"])
        .select(F.explode("ids").alias("_nid"), "_cids")
        .select("_nid", F.explode("_cids").alias("_cid"))
        .select(
            F.least("_nid", "_cid").alias("id_a"),
            F.greatest("_nid", "_cid").alias("id_b"),
        )
        .where(F.col("id_a") != F.col("id_b"))
    )
    intra = pairs_from_buckets(nb, max_bucket_size=max_bucket_size)
    return cross.unionByName(intra).distinct()
