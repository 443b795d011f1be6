"""Dedup operator family: exact, MinHash-LSH, SimHash, Jaccard, embedding."""

from __future__ import annotations

from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.operators import dedup


def _docs(spark, texts):
    return spark.createDataFrame(
        [(f"d{i:03d}", t) for i, t in enumerate(texts)], ["doc_sha", "content"]
    )


BASE = (
    "the allied convoy moved through the northern sector at dawn carrying "
    "supplies for the forward operating base near the river crossing"
)


def test_exact_dedup(spark):
    docs = _docs(spark, [BASE, BASE, "  " + BASE.upper() + " ", "something else entirely"])
    survivors = dedup.exact_dedup(docs)
    assert survivors.count() == 2  # normalized dup collapses; min id d000 wins
    ids = {r["doc_sha"] for r in survivors.collect()}
    assert ids == {"d000", "d003"}
    groups = dedup.exact_dup_groups(docs).collect()
    assert len(groups) == 1 and groups[0]["dup_count"] == 3


def test_minhash_lsh_finds_near_dups(spark):
    near = BASE.replace("dawn", "dusk")
    docs = _docs(spark, [BASE, near, "completely different text about spark query engines"])
    # 1-row bands → detection prob 1-(1-J)^8 ≈ 1 for this pair's J ≈ 0.7;
    # the hash outcome is deterministic, so the assertion is stable
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(docs, n_hashes=8, n_bands=8).collect()
    }
    assert ("d000", "d001") in pairs
    assert ("d000", "d002") not in pairs and ("d001", "d002") not in pairs


def test_ngram_jaccard_verifies(spark):
    near = BASE.replace("dawn", "dusk")
    docs = _docs(spark, [BASE, near, "unrelated words entirely here"])
    cands = dedup.minhash_lsh_pairs(docs, n_hashes=8, n_bands=8)
    verified = dedup.ngram_jaccard_pairs(docs, candidate_pairs=cands, threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in verified} == {("d000", "d001")}
    assert all(0.5 <= r["jaccard"] <= 1.0 for r in verified)


def test_ngram_jaccard_slim_prefilter_equivalence(spark):
    """r7 slim-first size-bound join: output identical to brute force on a
    fixture with size-disparate (bound-pruned) pairs; threshold <= 0 keeps
    zero-jaccard pairs (the 0/0-bound guard skips the slim path); the plan
    pins the slim-first shape (2 narrow joins before the 2 array joins)."""
    import re

    from military_entity_extraction_based_on_large_models_spark.functions import text as T

    texts = [
        BASE,
        BASE.replace("dawn", "dusk"),
        BASE + " with a long extra tail of additional trailing words appended",
        "tiny",
        "",
    ]
    docs = _docs(spark, texts)
    ids = [f"d{i:03d}" for i in range(len(texts))]
    all_pairs = spark.createDataFrame(
        [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]], ["id_a", "id_b"]
    )
    sh = {
        r["doc_sha"]: set(r["sh"])
        for r in docs.select(
            "doc_sha", T.shingles(F.col("content"), 3).alias("sh")
        ).collect()
    }

    def jac(a, b):
        u = sh[a] | sh[b]
        return len(sh[a] & sh[b]) / len(u) if u else 0.0

    for thr in (0.5, 0.0):
        for slim in (False, True):
            got = {
                (r["id_a"], r["id_b"], round(r["jaccard"], 6))
                for r in dedup.ngram_jaccard_pairs(
                    docs, candidate_pairs=all_pairs, threshold=thr,
                    slim_prefilter=slim,
                ).collect()
            }
            want = {
                (a, b, round(jac(a, b), 6))
                for i, a in enumerate(ids)
                for b in ids[i + 1 :]
                if jac(a, b) >= thr
            }
            assert got == want, (thr, slim, got ^ want)

    def n_joins(df):
        # "simple" mode prints each operator once ("formatted" repeats each
        # in its details section, doubling the count)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        return len(re.findall(r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin", plan))

    # slim_prefilter=True plans 4 joins (2 slim before 2 array); the
    # default inline regime (and threshold<=0, where there is no bound)
    # plans only the 2 array joins
    assert n_joins(dedup.ngram_jaccard_pairs(docs, candidate_pairs=all_pairs, threshold=0.5, slim_prefilter=True)) == 4
    assert n_joins(dedup.ngram_jaccard_pairs(docs, candidate_pairs=all_pairs, threshold=0.5)) == 2
    assert n_joins(dedup.ngram_jaccard_pairs(docs, candidate_pairs=all_pairs, threshold=0.0, slim_prefilter=True)) == 2

    # multiset candidates (distinct_candidates=False, the deferred-distinct
    # path): duplicated candidate rows must yield the identical SET output,
    # in both regimes and with and without a slim stage to defer past
    dup_pairs = all_pairs.unionByName(all_pairs).unionByName(all_pairs.limit(3))
    for thr in (0.5, 0.0):
        for slim in (False, True):
            got = sorted(
                (r["id_a"], r["id_b"], round(r["jaccard"], 6))
                for r in dedup.ngram_jaccard_pairs(
                    docs, candidate_pairs=dup_pairs, threshold=thr,
                    distinct_candidates=False, slim_prefilter=slim,
                ).collect()
            )
            want = sorted(
                (a, b, round(jac(a, b), 6))
                for i, a in enumerate(ids)
                for b in ids[i + 1 :]
                if jac(a, b) >= thr
            )
            assert got == want, (thr, slim, got, want)

    # generator passthrough: distinct=False emits the per-band multiset
    # whose distinct equals the default output
    raw = dedup.simhash_neardup_pairs(docs, n_bands=8, distinct=False)
    dflt = dedup.simhash_neardup_pairs(docs, n_bands=8)
    assert sorted(map(tuple, raw.distinct().collect())) == sorted(
        map(tuple, dflt.collect())
    )
    assert raw.count() >= dflt.count()


def test_simhash_deterministic_and_blocks(spark):
    near = BASE.replace("dawn", "dusk")
    docs = _docs(spark, [BASE, near, "zzz qqq entirely disjoint vocabulary xxx yyy www"])
    sh = {r["id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    sh2 = {r["id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sh == sh2  # deterministic
    # near-dup docs differ in few bits; blocking should pair them
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.simhash_neardup_pairs(docs).collect()}
    assert ("d000", "d001") in pairs


def test_embedding_neardup(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0
            (2, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
        ],
        ["vec_id", "embedding"],
    )
    pairs = dedup.embedding_neardup_pairs(emb, threshold=0.95).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 1)}
    assert pairs[0]["cosine"] > 0.99


def test_pairs_from_buckets_caps_degenerate_buckets(spark):
    """Round-3 review: an equal-signature mega-bucket (mass exact dups /
    below-min-length inputs) must not fan out O(n^2) pairs on one reducer;
    the cap skips it, None restores exhaustive behavior."""
    from military_entity_extraction_based_on_large_models_spark.operators.dedup import (
        pairs_from_buckets,
    )

    rows = [(f"id{i}", 0, 42) for i in range(50)] + [("a", 0, 7), ("b", 0, 7)]
    banded = spark.createDataFrame(rows, ["id", "band", "bucket"])
    capped = pairs_from_buckets(banded, max_bucket_size=10)
    assert capped.count() == 1  # only the small bucket's single pair
    full = pairs_from_buckets(banded, max_bucket_size=None)
    assert full.count() == (50 * 49) // 2 + 1


def test_pairs_from_buckets_join_regime_equals_array_regime(spark):
    """r5 (sf1 sweep OOM): buckets above array_path_max route through the
    streaming self-join instead of the one-allocation triangle array.  Both
    regimes must produce the identical pair set, and duplicate (id, band,
    bucket) rows must still collapse."""
    from military_entity_extraction_based_on_large_models_spark.operators.dedup import (
        pairs_from_buckets,
    )

    rows = [(f"id{i:03d}", 0, 42) for i in range(40)] + [
        ("a", 1, 7), ("b", 1, 7), ("a", 1, 7),       # dup row collapses
        ("x", 2, 9),                                  # singleton: no pairs
    ]
    banded = spark.createDataFrame(rows, ["id", "band", "bucket"])
    via_array = pairs_from_buckets(banded, array_path_max=512)
    via_join = pairs_from_buckets(banded, array_path_max=8)
    a = {(r["id_a"], r["id_b"]) for r in via_array.collect()}
    j = {(r["id_a"], r["id_b"]) for r in via_join.collect()}
    assert a == j and len(a) == (40 * 39) // 2 + 1
    # the big-bucket branch really is a join, not a bigger array
    plan = via_join._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan


def test_exact_dedup_plan_partial_agg_no_window(spark):
    """Scale gate (r3 verdict): the representative pick must be a partial+final
    aggregate (map-side pre-reduction of degenerate duplicate classes), never a
    row_number window — a window partition is one reducer task and is never
    split by AQE skew handling."""
    docs = _docs(spark, [BASE, BASE, "other"])
    q = dedup.exact_dedup(docs)
    plan = q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
    assert "Window" not in plan
    assert "partial_min" in plan


def test_exact_dedup_deterministic_on_tied_ids(spark):
    # id-as-content-hash means a dup class can share ONE id; the representative
    # must still be deterministic (lexicographic min over the remaining cols)
    rows = [("same_sha", "dup", "pathB"), ("same_sha", "dup", "pathA"),
            ("other", "unique", "pathC")]
    docs = spark.createDataFrame(rows, ["doc_sha", "content", "path"])
    out = sorted(r["path"] for r in dedup.exact_dedup(docs).collect())
    assert out == ["pathA", "pathC"]


def test_exact_dup_groups_degenerate_class_cap(spark):
    """A planted 100k-member duplicate class: count stays exact, the id list is
    NULL under the cap (never funnelled to one reducer), small groups keep
    exact sorted lists, and exact_dedup still keeps one survivor per class."""
    big = spark.range(100_000).select(
        F.concat(F.lit("s"), F.col("id")).alias("doc_sha"),
        F.lit("boilerplate license text").alias("content"),
    )
    docs = big.unionByName(_docs(spark, [BASE, BASE, "a unique row"]))
    groups = {g["dup_count"]: g for g in dedup.exact_dup_groups(docs, max_ids=1000).collect()}
    assert set(groups) == {100_000, 2}
    assert groups[100_000]["doc_ids"] is None
    assert groups[2]["doc_ids"] == ["d000", "d001"]
    assert dedup.exact_dedup(docs).count() == 3


def test_exact_dedup_map_column_guard(spark):
    import pytest

    docs = spark.createDataFrame(
        [("d1", "x", {"k": "v"})], ["doc_sha", "content", "meta"]
    )
    with pytest.raises(ValueError, match="map-typed"):
        dedup.exact_dedup(docs)


def test_simhash_hamming_prefilter(spark):
    """Manku-style full-signature Hamming cap between banding and verify:
    64 ≡ no filter, 0 keeps only identical signatures, and on the near-dup
    fixture the cap loses nothing."""
    near = BASE.replace("dawn", "dusk")
    docs = _docs(spark, [BASE, near, BASE + " extra tail words here", "unrelated engine text"])

    def pairs(h):
        return {
            (r["id_a"], r["id_b"])
            for r in dedup.simhash_neardup_pairs(docs, max_hamming=h).collect()
        }

    assert pairs(64) == pairs(None)
    assert pairs(0) <= pairs(8) <= pairs(None)
    # the true near-dup pair survives a tight cap
    assert ("d000", "d001") in pairs(8)


def _band_fixture(spark):
    """Seeded docs with planted near-dup families straddling the
    new/corpus split (ids 0,10,20 are 'new'; the rest 'corpus')."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base + " one"),            # new — near-dups 1 (corpus), 10 (new)
        (1, base + " two"),            # corpus
        (10, base + " three"),         # new
        (2, "totally different words about ships and harbors entirely"),
        (3, "totally different words about ships and harbors entirely!"),
        # corpus-only near-dup pair (2,3): must NEVER appear incrementally
        (4, "unrelated singleton content here with many unique tokens"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_pairs_incremental_equals_filtered_full(spark):
    """Property: incremental pairs == full-corpus pairs restricted to
    pairs touching the new batch (same bands, uncapped)."""
    d = _band_fixture(spark)
    new = d.where(F.col("doc_id").isin(0, 10, 20))
    corpus = d.where(~F.col("doc_id").isin(0, 10, 20))
    nb = dedup.minhash_band_table(new, text_col="text", id_col="doc_id")
    cb = dedup.minhash_band_table(corpus, text_col="text", id_col="doc_id")
    inc = {
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_pairs_incremental(nb, cb, max_bucket_size=None).collect()
    }
    full_bands = dedup.minhash_band_table(d, text_col="text", id_col="doc_id")
    full = {
        (r["id_a"], r["id_b"])
        for r in dedup.pairs_from_buckets(full_bands, max_bucket_size=None).collect()
    }
    newset = {0, 10, 20}
    expected = {p for p in full if p[0] in newset or p[1] in newset}
    assert inc == expected and len(inc) > 0
    # and the corpus-only near-dup pair (2, 3) is in full but never here
    assert (2, 3) in full and (2, 3) not in inc


def test_lsh_pairs_incremental_cap_skips_hot_corpus_buckets(spark):
    # 30 identical corpus docs collapse to identical signatures → every
    # (band, bucket) they occupy has 30 members; cap 10 must skip them all
    rows = [(i, "same text every time for this degenerate class") for i in range(1, 31)]
    rows.append((0, "same text every time for this degenerate class"))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    nb = dedup.minhash_band_table(
        d.where("doc_id = 0"), text_col="text", id_col="doc_id"
    )
    cb = dedup.minhash_band_table(
        d.where("doc_id > 0"), text_col="text", id_col="doc_id"
    )
    assert dedup.lsh_pairs_incremental(nb, cb, max_bucket_size=10).count() == 0
    assert dedup.lsh_pairs_incremental(nb, cb, max_bucket_size=None).count() == 30


def test_lsh_pairs_incremental_plan_no_cartesian(spark):
    d = _band_fixture(spark)
    nb = dedup.minhash_band_table(d.limit(2), text_col="text", id_col="doc_id")
    cb = dedup.minhash_band_table(d, text_col="text", id_col="doc_id")
    plan = (
        dedup.lsh_pairs_incremental(nb, cb)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
