"""BM25 ranking and deterministic weighted sampling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.operators import ranking


def _corpus(spark):
    rows = [
        (1, "sort merge join sort merge"),
        (2, "sort sort sort sort sort sort sort sort"),
        (3, "hash scan vector join"),
        (4, "completely unrelated words here"),
        (5, "merge join"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bm25_against_hand_formula(spark):
    """Score of doc 5 for query 'merge join' recomputed by hand with the
    exact BM25 constants and the micro-unit rounding."""
    d = _corpus(spark)
    out = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in ranking.bm25_scores(d, [(7, "merge join")], k=10).collect()
    }
    n, avgdl = 5, (5 + 8 + 4 + 4 + 2) / 5
    dl = 2

    def contrib(tf, df):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        c = idf * tf / (tf + ranking.BM25_K1 * (1 - ranking.BM25_B + ranking.BM25_B * dl / avgdl))
        return round(c * 1_000_000)

    want = (contrib(1, 2) + contrib(1, 3)) / 1_000_000  # merge df=2, join df=3
    assert abs(out[(7, 5)] - round(want, 6)) < 1e-9
    # relevance sanity: doc 4 (no query terms) is absent
    assert (7, 4) not in out


def test_bm25_ranking_properties(spark):
    d = _corpus(spark)
    rows = ranking.bm25_scores(d, [(1, "sort")], k=10).collect()
    ranked = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    # doc 2 spams 'sort' (tf 8) but is long; doc 1 has tf 2 at moderate
    # length — BM25's tf saturation keeps 2 ahead but not 4x ahead
    scores = {r["doc_id"]: r["score"] for r in rows}
    assert set(ranked) == {1, 2}
    assert scores[2] > scores[1] < 2 * scores[2]


def test_stratified_sample_counts_and_invariance(spark):
    rows = [(i, "en" if i % 4 else "de", f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = ranking.stratified_sample(df, ["lang", "source"], k=5).collect()
    per = {}
    for r in out:
        per.setdefault((r["lang"], r["source"]), []).append(r["rank"])
    # every (lang, source) stratum contributes exactly min(k, |stratum|)
    # rows with ranks 1..n
    assert set(per) == {(l, s) for l in ("en", "de") for s in ("s0", "s1", "s2")}
    assert all(sorted(v) == list(range(1, 6)) for v in per.values())
    # bit-deterministic under repartition AND under the forced salted path
    key = lambda rs: sorted((r["doc_id"], r["rank"]) for r in rs)
    out2 = ranking.stratified_sample(
        df.repartition(11), ["lang", "source"], k=5
    ).collect()
    out3 = ranking.stratified_sample(
        df, ["lang", "source"], k=5, hot_rows_threshold=1
    ).collect()
    assert key(out) == key(out2) == key(out3)


def test_weighted_sample_deterministic_and_biased(spark):
    rows = [(i, 1 + (100 if i % 10 == 0 else 0)) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, weight long")
    s1 = {r["doc_id"] for r in ranking.weighted_sample(df, "weight", 100).collect()}
    s2 = {r["doc_id"] for r in ranking.weighted_sample(df.repartition(13), "weight", 100).collect()}
    assert s1 == s2 and len(s1) == 100  # bit-deterministic draw
    heavy = sum(1 for d in s1 if d % 10 == 0)
    # 100 heavy docs at weight 101 vs 900 light at weight 1: the heavy
    # stratum must dominate the sample
    assert heavy > 80
    # different seed → different draw
    s3 = {r["doc_id"] for r in ranking.weighted_sample(df, "weight", 100, seed="other").collect()}
    assert s1 != s3


def test_weighted_sample_plan_take_ordered(spark):
    """The draw must plan as TakeOrderedAndProject (map-side partial top-k),
    never a global sort or a one-reducer window."""
    df = spark.createDataFrame(
        [(i, i % 5 + 1) for i in range(100)], "doc_id long, weight long"
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        ranking.weighted_sample(df, "weight", 10)._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan and "Exchange rangepartitioning" not in plan
