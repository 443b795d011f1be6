"""Exact substring-duplication spans (Lee et al. 2021 style, k-gram form):
hand fixture, brute-force oracle over random corpora, edge cases, and the
no-cartesian/one-window plan gate."""

from __future__ import annotations

import random

import pytest

from military_entity_extraction_based_on_large_models_spark.operators.substrdup import (
    duplicate_span_stats,
    duplicate_spans,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_spans(rows, k):
    """Independent reimplementation: mark duplicated k-gram positions,
    merge [pos, pos+k) intervals per doc."""
    toks = {i: t.split() for i, t in rows}
    from collections import Counter

    occ = Counter()
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            occ[tuple(ts[p : p + k])] += 1
    out = set()
    for i, ts in toks.items():
        hits = [
            p for p in range(len(ts) - k + 1)
            if occ[tuple(ts[p : p + k])] >= 2
        ]
        spans = []
        for p in hits:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + k)
                spans[-1][2] += 1
            else:
                spans.append([p, p + k, 1])
        for s, e, n in spans:
            out.add((i, s, e, n))
    return out


def _spark_spans(spark, rows, k):
    return {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_grams"])
        for r in duplicate_spans(_df(spark, rows), k=k).collect()
    }


def test_hand_fixture(spark):
    rows = [
        (1, "a b c d e f g h"),
        (2, "x y c d e z w"),
        (3, "a b c d e f q r a b c d e f q r"),
        (4, "short"),
        (5, ""),
    ]
    got = _spark_spans(spark, rows, 3)
    # doc1: grams at 0..3 duplicated -> one span [0,6); doc2: only 'c d e';
    # doc3: internal repeat covers everything (touching islands merge)
    assert got == {(1, 0, 6, 4), (2, 2, 5, 1), (3, 0, 16, 12)}


def test_random_corpus_vs_bruteforce(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> many collisions
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(40)
    ]
    for k in (2, 3, 5):
        assert _spark_spans(spark, rows, k) == _brute_spans(rows, k), k


def test_stats_coverage_and_empty_docs(spark):
    rows = [
        (1, "p q r s t"),
        (2, "p q r u v"),   # shares 'p q r'
        (3, "only unique words here"),
        (4, ""),
    ]
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_micro"])
        for r in duplicate_span_stats(_df(spark, rows), k=3).collect()
    }
    assert got[1] == (5, 3, 600000)
    assert got[2] == (5, 3, 600000)
    assert got[3] == (4, 0, 0)      # zero-dup doc present via left join
    assert got[4] == (0, 0, 0)      # empty doc: micro pinned to 0


def test_whole_doc_duplicates_fully_covered(spark):
    rows = [(1, "m n o p"), (2, "m n o p")]
    got = {
        r["doc_id"]: r["dup_micro"]
        for r in duplicate_span_stats(_df(spark, rows), k=2).collect()
    }
    assert got == {1: 1_000_000, 2: 1_000_000}


def test_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        duplicate_spans(_df(spark, [(1, "a b")]), k=0)


def test_parallelism_invariance(spark):
    rows = [(i, "c o m m o n p h r a s e " * 2) for i in range(20)]
    df1 = _df(spark, rows)
    a = _spark_spans(spark, rows, 4)
    b = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_grams"])
        for r in duplicate_spans(_df(spark, rows).repartition(13), k=4).collect()
    }
    assert a == b and a


def test_plan_shape(spark):
    rows = [(1, "a b c d e"), (2, "a b c d f")]
    plan = (
        duplicate_spans(_df(spark, rows), k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # island detection plans as two Window operators (running max over
    # [..,-1] and running sum over [..,0] have different frames) sharing
    # ONE partitioning+sort — no extra exchange between them
    assert plan.count("Window") == 2
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


class TestRemoveDuplicateSpans:
    def test_hand_fixture(self, spark):
        from military_entity_extraction_based_on_large_models_spark.operators.substrdup import (
            remove_duplicate_spans,
        )

        rows = [
            (1, "a b c d e f g h"),
            (2, "x y c d e z w"),
            (3, "a b c d e f q r a b c d e f q r"),
            (4, "unique only here"),
            (5, ""),
        ]
        got = {
            r["doc_id"]: (r["clean_text"], r["n_tokens"], r["kept_tokens"])
            for r in remove_duplicate_spans(_df(spark, rows), k=3).collect()
        }
        assert got[1] == ("g h", 8, 2)
        assert got[2] == ("x y z w", 7, 4)
        assert got[3] == ("", 16, 0)       # fully duplicated -> empty, kept
        assert got[4] == ("unique only here", 3, 3)
        assert got[5] == ("", 0, 0)

    def test_min_span_keeps_short_duplicates(self, spark):
        from military_entity_extraction_based_on_large_models_spark.operators.substrdup import (
            remove_duplicate_spans,
        )

        # 'c d e' (3 tokens) duplicated; min_span=4 spares it
        rows = [(1, "a b c d e f"), (2, "x c d e y")]
        got = {
            r["doc_id"]: r["clean_text"]
            for r in remove_duplicate_spans(
                _df(spark, rows), k=3, min_span=4
            ).collect()
        }
        assert got == {1: "a b c d e f", 2: "x c d e y"}
        with pytest.raises(ValueError):
            remove_duplicate_spans(_df(spark, rows), k=3, min_span=2)

    def test_idempotent_on_clean_corpus(self, spark):
        from military_entity_extraction_based_on_large_models_spark.operators.substrdup import (
            remove_duplicate_spans,
        )

        rows = [(1, "p q r s t"), (2, "p q r u v")]
        once = remove_duplicate_spans(_df(spark, rows), k=3)
        rows2 = [(r["doc_id"], r["clean_text"]) for r in once.collect()]
        twice = {
            r["doc_id"]: r["clean_text"]
            for r in remove_duplicate_spans(_df(spark, rows2), k=3).collect()
        }
        assert twice == {i: t for i, t in rows2}


def test_hash_grams_variant_matches_string_path(spark):
    """The 100 TB shuffle-width swap (xxhash64 gram keys) must be
    result-identical to the exact string path on real-shaped data."""
    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(15)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
        for i in range(30)
    ]
    plain = _spark_spans(spark, rows, 3)
    hashed = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_grams"])
        for r in duplicate_spans(_df(spark, rows), k=3, hash_grams=True).collect()
    }
    assert hashed == plain
