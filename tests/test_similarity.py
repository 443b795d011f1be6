"""Similarity search: brute-force exactness + LSH recall on real testdata."""

from __future__ import annotations

import numpy as np

from military_entity_extraction_based_on_large_models_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"


def _load(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.limit(5).selectExpr("vec_id as query_id", "embedding")
    return emb, queries


def test_brute_force_topk_matches_numpy(spark):
    emb, queries = _load(spark)
    got = similarity.brute_force_topk(emb, queries, k=5).collect()
    rows = emb.collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    norms = np.linalg.norm(mat, axis=1)
    qrows = queries.collect()
    for q in qrows:
        qv = np.array(q["embedding"], dtype=np.float64)
        cos = mat @ qv / (norms * np.linalg.norm(qv))
        order = sorted(zip(-cos, ids))[:5]
        expected = [int(i) for _, i in order]
        mine = [
            r["neighbor_id"]
            for r in sorted(
                (r for r in got if r["query_id"] == q["query_id"]),
                key=lambda r: r["rank"],
            )
        ]
        assert mine == expected, (q["query_id"], mine, expected)


def test_ivf_topk_recall_and_self_hit(spark):
    emb, queries = _load(spark)
    exact = similarity.brute_force_topk(emb, queries, k=10).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx = similarity.ivf_topk(emb, queries, k=10, bits=4, probe_hamming=1).collect()
    s = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert all((q, q) in s for q in {r["query_id"] for r in exact})
    recall = len(exact_set & s) / len(exact_set)
    assert recall >= 0.3, recall  # deterministic on this data


def test_lsh_topk_recall(spark):
    emb, queries = _load(spark)
    exact = similarity.brute_force_topk(emb, queries, k=10).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}

    def recall(h):
        approx = similarity.lsh_topk(
            emb, queries, k=10, n_planes=6, probe_hamming=h
        ).collect()
        s = {(r["query_id"], r["neighbor_id"]) for r in approx}
        # every query's own vector must be found (sketch identical)
        assert all((q, q) in s for q in {r["query_id"] for r in exact})
        return len(exact_set & s) / len(exact_set)

    r1, r2 = recall(1), recall(2)
    # deterministic on this data: measured 0.34 / 0.60; floors leave a small
    # margin, and widening the probe radius must never lose candidates
    assert r1 >= 0.3, r1
    assert r2 >= 0.55, r2
    assert r2 >= r1
