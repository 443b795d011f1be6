"""Scalar-function layer: IoU/area vs the reference's compute_iou, text
features, vector math — all checked against pure-Python recomputation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.functions import (
    geometry as G,
)
from military_entity_extraction_based_on_large_models_spark.functions import text as T
from military_entity_extraction_based_on_large_models_spark.functions import (
    vectors as V,
)


def _py_iou(a, b):
    # transliteration of judge/judge.py:3-28 semantics for the test oracle
    ix = max(0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    area_a = max(a[2] - a[0], 0) * max(a[3] - a[1], 0)
    area_b = max(b[2] - b[0], 0) * max(b[3] - b[1], 0)
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def test_iou_matches_reference_semantics(spark):
    cases = [
        ((0, 0, 10, 10), (0, 0, 10, 10)),   # identical → 1.0
        ((0, 0, 10, 10), (5, 5, 15, 15)),   # partial
        ((0, 0, 10, 10), (20, 20, 30, 30)), # disjoint → 0.0
        ((0, 0, 10, 10), (2, 2, 8, 8)),     # contained
        ((0, 0, 0, 0), (0, 0, 0, 0)),       # degenerate → 0.0
        ((0, 0, 10, 10), (4, 0, 14, 10)),   # IoU ≈ 0.428 (below 0.5)
        ((0, 0, 10, 10), (2, 0, 12, 10)),   # IoU ≈ 0.667 (above 0.5)
    ]
    df = spark.createDataFrame(
        [(list(a), list(b)) for a, b in cases], ["a", "b"]
    ).select(
        G.box(F.col("a")[0], F.col("a")[1], F.col("a")[2], F.col("a")[3]).alias("ba"),
        G.box(F.col("b")[0], F.col("b")[1], F.col("b")[2], F.col("b")[3]).alias("bb"),
    )
    got = [r[0] for r in df.select(G.iou(F.col("ba"), F.col("bb"))).collect()]
    for (a, b), g in zip(cases, got):
        assert math.isclose(g, _py_iou(a, b), abs_tol=1e-12), (a, b, g)


def test_text_features(spark):
    df = spark.createDataFrame(
        [("the quick brown fox and the lazy dog!!!",), ("",), ("x",)], ["t"]
    )
    rows = df.select(
        T.token_count(F.col("t")).alias("n"),
        F.round(T.punct_ratio(F.col("t")), 6).alias("p"),
        F.round(T.stopword_ratio(F.col("t")), 6).alias("s"),
        T.lang_id(F.col("t")).alias("lang"),
        T.fingerprint(F.col("t")).alias("fp"),
    ).collect()
    assert rows[0]["n"] == 8
    assert rows[0]["p"] == round(3 / len("the quick brown fox and the lazy dog!!!"), 6)
    assert rows[0]["s"] == round(3 / 8, 6)  # the, and, the
    assert rows[0]["lang"] == "en"
    assert rows[1]["n"] == 0 and rows[1]["lang"] == "und"
    # fingerprint is normalization-insensitive
    df2 = spark.createDataFrame(
        [("  THE   quick brown fox and the lazy dog!!! ",)], ["t"]
    )
    fp2 = df2.select(T.fingerprint(F.col("t"))).first()[0]
    assert fp2 == rows[0]["fp"]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], ["t"])
    got = [r[0] for r in df.select(T.shingles(F.col("t"), 3)).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == ["a b"]  # shorter than n → whole text


def test_vector_math(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [1.0, 2.0]), ([0.0, 0.0], [1.0, 1.0])],
        ["a", "b"],
    )
    rows = df.select(
        V.dot(F.col("a"), F.col("b")).alias("d"),
        V.cosine(F.col("a"), F.col("b")).alias("c"),
        V.l2_distance(F.col("a"), F.col("b")).alias("l2"),
    ).collect()
    assert rows[0]["d"] == 0.0 and rows[0]["c"] == 0.0
    assert math.isclose(rows[1]["c"], 1.0)
    assert math.isclose(rows[0]["l2"], math.sqrt(2))
    assert rows[2]["c"] == 0.0  # zero vector → defined 0


def test_text_features_are_unicode_aware(spark):
    """Round-3 review: the ASCII classes scored ordinary German/French text
    (which lang_id explicitly supports) as punctuation-heavy garbage."""
    import duckdb

    from military_entity_extraction_based_on_large_models_spark.functions import text as T

    fr = "l'école est située à côté de la gare"
    df = spark.createDataFrame([(fr,)], ["content"])
    row = df.select(
        T.punct_ratio(F.col("content")).alias("pr"),
        T.word_tokens(F.col("content")).alias("toks"),
    ).first()
    assert "école" in row["toks"] and "côté" in row["toks"]
    assert row["pr"] < 0.1  # only the apostrophe counts as punctuation

    # cross-engine: DuckDB's RE2 classes agree with Spark's Java classes
    import __spark_entry__ as mod

    con = duckdb.connect()
    lit = "'" + fr.replace("'", "''") + "'"
    o = con.execute(
        f"SELECT {mod._WORD_TOKS.replace('lower(text)', f'lower({lit})')}"
    ).fetchone()[0]
    assert o == list(row["toks"])


def test_chunk_texts_windows(spark):
    """Token-window chunking: step = size − overlap, final partial window
    kept, empty docs produce no chunks."""
    import pytest

    from military_entity_extraction_based_on_large_models_spark.functions import text as T

    doc = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(doc,), ("",)], ["content"])
    rows = df.select(T.chunk_texts(F.col("content"), size=4, overlap=1).alias("c")).collect()
    chunks = rows[0]["c"] if rows[0]["c"] else rows[1]["c"]
    # stride 3: starts 0,3,6,9 → windows [0:4),[3:7),[6:10),[9:10)
    assert chunks == [
        "t0 t1 t2 t3",
        "t3 t4 t5 t6",
        "t6 t7 t8 t9",
        "t9",
    ]
    empty = rows[1]["c"] if rows[0]["c"] else rows[0]["c"]
    assert empty == []
    with pytest.raises(ValueError, match="overlap"):
        T.chunk_texts(F.col("content"), size=4, overlap=4)


def test_pack_documents_semantics(spark):
    """Packing invariants: per-shard offsets are the running token sums in
    order_col order, no doc is split, and each bin's fill exceeds the budget
    by at most one document's tokens."""
    from collections import defaultdict

    from military_entity_extraction_based_on_large_models_spark.operators.packing import (
        pack_documents,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (5 + i % 13))) for i in range(60)],
        ["doc_id", "content"],
    )
    out = pack_documents(
        docs.repartition(7), bin_tokens=20, text_col="content",
        order_col="doc_id", shard=(F.col("doc_id") % 3).cast("bigint"),
    ).collect()
    assert len(out) == 60
    by_shard = defaultdict(list)
    for r in out:
        by_shard[r["shard"]].append(r)
    fills = defaultdict(int)
    max_doc = max(r["n_tokens"] for r in out)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rows:
            assert r["bin_offset"] == off          # running sum, in order
            assert r["bin_id"] == off // 20        # start-offset bin
            off += r["n_tokens"]
            fills[(shard, r["bin_id"])] += r["n_tokens"]
    assert all(f <= 20 + max_doc for f in fills.values())

    # default hashed-shard path runs and covers every doc exactly once
    hashed = pack_documents(docs, bin_tokens=20, text_col="content",
                            order_col="doc_id", n_shards=4)
    assert hashed.count() == 60
    assert hashed.select("shard").distinct().count() <= 4


def test_scrub_pii(spark):
    from military_entity_extraction_based_on_large_models_spark.functions import text as T
    from pyspark.sql import functions as F

    rows = [
        ("a", "mail me at jane.doe+x@sub.example.org please"),
        ("b", "card 1234567890 and pin 12345 stay"),   # 5 digits: NOT scrubbed
        ("c", "no pii here"),
        ("d", "two: a@b.co x@y.io and 999999"),
    ]
    df = spark.createDataFrame(rows, ["k", "t"])
    out = {
        r["k"]: r
        for r in df.select(
            "k",
            T.scrub_pii(F.col("t")).alias("clean"),
            T.pii_count(F.col("t"), T.PII_EMAIL).alias("ne"),
            T.pii_count(F.col("t"), T.PII_LONG_NUMBER).alias("nn"),
        ).collect()
    }
    assert out["a"]["clean"] == "mail me at <EMAIL> please" and out["a"]["ne"] == 1
    assert out["b"]["clean"] == "card <NUM> and pin 12345 stay" and out["b"]["nn"] == 1
    assert out["c"]["clean"] == "no pii here"
    assert out["d"]["clean"] == "two: <EMAIL> <EMAIL> and <NUM>"
