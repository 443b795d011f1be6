"""Streaming KG construction: true-streaming extraction plan parity,
incremental micro-batches through the lineage sink, and replay idempotency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.plans.pipeline import (
    kg_pipeline,
)
from military_entity_extraction_based_on_large_models_spark.sources.documents import (
    read_driver_documents,
)
from military_entity_extraction_based_on_large_models_spark.sources.gazetteer import (
    MILITARY_GAZETTEER,
    VOCAB_GAZETTEER,
)
from military_entity_extraction_based_on_large_models_spark.streaming import (
    documents as SD,
)

SF_DIR = "/root/testdata/sf0.001"


def _doc_halves(spark):
    docs = read_driver_documents(spark, SF_DIR).drop("doc_sha")
    half_a = docs.where(F.col("path").cast("long") % 2 == 0)
    half_b = docs.where(F.col("path").cast("long") % 2 == 1)
    return docs, half_a, half_b


def test_stream_kg_triples_matches_batch(spark, tmp_path):
    """The flagship plan runs AS a streaming query and emits exactly the
    batch pipeline's triples — proof the stateless path has no batch-only
    plan node."""
    docs, half_a, _ = _doc_halves(spark)
    src = tmp_path / "src"
    half_a.coalesce(1).write.parquet(str(src))
    stream = SD.stream_documents(spark, str(src), half_a.schema)
    assert stream.isStreaming

    triples = SD.stream_kg_triples(stream, VOCAB_GAZETTEER)
    out = tmp_path / "sink"
    q = (
        triples.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(str(out))
    want = kg_pipeline(half_a, VOCAB_GAZETTEER)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stream_kg_triples_rejects_ambiguous_gazetteer(spark, tmp_path):
    docs, half_a, _ = _doc_halves(spark)
    src = tmp_path / "src"
    half_a.limit(1).coalesce(1).write.parquet(str(src))
    stream = SD.stream_documents(spark, str(src), half_a.schema)
    with pytest.raises(ValueError, match="foreachBatch"):
        SD.stream_kg_triples(stream, MILITARY_GAZETTEER)
    with pytest.raises(ValueError, match="batch"):
        SD.stream_kg_triples(half_a, VOCAB_GAZETTEER)


def test_streaming_incremental_then_catchup(spark, tmp_path):
    """availableNow catch-up runs: first run drains file A; file B lands;
    second run (same checkpoint) processes ONLY B; the union of per-batch
    outputs equals the batch pipeline over A ∪ B."""
    docs, half_a, half_b = _doc_halves(spark)
    src = tmp_path / "src"
    out = str(tmp_path / "kg")
    ckpt = str(tmp_path / "ckpt")
    half_a.coalesce(1).write.mode("append").parquet(str(src))

    stream = SD.stream_documents(spark, str(src), half_a.schema)
    q = SD.run_streaming_resumable(
        stream, out, ckpt, gazetteer=VOCAB_GAZETTEER, n_buckets=4
    )
    q.awaitTermination(180)
    n_a = SD.read_streamed_triples(spark, out).count()
    assert n_a == kg_pipeline(half_a, VOCAB_GAZETTEER).count()

    half_b.coalesce(1).write.mode("append").parquet(str(src))
    q = SD.run_streaming_resumable(
        SD.stream_documents(spark, str(src), half_a.schema),
        out, ckpt, gazetteer=VOCAB_GAZETTEER, n_buckets=4,
    )
    q.awaitTermination(180)

    got = SD.read_streamed_triples(spark, out)
    want = kg_pipeline(docs, VOCAB_GAZETTEER)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_streaming_replay_is_idempotent(spark, tmp_path):
    """A micro-batch replayed after a crash-before-commit (same batch_df,
    same batch_id) must not duplicate rows — the lineage writer truncates
    and rewrites the same buckets."""
    _, half_a, _ = _doc_halves(spark)
    out = str(tmp_path / "kg")
    SD.write_batch_with_lineage(
        half_a, 0, out, gazetteer=VOCAB_GAZETTEER, n_buckets=4
    )
    first = SD.read_streamed_triples(spark, out)
    n_first = first.count()
    assert n_first > 0

    SD.write_batch_with_lineage(
        half_a, 0, out, gazetteer=VOCAB_GAZETTEER, n_buckets=4
    )
    again = SD.read_streamed_triples(spark, out)
    assert again.count() == n_first
    assert again.exceptAll(kg_pipeline(half_a, VOCAB_GAZETTEER)).count() == 0


def test_compact_streamed_triples(spark, tmp_path):
    """Compaction folds the batch history into one bucket-partitioned dataset
    with identical rows; the batch dirs stay untouched."""
    _, half_a, half_b = _doc_halves(spark)
    out = str(tmp_path / "kg")
    SD.write_batch_with_lineage(half_a, 0, out, gazetteer=VOCAB_GAZETTEER, n_buckets=4)
    SD.write_batch_with_lineage(half_b, 1, out, gazetteer=VOCAB_GAZETTEER, n_buckets=4)
    target = str(tmp_path / "compact")
    SD.compact_streamed_triples(spark, out, target, n_buckets=8)

    want = SD.read_streamed_triples(spark, out)
    got = spark.read.parquet(target + "/data").drop("part_bucket")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    # history untouched
    assert SD.read_streamed_triples(spark, out).count() == want.count()


def test_empty_micro_batch_does_not_break_history_read(spark, tmp_path):
    """Round-3 review: a micro-batch whose docs match nothing leaves a data
    dir with only _SUCCESS; the history read must skip it, not crash with
    UNABLE_TO_INFER_SCHEMA."""
    _, half_a, half_b = _doc_halves(spark)
    out = str(tmp_path / "kg")
    # batch 0: empty gazetteer → zero triples
    SD.write_batch_with_lineage(half_a, 0, out, gazetteer=[], n_buckets=4)
    with pytest.raises(FileNotFoundError, match="zero triples"):
        SD.read_streamed_triples(spark, out)
    # batch 1: real triples — history read recovers, empty batch skipped
    SD.write_batch_with_lineage(half_b, 1, out, gazetteer=VOCAB_GAZETTEER, n_buckets=4)
    got = SD.read_streamed_triples(spark, out)
    assert got.count() == kg_pipeline(half_b, VOCAB_GAZETTEER).count()


def test_stream_kg_triples_arrow_path_matches_batch(spark, tmp_path):
    """Same parity proof for the mapInArrow extraction regime: a dictionary
    past EXPR_GAZETTEER_MAX routes to the Arrow stage, which must run
    unchanged as a streaming query (mapInArrow is streaming-compatible)."""
    from military_entity_extraction_based_on_large_models_spark.operators.triples import (
        EXPR_GAZETTEER_MAX,
    )

    _, half_a, _ = _doc_halves(spark)
    # vocab aliases (which really match) + padding past the JVM-path cutoff
    big_gaz = list(VOCAB_GAZETTEER) + [
        (f"zz_pad_{i}", f"ent_pad{i}", "other")
        for i in range(EXPR_GAZETTEER_MAX + 10)
    ]
    assert len(big_gaz) > EXPR_GAZETTEER_MAX

    src = tmp_path / "src"
    half_a.coalesce(1).write.parquet(str(src))
    stream = SD.stream_documents(spark, str(src), half_a.schema)
    triples = SD.stream_kg_triples(stream, big_gaz)
    out = tmp_path / "sink"
    q = (
        triples.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(str(out))
    want = kg_pipeline(half_a, big_gaz)
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
