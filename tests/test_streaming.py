"""Streaming: batch/stream parity of the event transforms + one real
micro-batch run via the file source."""

from __future__ import annotations

import shutil

from military_entity_extraction_based_on_large_models_spark.streaming import events as E

SF_DIR = "/root/testdata/sf0.001"


def test_windowed_counts_batch(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = E.windowed_counts(ev, window="1 day")
    rows = out.collect()
    assert rows
    total = sum(r["n_events"] for r in rows)
    assert total == ev.count()


def test_sessionize_batch(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = E.sessionize(ev, gap="1 hour").collect()
    assert out
    assert all(r["session_end"] > r["session_start"] for r in out)
    assert sum(r["n_events"] for r in out) == ev.count()


def test_stream_micro_batch(spark, tmp_path):
    src = tmp_path / "stream_in"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "events.parquet")
    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream = E.stream_from_parquet_dir(spark, str(src), schema)
    assert stream.isStreaming
    agg = E.windowed_counts(stream, window="1 day", watermark="2 days")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select sum(n_events) from win_counts").first()[0]
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert got == batch
