"""Streaming as-of enrichment: batch parity under in-order arrival, state
persistence across micro-batches, and pre-state NULL matches."""

from __future__ import annotations

import datetime as dt

import pandas as pd


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_latest_value_join_across_microbatches(spark, tmp_path):
    lsrc, rsrc = tmp_path / "l", tmp_path / "r"
    lsrc.mkdir(), rsrc.mkdir()
    # batch 1 (minutes 0-9): rights at 1 and 5; lefts at 0 (pre-state → NULL),
    # 3 (→ r10), 5 (same-instant → r11, the >= rule)
    pd.DataFrame(
        {"user_id": [1, 1], "ts": [_ts(1), _ts(5)], "event_id": [10, 11],
         "value": [1.5, 2.5]}
    ).to_parquet(rsrc / "b1.parquet", coerce_timestamps="us")
    pd.DataFrame(
        {"user_id": [1, 1, 1], "ts": [_ts(0), _ts(3), _ts(5)],
         "event_id": [100, 101, 102]}
    ).to_parquet(lsrc / "b1.parquet", coerce_timestamps="us")
    # batch 2 (minutes 10+): left at 12 must see batch-1 state (r11) — state
    # survives the micro-batch boundary; then right 12 at minute 14, left 15
    pd.DataFrame(
        {"user_id": [1], "ts": [_ts(14)], "event_id": [12], "value": [3.5]}
    ).to_parquet(rsrc / "b2.parquet", coerce_timestamps="us")
    pd.DataFrame(
        {"user_id": [1, 1], "ts": [_ts(12), _ts(15)], "event_id": [103, 104]}
    ).to_parquet(lsrc / "b2.parquet", coerce_timestamps="us")

    from military_entity_extraction_based_on_large_models_spark.streaming.enrich import (
        latest_value_join,
    )

    left = (
        spark.readStream.schema("user_id long, ts timestamp_ntz, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(lsrc))
    )
    right = (
        spark.readStream.schema(
            "user_id long, ts timestamp_ntz, event_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(rsrc))
    )
    q = (
        latest_value_join(left, right)
        .writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        r["event_id"]: (r["r_event_id"], r["r_value"])
        for r in spark.sql("select * from enrich_out").collect()
    }
    assert got[100] == (None, None)      # before any right row
    assert got[101] == (10, 1.5)
    assert got[102] == (11, 2.5)         # same-instant right matches
    assert got[103] == (11, 2.5)         # state survived the batch boundary
    assert got[104] == (12, 3.5)

    # batch parity: the same data through the batch as-of join agrees
    from military_entity_extraction_based_on_large_models_spark.operators.temporal import (
        asof_join,
    )

    lb = spark.read.parquet(str(lsrc))
    rb = spark.read.parquet(str(rsrc))
    batch = {
        r["event_id"]: (r["r_event_id"], r["r_value"])
        for r in asof_join(lb, rb, on="user_id").collect()
    }
    assert batch == got


def test_enrich_timeout_removes_state():
    from military_entity_extraction_based_on_large_models_spark.streaming.enrich import (
        _enrich_group,
    )

    class FakeState:
        hasTimedOut = True
        exists = True
        removed = False

        def remove(self):
            self.removed = True

    st = FakeState()
    assert list(_enrich_group((1,), iter([]), st)) == []
    assert st.removed
