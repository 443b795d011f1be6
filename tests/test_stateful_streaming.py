"""Custom stateful operator: stream dedup drops replayed events across
micro-batches (GroupState persists between batches within a query)."""

from __future__ import annotations

import pandas as pd


def test_stream_dedup_across_microbatches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    # file 1: events 1..5 for user 1; file 2 replays 3..5 and adds 6..7.
    # maxFilesPerTrigger=1 forces one micro-batch per file, so dedup state
    # must survive across micro-batches for the replays to be dropped.
    pd.DataFrame({"user_id": [1] * 5, "event_id": [1, 2, 3, 4, 5]}).to_parquet(
        src / "b1.parquet"
    )
    pd.DataFrame({"user_id": [1] * 5, "event_id": [3, 4, 5, 6, 7]}).to_parquet(
        src / "b2.parquet"
    )

    from military_entity_extraction_based_on_large_models_spark.streaming.stateful import (
        dedup_stream,
    )

    stream = (
        spark.readStream.schema("user_id long, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 2  # really ran multiple micro-batches

    rows = [r["event_id"] for r in spark.sql("select * from dedup_out").collect()]
    assert sorted(rows) == [1, 2, 3, 4, 5, 6, 7]  # each emitted exactly once


def test_timeout_invocation_removes_state():
    """Round-3 review: the timeout callback re-armed state instead of
    removing it, so no group ever expired and the store grew forever."""
    from military_entity_extraction_based_on_large_models_spark.streaming.stateful import (
        _dedup_group,
    )

    class FakeState:
        hasTimedOut = True
        exists = True
        removed = False

        @property
        def get(self):
            return ([1, 2],)

        def remove(self):
            self.removed = True

        def update(self, _v):
            raise AssertionError("timeout path must not re-arm state")

        def setTimeoutDuration(self, _ms):
            raise AssertionError("timeout path must not re-register a timeout")

    st = FakeState()
    out = list(_dedup_group((7,), iter([]), st))
    assert out == [] and st.removed
