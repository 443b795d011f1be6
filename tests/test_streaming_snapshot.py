"""Streaming CDC snapshot: batch parity with cdc.latest_snapshot under
multi-micro-batch shuffled/out-of-order replay, no-regression on late
older changes, tombstones for deleted keys, timeout removes state."""

from __future__ import annotations

import datetime as dt

import pandas as pd


def _ts(day):
    return dt.datetime(2024, 1, day)


# change log: (user_id, ts, event_id, event_type, value)
LOG = [
    (1, _ts(1), 1, "click", 1.0),
    (1, _ts(3), 2, "view", 3.0),     # winner for key 1
    (1, _ts(2), 3, "click", 2.0),    # late, older — must not regress
    (2, _ts(1), 4, "click", 4.0),
    (2, _ts(5), 5, "error", 0.0),    # delete wins for key 2 → tombstone
    (3, _ts(2), 6, "view", 6.0),
    (3, _ts(2), 7, "view", 7.0),     # equal ts — seq 7 wins
]


_SEQ = [0]


def _run_stream(spark, tmp_path, batches):
    _SEQ[0] += 1
    name = f"snap_out_{_SEQ[0]}"
    src = tmp_path / "in"
    src.mkdir()
    for i, rows in enumerate(batches):
        pd.DataFrame(
            rows,
            columns=["user_id", "ts", "event_id", "event_type", "value"],
        ).astype({"ts": "datetime64[us]"}).to_parquet(src / f"b{i}.parquet")

    from military_entity_extraction_based_on_large_models_spark.streaming.snapshot import (
        snapshot_stream,
    )

    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_id long, "
            "event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        snapshot_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return q, spark.sql(f"select * from {name}").collect()


def _last_write_wins(rows):
    """Apply the emitted changelog in emission order (memory sink appends
    in batch order): last emission per key is the current image."""
    img = {}
    for r in rows:
        img[r["user_id"]] = r
    return {
        k: (r["event_type"], r["value"], r["ts"])
        for k, r in img.items()
        if not r["is_deleted"]
    }


def test_batch_parity_over_shuffled_microbatches(spark, tmp_path):
    # deliver the log displaced across three micro-batches, interleaved keys
    batches = [LOG[0:3], LOG[3:5], LOG[5:7]]
    q, rows = _run_stream(spark, tmp_path, batches)
    assert len(q.recentProgress) >= 3
    got = _last_write_wins(rows)

    from military_entity_extraction_based_on_large_models_spark.operators.cdc import (
        latest_snapshot,
    )

    batch_df = spark.createDataFrame(
        LOG, "user_id long, ts timestamp, event_id long, "
             "event_type string, value double"
    )
    expect = {
        r["user_id"]: (r["event_type"], r["value"], r["ts"])
        for r in latest_snapshot(
            batch_df, ["user_id"], "ts", "event_id",
            ["event_type", "value"], op_col="event_type", delete_op="error",
        ).collect()
    }
    assert got == expect
    # deleted key 2 emitted a tombstone rather than vanishing silently
    assert any(r["user_id"] == 2 and r["is_deleted"] for r in rows)


def test_late_older_change_emits_nothing(spark, tmp_path):
    # batch 1 sets the winner; batch 2 delivers ONLY an older change
    batches = [[LOG[1]], [LOG[2]]]
    _, rows = _run_stream(spark, tmp_path, batches)
    assert len(rows) == 1 and rows[0]["value"] == 3.0


def test_timeout_invocation_removes_state():
    from military_entity_extraction_based_on_large_models_spark.streaming.snapshot import (
        _snapshot_group,
    )

    class FakeState:
        hasTimedOut = True
        exists = True
        removed = False

        def remove(self):
            self.removed = True

        def update(self, _v):
            raise AssertionError("timeout path must not re-arm state")

        def setTimeoutDuration(self, _ms):
            raise AssertionError("timeout path must not re-register")

    st = FakeState()
    assert list(_snapshot_group((1,), iter(()), st)) == []
    assert st.removed
