"""SCD2 history + latest-snapshot: interval semantics, delete handling,
determinism under ties/repartition, cross-implementation equality
(window-route history vs algebraic-aggregate snapshot), plan gates."""

import datetime as dt

from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.operators.cdc import (
    latest_snapshot,
    scd2_history,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "k string, ts timestamp, seq long, v string, op string"
    )


FIX = [
    # key a: insert, update, update — open interval on the last
    ("a", _ts("2024-01-01T00:00:00"), 1, "a1", "upsert"),
    ("a", _ts("2024-01-02T00:00:00"), 2, "a2", "upsert"),
    ("a", _ts("2024-01-03T00:00:00"), 3, "a3", "upsert"),
    # key b: insert then DELETE — no current interval
    ("b", _ts("2024-01-01T00:00:00"), 4, "b1", "upsert"),
    ("b", _ts("2024-01-05T00:00:00"), 5, None, "delete"),
    # key c: equal-ts tie broken by seq
    ("c", _ts("2024-01-01T00:00:00"), 7, "c-late", "upsert"),
    ("c", _ts("2024-01-01T00:00:00"), 6, "c-early", "upsert"),
    # key d: delete then re-insert — delete closes, re-insert reopens
    ("d", _ts("2024-01-01T00:00:00"), 8, "d1", "upsert"),
    ("d", _ts("2024-01-02T00:00:00"), 9, None, "delete"),
    ("d", _ts("2024-01-03T00:00:00"), 10, "d2", "upsert"),
]


def _hist(spark, rows=FIX, n_parts=None):
    df = _changes(spark, rows)
    if n_parts:
        df = df.repartition(n_parts)
    return scd2_history(
        df, ["k"], "ts", "seq", ["v"], op_col="op", delete_op="delete"
    )


def _snap(spark, rows=FIX):
    return latest_snapshot(
        _changes(spark, rows), ["k"], "ts", "seq", ["v"],
        op_col="op", delete_op="delete",
    )


class TestHistory:
    def test_intervals_deletes_and_ties(self, spark):
        got = {
            (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in _hist(spark).collect()
        }
        assert got == {
            ("a", "a1", _ts("2024-01-01T00:00:00"), _ts("2024-01-02T00:00:00"), False),
            ("a", "a2", _ts("2024-01-02T00:00:00"), _ts("2024-01-03T00:00:00"), False),
            ("a", "a3", _ts("2024-01-03T00:00:00"), None, True),
            # b1's interval is CLOSED by the delete's timestamp
            ("b", "b1", _ts("2024-01-01T00:00:00"), _ts("2024-01-05T00:00:00"), False),
            # equal-ts: seq 6 precedes seq 7, so c-early's interval is
            # zero-length and c-late is current
            ("c", "c-early", _ts("2024-01-01T00:00:00"), _ts("2024-01-01T00:00:00"), False),
            ("c", "c-late", _ts("2024-01-01T00:00:00"), None, True),
            ("d", "d1", _ts("2024-01-01T00:00:00"), _ts("2024-01-02T00:00:00"), False),
            ("d", "d2", _ts("2024-01-03T00:00:00"), None, True),
        }

    def test_repartition_invariance(self, spark):
        base = sorted(map(tuple, _hist(spark).collect()))
        for n in (1, 7):
            assert sorted(map(tuple, _hist(spark, n_parts=n).collect())) == base

    def test_no_op_col_keeps_everything(self, spark):
        rows = [("a", _ts("2024-01-01T00:00:00"), 1, "x", "delete")]
        got = scd2_history(_changes(spark, rows), ["k"], "ts", "seq", ["v"]).collect()
        assert len(got) == 1 and got[0]["is_current"]

    def test_single_exchange_plan(self, spark):
        plan = (
            _hist(spark)._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") == 1


class TestSnapshot:
    def test_snapshot_values(self, spark):
        got = {(r["k"], r["v"], r["ts"]) for r in _snap(spark).collect()}
        # b's latest change is a delete → dropped entirely
        assert got == {
            ("a", "a3", _ts("2024-01-03T00:00:00")),
            ("c", "c-late", _ts("2024-01-01T00:00:00")),
            ("d", "d2", _ts("2024-01-03T00:00:00")),
        }

    def test_snapshot_equals_current_history(self, spark):
        """Cross-implementation gate: the algebraic max(struct) route must
        agree exactly with the window route's open intervals."""
        snap = sorted(
            (r["k"], r["v"], r["ts"]) for r in _snap(spark).collect()
        )
        cur = sorted(
            (r["k"], r["v"], r["valid_from"])
            for r in _hist(spark).where("is_current").collect()
        )
        assert snap == cur

    def test_snapshot_plan_partial_agg_no_window(self, spark):
        """Scale gate: the snapshot must be a partial+final hash aggregate
        (map-side pre-reduction of hot keys), never a Window."""
        plan = (
            _snap(spark)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan
        assert "partial_max" in plan


def test_snapshot_equals_current_history_on_events(spark):
    """Same cross-implementation gate on the real sf0.001 changelog fixture
    (the driver query's shape: 'error' events are deletes)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    hist = scd2_history(
        ev, ["user_id"], "ts", "event_id", ["event_type", "value"],
        op_col="event_type", delete_op="error",
    )
    snap = latest_snapshot(
        ev, ["user_id"], "ts", "event_id", ["event_type", "value"],
        op_col="event_type", delete_op="error",
    )
    a = sorted(
        (r["user_id"], r["event_type"], r["value"], r["ts"])
        for r in snap.collect()
    )
    b = sorted(
        (r["user_id"], r["event_type"], r["value"], r["valid_from"])
        for r in hist.where("is_current").collect()
    )
    assert a == b and len(a) > 0
