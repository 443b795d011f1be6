"""Gap-based sessionization: hand-checked assignment, determinism, and a
pure-Python replay oracle on a randomized fixture."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.operators.sessions import (
    session_stats,
    sessionize,
)

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, user, offset_s, value=1.0):
    return (eid, _T0 + dt.timedelta(seconds=offset_s), user, value)


def _frame(spark, rows):
    return spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])


def test_hand_checked_assignment(spark):
    # user 1: gaps 10, 2000, 10 with gap=1800 → sessions 1,1,2,2
    # user 2: single event → session 1
    rows = [
        _ev(1, 1, 0),
        _ev(2, 1, 10),
        _ev(3, 1, 2010),
        _ev(4, 1, 2020),
        _ev(5, 2, 50),
    ]
    out = sessionize(_frame(spark, rows), gap_seconds=1800)
    got = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_exact_gap_is_same_session(spark):
    # the boundary is STRICTLY greater-than: a gap of exactly gap_seconds
    # stays in the session
    rows = [_ev(1, 1, 0), _ev(2, 1, 1800), _ev(3, 1, 3601)]
    out = sessionize(_frame(spark, rows), gap_seconds=1800)
    got = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2}


def test_equal_ts_tiebreak_deterministic(spark):
    # two events at the identical timestamp: event_id orders them; both in
    # one session regardless of physical row order
    rows = [_ev(2, 1, 0), _ev(1, 1, 0), _ev(3, 1, 5000)]
    for parts in (1, 7):
        out = sessionize(
            _frame(spark, rows).repartition(parts), gap_seconds=1800
        )
        got = {r["event_id"]: r["session_seq"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 2}


def _python_replay(rows, gap_s):
    """Independent third implementation: per-user scan in sorted order."""
    sessions = {}
    by_user = {}
    for eid, ts, user, value in rows:
        by_user.setdefault(user, []).append((ts, eid, value))
    for user, evs in by_user.items():
        evs.sort()
        seq, prev = 0, None
        for ts, eid, value in evs:
            if prev is None or (ts - prev).total_seconds() > gap_s:
                seq += 1
            prev = ts
            sessions.setdefault((user, seq), []).append((ts, value))
    out = {}
    for (user, seq), evs in sessions.items():
        tss = [t for t, _ in evs]
        out[(user, seq)] = (
            min(tss),
            max(tss),
            len(evs),
            int((max(tss) - min(tss)).total_seconds()),
            round(sum(v for _, v in evs), 2),
        )
    return out


def test_session_stats_matches_python_replay(spark):
    rng = random.Random(20260817)
    rows = []
    for eid in range(400):
        rows.append(
            _ev(
                eid,
                rng.randrange(8),
                rng.randrange(0, 200_000),
                round(rng.uniform(0, 50), 2),
            )
        )
    got = {
        (r["user_id"], r["session_seq"]): (
            r["session_start"],
            r["session_end"],
            r["n_events"],
            r["duration_s"],
            r["total_value"],
        )
        for r in session_stats(
            _frame(spark, rows).repartition(13), gap_seconds=3600
        ).collect()
    }
    want = _python_replay(rows, 3600)
    assert got == want


def test_sessionize_preserves_all_rows_and_columns(spark):
    rows = [_ev(i, i % 3, i * 100) for i in range(30)]
    df = _frame(spark, rows)
    out = sessionize(df, gap_seconds=150)
    assert out.count() == 30
    assert set(out.columns) == set(df.columns) | {"session_seq"}
    # session_seq is 1-based and contiguous per user
    for user in range(3):
        seqs = sorted(
            r["session_seq"]
            for r in out.where(F.col("user_id") == user).collect()
        )
        assert seqs[0] == 1
        assert set(seqs) == set(range(1, max(seqs) + 1))
