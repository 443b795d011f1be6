"""Interval union (gaps-and-islands): overlap/nest/touch/disjoint
semantics, the covered-interval regression (running max, not lag),
determinism under repartition, and the two-exchange plan gate."""

import datetime as dt

from military_entity_extraction_based_on_large_models_spark.operators.intervals import (
    coverage_stats,
    merge_intervals,
)


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def _df(spark, rows):
    # rows: (key, start_minute, end_minute, seq)
    return spark.createDataFrame(
        [(k, _ts(s), _ts(e), i) for k, s, e, i in rows],
        "user_id string, start timestamp, end timestamp, event_id long",
    )


FIX = [
    # key a: [0,10) ∪ [5,12) overlap → island 1 [0,12); [12,15) touches
    # → still island 1 (contiguous coverage); [20,25) disjoint → island 2
    ("a", 0, 10, 1), ("a", 5, 12, 2), ("a", 12, 15, 3), ("a", 20, 25, 4),
    # key b: long [0,30) COVERS [5,8) and [10,12) — the running-max case:
    # a lag-based impl would wrongly split at [10,12)
    ("b", 0, 30, 5), ("b", 5, 8, 6), ("b", 10, 12, 7),
]


def _merged(spark, rows=FIX, n_parts=None):
    df = _df(spark, rows)
    if n_parts:
        df = df.repartition(n_parts)
    out = merge_intervals(df, ["user_id"], "start", "end", ("event_id",))
    return sorted(
        (r["user_id"], r["island"], r["start"].minute + 60 * r["start"].hour,
         r["end"].minute + 60 * r["end"].hour, r["n_intervals"],
         r["covered_us"])
        for r in out.collect()
    )


def test_overlap_touch_disjoint_and_covered(spark):
    assert _merged(spark) == [
        ("a", 1, 0, 15, 3, 15 * 60_000_000),
        ("a", 2, 20, 25, 1, 5 * 60_000_000),
        ("b", 1, 0, 30, 3, 30 * 60_000_000),
    ]


def test_repartition_invariance(spark):
    base = _merged(spark)
    for n in (1, 7):
        assert _merged(spark, n_parts=n) == base


def test_degenerate_zero_length_interval(spark):
    rows = [("k", 5, 5, 1), ("k", 0, 10, 2)]
    assert _merged(spark, rows) == [("k", 1, 0, 10, 2, 10 * 60_000_000)]


def test_coverage_stats_rollup(spark):
    got = {
        (r["user_id"], r["covered_us"], r["n_islands"], r["n_intervals"])
        for r in coverage_stats(
            _df(spark, FIX), ["user_id"], "start", "end", ("event_id",)
        ).collect()
    }
    assert got == {
        ("a", 20 * 60_000_000, 2, 4),
        ("b", 30 * 60_000_000, 1, 3),
    }


def test_plan_two_exchanges_no_join(spark):
    plan = (
        merge_intervals(_df(spark, FIX), ["user_id"], "start", "end",
                        ("event_id",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 2
