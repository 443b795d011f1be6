"""As-of join: point-in-time semantics against hand-computed expectations."""

from __future__ import annotations

import datetime as dt

import pytest

from military_entity_extraction_based_on_large_models_spark.operators.temporal import (
    asof_join,
)


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", _ts(10), "L1"),
            ("u1", _ts(20), "L2"),
            ("u1", _ts(5), "L0"),   # before any right row → NULL match
            ("u2", _ts(30), "L3"),  # key with no right rows at all
        ],
        ["user", "ts", "lid"],
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(8), "R8", 1.0),
            ("u1", _ts(10), "R10", 2.0),  # same-instant: matches L1 (>= rule)
            ("u1", _ts(15), "R15", 3.0),
        ],
        ["user", "ts", "rid", "rv"],
    )
    return left, right


def test_asof_backward_equal_and_null(spark):
    left, right = _frames(spark)
    out = {r["lid"]: r for r in asof_join(left, right, on="user").collect()}
    assert out["L0"]["r_rid"] is None and out["L0"]["r_rv"] is None
    assert out["L1"]["r_rid"] == "R10"  # same-ts right row included
    assert out["L2"]["r_rid"] == "R15"
    assert out["L3"]["r_rid"] is None
    # left row count preserved — as-of never multiplies rows
    assert asof_join(left, right, on="user").count() == left.count()


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r["lid"]: r
        for r in asof_join(
            left, right, on="user", tolerance_seconds=4
        ).collect()
    }
    assert out["L1"]["r_rid"] == "R10"   # staleness 0 ≤ 4
    assert out["L2"]["r_rid"] is None    # R15 is 5 s stale > 4
    assert out["L2"]["r_rv"] is None     # whole payload nulled together


def test_asof_tie_break_deterministic(spark):
    left = spark.createDataFrame([("u", _ts(10), "L")], ["user", "ts", "lid"])
    right = spark.createDataFrame(
        [("u", _ts(9), "Ra", 1.0), ("u", _ts(9), "Rb", 2.0)],
        ["user", "ts", "rid", "rv"],
    )
    # equal (key, ts) on the right: greatest payload struct wins, stably
    for _ in range(3):
        got = asof_join(left, right, on="user").first()
        assert got["r_rid"] == "Rb"


def test_asof_collision_guard(spark):
    left = spark.createDataFrame([("u", _ts(1), "x")], ["user", "ts", "r_rid"])
    right = spark.createDataFrame([("u", _ts(1), "y")], ["user", "ts", "rid"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="user")
    with pytest.raises(ValueError, match="timestamp column"):
        asof_join(left, right.drop("ts"), on="user")


def test_asof_tolerance_ntz(spark):
    # TIMESTAMP_NTZ inputs (the parquet events type): ANSI forbids ntz→double,
    # so the tolerance arithmetic must route through a timestamp cast
    left, right = _frames(spark)
    leftz = left.withColumn("ts", left["ts"].cast("timestamp_ntz"))
    rightz = right.withColumn("ts", right["ts"].cast("timestamp_ntz"))
    out = {
        r["lid"]: r
        for r in asof_join(leftz, rightz, on="user", tolerance_seconds=4).collect()
    }
    assert out["L1"]["r_rid"] == "R10" and out["L2"]["r_rid"] is None


# ---- binned range join -----------------------------------------------------

def test_range_join_containment_and_boundaries(spark):
    points = spark.createDataFrame(
        [
            ("u1", _ts(0), "P0"),    # == start → included
            ("u1", _ts(30), "P30"),
            ("u1", _ts(59), "P59"),
            ("u2", _ts(30), "Pu2"),  # right key, but u2 has no interval
        ],
        ["user", "ts", "pid"],
    )
    intervals = spark.createDataFrame(
        [("u1", _ts(0), dt.datetime(2024, 1, 1, 0, 0, 59), "I1")],
        ["user", "start", "end", "iid"],
    )
    from military_entity_extraction_based_on_large_models_spark.operators.temporal import (
        range_join,
    )

    out = range_join(
        points, intervals, on="user", point_ts="ts", bin_seconds=10
    )
    got = sorted(r["pid"] for r in out.collect())
    assert got == ["P0", "P30"]  # P59 == exclusive end → out; u2 unmatched


def test_range_join_cross_bin_and_degenerate(spark):
    from military_entity_extraction_based_on_large_models_spark.operators.temporal import (
        range_join,
    )

    points = spark.createDataFrame(
        [("u", _ts(5), "A"), ("u", _ts(25), "B"), ("u", _ts(45), "C")],
        ["user", "ts", "pid"],
    )
    intervals = spark.createDataFrame(
        [
            ("u", _ts(3), _ts(48), "WIDE"),   # spans 5 ten-second bins
            ("u", _ts(20), _ts(20), "EMPTY"), # zero-length: must match nothing
        ],
        ["user", "start", "end", "iid"],
    )
    out = range_join(points, intervals, on="user", bin_seconds=10)
    got = sorted((r["pid"], r["iv_iid"]) for r in out.collect())
    assert got == [("A", "WIDE"), ("B", "WIDE"), ("C", "WIDE")]


def test_range_join_end_on_bin_boundary_no_leak(spark):
    from military_entity_extraction_based_on_large_models_spark.operators.temporal import (
        range_join,
    )

    # interval ends exactly on a bin boundary: the boundary bin must not
    # produce candidates that survive, and a point AT the boundary is out
    points = spark.createDataFrame([("u", _ts(10), "AT_END")], ["user", "ts", "pid"])
    intervals = spark.createDataFrame(
        [("u", _ts(0), _ts(10), "I")], ["user", "start", "end", "iid"]
    )
    assert range_join(points, intervals, on="user", bin_seconds=10).count() == 0


def test_range_join_microsecond_end_near_bin_boundary(spark):
    from military_entity_extraction_based_on_large_models_spark.operators.temporal import (
        range_join,
    )

    # ADVICE r4 regression: a microsecond-fractional end just past a bin
    # boundary at a large epoch (~1.7e9 s, where a double's ulp ≈ 0.24 µs)
    # must still emit the boundary bin — the old double arithmetic could
    # round (epoch(end) - 1e-6) below the boundary and lose the candidate.
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    end = dt.datetime(2024, 1, 1, 0, 0, 10, 1)       # 10.000001 s
    pt = dt.datetime(2024, 1, 1, 0, 0, 10)           # in the boundary bin
    points = spark.createDataFrame([("u", pt, "P")], ["user", "ts", "pid"])
    intervals = spark.createDataFrame(
        [("u", base, end, "I")], ["user", "start", "end", "iid"]
    )
    out = range_join(points, intervals, on="user", bin_seconds=10)
    assert [r["pid"] for r in out.collect()] == ["P"]
    # and one microsecond EARLIER (end exactly on the boundary) excludes it
    intervals2 = spark.createDataFrame(
        [("u", base, dt.datetime(2024, 1, 1, 0, 0, 10), "I")],
        ["user", "start", "end", "iid"],
    )
    assert range_join(points, intervals2, on="user", bin_seconds=10).count() == 0


def test_asof_randomized_vs_pandas_merge_asof(spark):
    """Seeded randomized cross-check against pandas.merge_asof — an
    independent reference implementation of the backward as-of semantic
    (unique (key, ts) per side keeps both definitions unambiguous)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(123)
    base = pd.Timestamp("2024-01-01")

    def mk(n, tag):
        keys = rng.integers(0, 5, n)
        # unique per (key, ts): distinct second offsets per key
        offs = []
        seen = set()
        for k in keys:
            while True:
                o = int(rng.integers(0, 5000))
                if (k, o) not in seen:
                    seen.add((k, o))
                    offs.append(o)
                    break
        return pd.DataFrame(
            {
                "user": [f"u{k}" for k in keys],
                "ts": [base + pd.Timedelta(seconds=o) for o in offs],
                f"{tag}id": range(n),
                f"{tag}v": rng.random(n).round(4),
            }
        )

    lpdf, rpdf = mk(120, "l"), mk(80, "r")
    want = pd.merge_asof(
        lpdf.sort_values("ts"),
        rpdf.sort_values("ts"),
        on="ts",
        by="user",
        direction="backward",
    )
    got = asof_join(
        spark.createDataFrame(lpdf), spark.createDataFrame(rpdf), on="user"
    ).toPandas()

    wmap = {int(r.lid): (None if pd.isna(r.rid) else int(r.rid)) for r in want.itertuples()}
    gmap = {int(r.lid): (None if pd.isna(r.r_rid) else int(r.r_rid)) for r in got.itertuples()}
    assert gmap == wmap


def test_internal_column_guards(spark):
    import pytest

    left = spark.createDataFrame([("u", _ts(1), 1)], ["user", "ts", "_tag"])
    right = spark.createDataFrame([("u", _ts(1), 1.0)], ["user", "ts", "rv"])
    with pytest.raises(ValueError, match="internals"):
        asof_join(left, right, on="user")
    from military_entity_extraction_based_on_large_models_spark.operators.temporal import (
        range_join,
    )

    pts = spark.createDataFrame([("u", _ts(1), 0)], ["user", "ts", "_bin"])
    iv = spark.createDataFrame([("u", _ts(0), _ts(2), 1)], ["user", "start", "end", "iid"])
    with pytest.raises(ValueError, match="_bin"):
        range_join(pts, iv, on="user")


def test_range_join_randomized_vs_bruteforce(spark):
    """Seeded randomized equivalence: binned equi-join composition vs the
    direct O(n*m) containment scan in pandas, across bin widths that divide
    and don't divide the interval lengths."""
    import numpy as np
    import pandas as pd

    from military_entity_extraction_based_on_large_models_spark.operators.temporal import (
        range_join,
    )

    rng = np.random.default_rng(77)
    base = pd.Timestamp("2024-01-01")
    pts = pd.DataFrame(
        {
            "user": [f"u{k}" for k in rng.integers(0, 4, 150)],
            "ts": [base + pd.Timedelta(seconds=int(s)) for s in rng.integers(0, 2000, 150)],
            "pid": range(150),
        }
    )
    starts = rng.integers(0, 1900, 40)
    spans = rng.integers(0, 400, 40)  # includes zero-length
    ivs = pd.DataFrame(
        {
            "user": [f"u{k}" for k in rng.integers(0, 4, 40)],
            "start": [base + pd.Timedelta(seconds=int(s)) for s in starts],
            "end": [base + pd.Timedelta(seconds=int(s + w)) for s, w in zip(starts, spans)],
            "iid": range(40),
        }
    )
    want = {
        (int(p.pid), int(i.iid))
        for p in pts.itertuples()
        for i in ivs.itertuples()
        if p.user == i.user and i.start <= p.ts < i.end
    }
    for bin_seconds in (60, 128, 1000):
        got = {
            (int(r["pid"]), int(r["iv_iid"]))
            for r in range_join(
                spark.createDataFrame(pts),
                spark.createDataFrame(ivs),
                on="user",
                bin_seconds=bin_seconds,
            ).collect()
        }
        assert got == want, bin_seconds


def test_asof_bucketed_equals_unbucketed(spark):
    """The hot-key bucketed path must be EXACT: same answers as the plain
    per-key window for bucket widths smaller than, comparable to, and larger
    than the data span — including buckets where a key has only left rows
    (carry from strictly-earlier buckets) and same-instant matches."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(5)
    base = pd.Timestamp("2024-01-01")
    lpdf = pd.DataFrame(
        {
            "user": [f"u{k}" for k in rng.integers(0, 3, 200)],
            "ts": [base + pd.Timedelta(seconds=int(s)) for s in rng.choice(20000, 200, replace=False)],
            "lid": range(200),
        }
    )
    rpdf = pd.DataFrame(
        {
            "user": [f"u{k}" for k in rng.integers(0, 3, 60)],
            "ts": [base + pd.Timedelta(seconds=int(s)) for s in rng.choice(20000, 60, replace=False)],
            "rid": range(60),
        }
    )
    l, r = spark.createDataFrame(lpdf), spark.createDataFrame(rpdf)

    def result(**kw):
        return {
            r_["lid"]: r_["r_rid"]
            for r_ in asof_join(l, r, on="user", **kw).collect()
        }

    want = result()
    for bucket in (60, 1000, 10**6):
        assert result(bucket_seconds=bucket) == want, bucket
    # tolerance composes with bucketing identically
    want_tol = result(tolerance_seconds=500)
    assert result(tolerance_seconds=500, bucket_seconds=300) == want_tol


def test_asof_auto_engages_bucketed_path(spark):
    """asof_join_auto must flip to the bucketed plan on a hot key (the plan
    gains the carry JOIN the plain path provably lacks) and keep results
    identical to the unbucketed answer — the exactness-preserving switch."""
    import numpy as np
    import pandas as pd

    from military_entity_extraction_based_on_large_models_spark.operators.temporal import (
        asof_join_auto,
    )

    rng = np.random.default_rng(11)
    base = pd.Timestamp("2024-01-01")
    lpdf = pd.DataFrame(
        {
            "user": ["hot"] * 300 + ["cold"] * 10,
            "ts": [base + pd.Timedelta(seconds=int(s)) for s in rng.choice(50000, 310, replace=False)],
            "lid": range(310),
        }
    )
    rpdf = pd.DataFrame(
        {
            "user": ["hot"] * 80 + ["cold"] * 5,
            "ts": [base + pd.Timedelta(seconds=int(s)) for s in rng.choice(50000, 85, replace=False)],
            "rid": range(85),
        }
    )
    l, r = spark.createDataFrame(lpdf), spark.createDataFrame(rpdf)
    want = {r_["lid"]: r_["r_rid"] for r_ in asof_join(l, r, on="user").collect()}

    hot = asof_join_auto(l, r, on="user", hot_rows_threshold=100)
    cold = asof_join_auto(l, r, on="user", hot_rows_threshold=100_000)
    assert {r_["lid"]: r_["r_rid"] for r_ in hot.collect()} == want
    assert {r_["lid"]: r_["r_rid"] for r_ in cold.collect()} == want
    assert "Join" in hot._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in cold._jdf.queryExecution().executedPlan().toString()
