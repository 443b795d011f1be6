"""Exact-integer outlier flagging: hand-computed z cases, the strict
boundary, zero-variance/singleton exemption, python replay, repartition
invariance, and the aggregate+join plan gate (no window)."""

from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.operators.anomaly import flag_outliers


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, id long, v double")


def _flags(spark, rows, n_parts=None, **kw):
    df = _df(spark, rows)
    if n_parts:
        df = df.repartition(n_parts)
    out = flag_outliers(df, ["k"], "v", **kw)
    return {r["id"]: bool(r["is_outlier"]) for r in out.collect()}


def _py_flags(rows, scale=100, z=3):
    from collections import defaultdict

    groups = defaultdict(list)
    for k, i, v in rows:
        groups[k].append((i, round(v * scale)))
    out = {}
    for g in groups.values():
        n = len(g)
        s = sum(x for _, x in g)
        q = sum(x * x for _, x in g)
        for i, x in g:
            out[i] = (n * x - s) ** 2 > z * z * (n * q - s * s)
    return out


def test_obvious_outlier_flags(spark):
    rows = [("a", i, 10.0 + (i % 3)) for i in range(20)] + [("a", 99, 500.0)]
    got = _flags(spark, rows)
    assert got[99] is True
    assert sum(got.values()) == 1


def test_zero_variance_and_singleton_flag_nothing(spark):
    rows = [("c", 1, 5.0), ("c", 2, 5.0), ("c", 3, 5.0), ("solo", 9, 1.0)]
    assert _flags(spark, rows) == {1: False, 2: False, 3: False, 9: False}


def test_matches_python_replay(spark):
    import random

    rng = random.Random(7)
    rows = [
        ("g" + str(i % 3), i, round(rng.uniform(0, 50), 2))
        for i in range(120)
    ] + [("g0", 900, 5000.0), ("g1", 901, -4000.0)]
    assert _flags(spark, rows) == _py_flags(rows)


def test_repartition_invariance(spark):
    rows = [("a", i, float(i % 7)) for i in range(30)] + [("a", 99, 1e4)]
    base = _flags(spark, rows)
    for n in (1, 7):
        assert _flags(spark, rows, n_parts=n) == base


def test_plan_no_window(spark):
    rows = [("a", 1, 1.0), ("a", 2, 2.0)]
    plan = (
        flag_outliers(_df(spark, rows), ["k"], "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan and "CartesianProduct" not in plan
