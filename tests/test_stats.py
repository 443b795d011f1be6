"""Exact discrete quantiles: type-1 semantics on hand-checked boundaries."""

from __future__ import annotations

import pytest

from military_entity_extraction_based_on_large_models_spark.operators.stats import (
    exact_discrete_quantiles,
)


def test_exact_quantiles_type1_boundaries(spark):
    # n=4, values 10,20,30,40: type-1 p25=10 (cum 1*100 >= 25*4), p50=20
    # (exact boundary 2*100 == 50*4 → the LOWER value), p75=30, p95=40
    df = spark.createDataFrame([(v,) for v in (40, 10, 30, 20)], ["x"])
    r = exact_discrete_quantiles(df, "x").first()
    assert (r["p25"], r["p50"], r["p75"], r["p95"], r["n"]) == (10, 20, 30, 40, 4)

    # skewed multiset: 1 ×97, 100 ×3 → p95 = 1 (cum 97*100 >= 95*100), p99 would be 100
    df2 = spark.createDataFrame([(1,)] * 97 + [(100,)] * 3, ["x"])
    r2 = exact_discrete_quantiles(df2, "x", (95, 98, 100)).first()
    assert (r2["p95"], r2["p98"], r2["p100"]) == (1, 100, 100)


def test_exact_quantiles_empty_and_validation(spark):
    df = spark.createDataFrame([], "x int")
    assert exact_discrete_quantiles(df, "x").count() == 0
    with pytest.raises(ValueError, match="percents"):
        exact_discrete_quantiles(df, "x", (0,))
    with pytest.raises(ValueError, match="percents"):
        exact_discrete_quantiles(df, "x", (50.5,))


def test_hll_accuracy_and_determinism(spark):
    """4096-register HLL: within ~5% of truth at 10k distinct values, and
    the estimate is bit-identical under repartitioning (the determinism
    claim that distinguishes it from approx_count_distinct)."""
    from military_entity_extraction_based_on_large_models_spark.operators.stats import (
        hll_ndv,
    )

    rows = [(i % 3, f"user{i % 10_000}") for i in range(40_000)]
    df = spark.createDataFrame(rows, ["grp", "uid"])
    est1 = {r["grp"]: r["ndv_hll"] for r in hll_ndv(df.repartition(1), ["grp"], "uid").collect()}
    est13 = {r["grp"]: r["ndv_hll"] for r in hll_ndv(df.repartition(13), ["grp"], "uid").collect()}
    assert est1 == est13  # bit-identical, not approximately
    for g, e in est1.items():
        truth = len({f"user{i % 10_000}" for i in range(g, 40_000, 3)})
        assert abs(e - truth) / truth < 0.05, (g, e, truth)


def test_hll_small_range_and_nulls(spark):
    from military_entity_extraction_based_on_large_models_spark.operators.stats import (
        hll_ndv,
    )

    rows = [(1, f"u{i}") for i in range(50)] + [(1, None)] * 5 + [(2, "only")]
    df = spark.createDataFrame(rows, ["grp", "uid"])
    est = {r["grp"]: r["ndv_hll"] for r in hll_ndv(df, ["grp"], "uid").collect()}
    # linear-counting regime: tiny cardinalities land almost exactly
    assert abs(est[1] - 50) <= 1 and abs(est[2] - 1) <= 0.1


def test_hll_matches_duckdb_exactly(spark):
    """The whole point: the sketch replays bit-for-bit in another engine."""
    import duckdb
    import pandas as pd

    from military_entity_extraction_based_on_large_models_spark.operators.stats import (
        hll_ndv,
        hll_ndv_sql,
    )

    rows = [(i % 2, (i * 7919) % 3000) for i in range(20_000)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    got = sorted(
        (r["grp"], r["ndv_hll"]) for r in hll_ndv(df, ["grp"], "v").collect()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["grp", "v"]))
    want = sorted(con.execute(hll_ndv_sql("t", ["grp"], "v")).fetchall())
    assert got == want


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

def _py_cms(values, depth=4, width=512):
    import hashlib
    from collections import Counter

    counters = Counter()
    for v in values:
        for j in range(depth):
            h = hashlib.md5(f"cms{j}:{v}".encode()).hexdigest()
            counters[(j, int(h[3:16], 16) % width)] += 1
    return counters


def _py_cms_est(counters, v, depth=4, width=512):
    import hashlib

    return min(
        counters.get(
            (j, int(hashlib.md5(f"cms{j}:{v}".encode()).hexdigest()[3:16], 16) % width),
            0,
        )
        for j in range(depth)
    )


def _cms_fixture(spark):
    # skewed multiset: item i appears (i % 37) + 1 times
    rows = [(f"u{i:03d}",) for i in range(300) for _ in range((i % 37) + 1)]
    return rows, spark.createDataFrame(rows, "user_id string")


def test_cms_matches_python_replica(spark):
    from military_entity_extraction_based_on_large_models_spark.operators.stats import (
        cms_estimate,
        cms_sketch,
    )

    rows, df = _cms_fixture(spark)
    sk = cms_sketch(df, "user_id")
    got_counters = {(r.row, r.bucket): r.c for r in sk.collect()}
    exp_counters = _py_cms([v for v, in rows])
    assert got_counters == dict(exp_counters)

    cands = df.select("user_id").distinct()
    est = {r.user_id: r.est for r in cms_estimate(cands, sk, "user_id").collect()}
    for v in {v for v, in rows}:
        assert est[v] == _py_cms_est(exp_counters, v)


def test_cms_never_undercounts(spark):
    from collections import Counter

    from military_entity_extraction_based_on_large_models_spark.operators.stats import (
        cms_estimate,
        cms_sketch,
    )

    rows, df = _cms_fixture(spark)
    exact = Counter(v for v, in rows)
    sk = cms_sketch(df, "user_id")
    est = {
        r.user_id: r.est
        for r in cms_estimate(df.select("user_id").distinct(), sk, "user_id").collect()
    }
    assert all(est[v] >= c for v, c in exact.items())


def test_cms_sketch_is_bounded_and_mergeable(spark):
    from military_entity_extraction_based_on_large_models_spark.operators.stats import (
        cms_sketch,
    )

    rows, df = _cms_fixture(spark)
    half = len(rows) // 2
    a = spark.createDataFrame(rows[:half], "user_id string")
    b = spark.createDataFrame(rows[half:], "user_id string")
    whole = {(r.row, r.bucket): r.c for r in cms_sketch(df, "user_id").collect()}
    assert len(whole) <= 4 * 512
    merged = {}
    for part in (a, b):
        for r in cms_sketch(part, "user_id").collect():
            merged[(r.row, r.bucket)] = merged.get((r.row, r.bucket), 0) + r.c
    assert merged == whole


def test_cms_estimate_plan_broadcasts_the_sketch(spark):
    from military_entity_extraction_based_on_large_models_spark.operators.stats import (
        cms_estimate,
        cms_sketch,
    )

    _, df = _cms_fixture(spark)
    plan = (
        cms_estimate(df.select("user_id").distinct(), cms_sketch(df, "user_id"), "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
