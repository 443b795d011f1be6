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
