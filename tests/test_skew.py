"""Salted two-phase aggregation: results equal plain groupBy on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.operators import skew


def _skewed(spark):
    # hot key: 'eurofighter' owns 90% of rows
    rows = [("eurofighter", f"doc{i % 50}") for i in range(900)] + [
        (f"ent{i}", f"doc{i}") for i in range(100)
    ]
    return spark.createDataFrame(rows, ["canonical", "doc_sha"])


def test_salted_count_matches_plain(spark):
    df = _skewed(spark)
    plain = {r["canonical"]: r["n"] for r in df.groupBy("canonical").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["canonical"]: r["n"] for r in skew.salted_count(df, ["canonical"], buckets=8).collect()}
    assert salted == plain
    assert salted["eurofighter"] == 900


def test_salted_distinct_count_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r["canonical"]: r["n"]
        for r in df.groupBy("canonical").agg(F.countDistinct("doc_sha").alias("n")).collect()
    }
    salted = {
        r["canonical"]: r["n_distinct"]
        for r in skew.salted_distinct_count(df, ["canonical"], "doc_sha", buckets=8).collect()
    }
    assert salted == plain
    assert salted["eurofighter"] == 50
