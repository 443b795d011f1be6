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


def test_salt_is_deterministic_row_content_hash(spark):
    """Round-3 review: monotonically_increasing_id salts are position-
    dependent and unstable under stage retry (SPARK-23207 class); the salt
    must be a pure function of row content."""
    from pyspark.sql import functions as F

    from military_entity_extraction_based_on_large_models_spark.operators.skew import (
        with_salt,
    )

    df = spark.createDataFrame(
        [("k", i) for i in range(100)], ["key", "v"]
    )
    a = with_salt(df, buckets=8).select("key", "v", "_salt")
    b = with_salt(df.repartition(7), buckets=8).select("key", "v", "_salt")
    # same content → same salt regardless of physical layout
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # and the hot key's rows still spread over multiple buckets
    assert a.select("_salt").distinct().count() > 1


def test_topk_per_group_matches_plain_window(spark):
    """Salted two-phase top-k must equal the single-window answer exactly —
    including boundary ties resolved by the total order — on a frame with a
    hot key (one group holds 80% of rows)."""
    import pytest
    from pyspark.sql import Window

    from military_entity_extraction_based_on_large_models_spark.operators.skew import (
        topk_per_group,
    )

    rows = [("hot", i, float((i * 37) % 100)) for i in range(4000)] + [
        ("cold", i, float(i)) for i in range(50)
    ]
    # ties everywhere in "hot" (score has only 100 distinct values): the
    # unique id column makes the order total, which is what exactness needs
    df = spark.createDataFrame(rows, ["grp", "id", "score"])
    order = [F.col("score").desc(), F.col("id").asc()]

    got = {
        (r["grp"], r["rank"]): r["id"]
        for r in topk_per_group(df, ["grp"], order, k=5, buckets=8).collect()
    }
    w = Window.partitionBy("grp").orderBy(*order)
    want = {
        (r["grp"], r["rank"]): r["id"]
        for r in df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .collect()
    }
    assert got == want and len(got) == 10

    with pytest.raises(ValueError, match="positive"):
        topk_per_group(df, ["grp"], order, k=0)


def test_probe_hot_keys_stats(spark):
    df = _skewed(spark)
    stats = skew.probe_hot_keys(df, ["canonical"])
    assert stats["n_rows"] == 1000 and stats["n_keys"] == 101
    assert stats["max_key_rows"] == 900
    assert stats["hot_key"] == ("eurofighter",)
    assert abs(stats["hot_fraction"] - 0.9) < 1e-12


def test_probe_hot_keys_with_ts(spark):
    import datetime as dt

    rows = [("hot", dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)) for i in range(100)]
    rows += [("cold", dt.datetime(2024, 1, 1))]
    df = spark.createDataFrame(rows, ["k", "ts"])
    stats = skew.probe_hot_keys(df, ["k"], ts="ts")
    assert stats["hot_key"] == ("hot",)
    assert stats["hot_span_seconds"] == 99.0


def test_topk_auto_switches_and_stays_exact(spark):
    """The auto wrapper must pick the salted plan above the threshold and
    the plain window below it, with IDENTICAL results either way (the
    exactness-preserving-switch contract)."""
    from pyspark.sql import Window

    rows = [("hot", i, float((i * 37) % 100)) for i in range(4000)] + [
        ("cold", i, float(i)) for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["grp", "id", "score"])
    order = [F.col("score").desc(), F.col("id").asc()]
    w = Window.partitionBy("grp").orderBy(*order)
    want = {
        (r["grp"], r["rank"]): r["id"]
        for r in df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .collect()
    }
    hot = skew.topk_per_group_auto(df, ["grp"], order, k=5, hot_rows_threshold=1000, buckets=8)
    cold = skew.topk_per_group_auto(df, ["grp"], order, k=5, hot_rows_threshold=10_000)
    for out in (hot, cold):
        got = {(r["grp"], r["rank"]): r["id"] for r in out.collect()}
        assert got == want
    # plan check: only the engaged path carries the salt column
    assert "_salt" in hot._jdf.queryExecution().executedPlan().toString()
    assert "_salt" not in cold._jdf.queryExecution().executedPlan().toString()


def test_distinct_count_auto_switches_and_stays_exact(spark):
    """r6: salted_distinct_count_auto — salted two-phase above threshold,
    plain count_distinct below, identical results either way."""
    rows = [("hot", f"d{i % 700}") for i in range(4000)] + [
        ("cold", f"d{i}") for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["k", "doc"])
    want = {("hot",): 700, ("cold",): 30}
    hot = skew.salted_distinct_count_auto(
        df, ["k"], "doc", hot_rows_threshold=1000, buckets=8
    )
    cold = skew.salted_distinct_count_auto(
        df, ["k"], "doc", hot_rows_threshold=10_000
    )
    for out in (hot, cold):
        got = {(r["k"],): r["n_distinct"] for r in out.collect()}
        assert got == want
    assert "_salt" in hot._jdf.queryExecution().executedPlan().toString()
    assert "_salt" not in cold._jdf.queryExecution().executedPlan().toString()
