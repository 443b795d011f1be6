"""Table profiler: hand-computed report, null handling, the native-type
min/max ruling ('10' < '9' bug pinned), column subsetting, single-scan
plan gate."""

from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.operators.profile import profile_table


def _df(spark):
    return spark.createDataFrame(
        [
            (9, "a", None),
            (10, "b", 2.5),
            (100, None, 2.5),
            (None, "a", -1.0),
        ],
        "n long, s string, v double",
    )


def _report(spark, columns=None):
    return {
        r["column"]: (
            r["n_rows"], r["n_nulls"], r["n_distinct"],
            r["min_value"], r["max_value"],
        )
        for r in profile_table(_df(spark), columns).collect()
    }


def test_hand_computed_report(spark):
    got = _report(spark)
    assert got["s"] == (4, 1, 2, "a", "b")
    assert got["v"] == (4, 1, 2, "-1.0", "2.5")


def test_min_max_compare_in_native_type(spark):
    # lexicographic comparison would say max = '9'; numeric says 100
    got = _report(spark)
    assert got["n"] == (4, 1, 3, "9", "100")


def test_column_subset(spark):
    got = _report(spark, columns=["s"])
    assert set(got) == {"s"}


def test_single_scan_plan(spark):
    plan = (
        profile_table(_df(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one wide aggregate over one scan: no join, no window; the distinct
    # counts rewrite through a single Expand
    assert "Join" not in plan and "Window" not in plan
    assert "Expand" in plan
    assert plan.count("Scan ") <= 1


def test_weird_column_names_profile_fine(spark):
    # dots, spaces, quotes, hyphens in identifiers must not break the
    # stack() expression (ADVICE r5: index-keyed internal aliases +
    # quote-escaped name literals)
    df = spark.createDataFrame(
        [(1, "x"), (2, None)],
        ["col-with 'quote'.dot", "plain"],
    )
    got = {
        r["column"]: (r["n_rows"], r["n_nulls"], r["n_distinct"])
        for r in profile_table(df).collect()
    }
    assert got["col-with 'quote'.dot"] == (2, 0, 2)
    assert got["plain"] == (2, 1, 1)
