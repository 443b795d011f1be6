"""Per-predicate KG profile: hand-computed counts, duplicate detection,
fanout diagnostic, and the aggregate-only plan gate."""

from military_entity_extraction_based_on_large_models_spark.operators.kgaudit import (
    predicate_profile,
)


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


FIX = [
    # instance_of: 4 assertions, one exact duplicate, hot subject e1 (3)
    ("e1", "instance_of", "ship"),
    ("e1", "instance_of", "ship"),      # duplicate re-assertion
    ("e1", "instance_of", "vessel"),
    ("e2", "instance_of", "ship"),
    # located_in: no duplicates, 1 subject
    ("e1", "located_in", "port_a"),
    ("e1", "located_in", "port_b"),
]


def test_hand_computed_profile(spark):
    got = {
        r["pred"]: (
            r["n_triples"], r["n_distinct"], r["n_dup"],
            r["n_subjects"], r["n_objects"], r["max_subj_fanout"],
        )
        for r in predicate_profile(_triples(spark, FIX)).collect()
    }
    assert got == {
        "instance_of": (4, 3, 1, 2, 2, 3),
        "located_in": (2, 2, 0, 1, 2, 2),
    }


def test_no_duplicates_means_zero_dup(spark):
    rows = [("a", "p", "x"), ("b", "p", "x")]
    r = predicate_profile(_triples(spark, rows)).collect()[0]
    assert r["n_dup"] == 0 and r["n_objects"] == 1 and r["n_subjects"] == 2


def test_plan_aggregates_only_no_window(spark):
    plan = (
        predicate_profile(_triples(spark, FIX))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    # the distinct counts must rewrite to Expand + two-phase aggregate,
    # not one shuffle per distinct
    assert "Expand" in plan
