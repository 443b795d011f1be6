"""Bounded retry-with-feedback cascade (reference I1, reflect_workflow2.py:
96-122): pass cap, converged-exit-via-union, and feedback-hint semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.operators.reflect import (
    HINT_COL,
    bounded_retry,
)


def _rows(spark):
    return spark.createDataFrame(
        [("d1", "easy"), ("d2", "medium"), ("d3", "never")],
        ["doc", "name"],
    )


def test_pass_cap_and_fallback(spark):
    # 'easy' resolves on pass 1, 'medium' on pass 2, 'never' exhausts the cap
    def attempt(df, p):
        cond = (
            (F.col("name") == "easy") & (F.lit(p) >= 1)
            | (F.col("name") == "medium") & (F.lit(p) >= 2)
        )
        return df.withColumn("resolved", cond)

    out = {r["name"]: r for r in bounded_retry(_rows(spark), attempt, 3).collect()}
    assert out["easy"]["attempts"] == 1 and out["easy"]["status"] == "resolved"
    assert out["medium"]["attempts"] == 2 and out["medium"]["status"] == "resolved"
    assert out["never"]["attempts"] == 3 and out["never"]["status"] == "fallback"


def test_never_exceeds_cap(spark):
    calls = []

    def attempt(df, p):
        calls.append(p)
        return df.withColumn("resolved", F.lit(False))

    out = bounded_retry(_rows(spark), attempt, max_passes=3).collect()
    assert calls == [1, 2, 3]  # bounded exactly like reflect_workflow2.py:99-102
    assert all(r["status"] == "fallback" and r["attempts"] == 3 for r in out)


def test_deep_cascade_bounded_plan(spark):
    """VERDICT r02: max_passes ≫ 3 with a JOINING attempt (the plan-doubling
    shape) must complete without lineage blowup — the periodic localCheckpoint
    truncates pending lineage every CHECKPOINT_EVERY passes."""
    import time

    side = spark.createDataFrame([("easy", 1), ("medium", 1), ("never", 1)], ["name", "w"])

    def attempt(df, p):
        # self-compounding lineage: a join per pass
        joined = df.join(side, "name", "left").drop("w")
        return joined.withColumn("resolved", F.lit(p) >= 9)

    t0 = time.time()
    out = bounded_retry(_rows(spark), attempt, max_passes=10).collect()
    assert time.time() - t0 < 60
    assert all(r["attempts"] == 9 and r["status"] == "resolved" for r in out)


def test_feedback_hint_accumulates(spark):
    # a verifier that only succeeds once it SEES the pass-2 failure feedback —
    # the reflect_text round-trip of the reference
    def attempt(df, p):
        return df.withColumn(
            "resolved", F.col(HINT_COL).contains("pass2:count_mismatch")
        )

    out = bounded_retry(_rows(spark), attempt, max_passes=3, with_hint=True).collect()
    assert all(r["attempts"] == 3 and r["status"] == "resolved" for r in out)
    assert all("pass1:count_mismatch;pass2:count_mismatch;" == r[HINT_COL] for r in out)


def test_null_resolved_rows_are_not_dropped(spark):
    """Round-3 review: a NULL `resolved` (three-valued logic) must count as
    unresolved — previously such rows matched neither branch and vanished."""
    from pyspark.sql import functions as F

    from military_entity_extraction_based_on_large_models_spark.operators.reflect import (
        bounded_retry,
    )

    df = spark.createDataFrame(
        [("a", 1), ("b", None), ("c", 3)], ["id", "box_count"]
    )

    def attempt(pending, _pass_no):
        # NULL box_count → NULL comparison → NULL resolved
        return pending.withColumn("resolved", F.col("box_count") == 1)

    out = bounded_retry(df, attempt, max_passes=2, with_hint=False)
    rows = {r["id"]: r["status"] for r in out.collect()}
    assert rows == {"a": "resolved", "b": "fallback", "c": "fallback"}
