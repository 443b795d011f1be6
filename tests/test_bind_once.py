"""bind_once: the quadratic-HOF-lambda regression gate.

A lambda body referencing an outer expression TREE re-evaluates it per
array element (no common-subexpression elimination across HOF lambda
boundaries) — the sf10 sweep caught doc_bigrams re-running the full
tokenizer split PER PAIR (36× at sf1, 26× at sf10).  These tests pin the
fix structurally: after optimization each operator's plan must contain
the tokenizing split exactly ONCE — an inlined regression multiplies it.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_chunk_texts_tokenizes_once(spark):
    from military_entity_extraction_based_on_large_models_spark.functions.text import (
        chunk_texts,
    )

    df = spark.createDataFrame([("a b c d e",)], "text string").select(
        chunk_texts(F.col("text"), size=3, overlap=1).alias("c")
    )
    assert _optimized(df).count("split(") == 1


def test_doc_bigrams_tokenizes_once(spark):
    from military_entity_extraction_based_on_large_models_spark.operators.lm import (
        doc_bigrams,
    )

    df = doc_bigrams(
        spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    )
    assert _optimized(df).count("split(") == 1


def test_doc_units_tokenizes_once(spark):
    from military_entity_extraction_based_on_large_models_spark.operators.boilerplate import (
        doc_units,
    )

    df = doc_units(
        spark.createDataFrame([(1, "a b c d e f g h i j")],
                              "doc_id long, text string")
    )
    assert _optimized(df).count("split(") == 1


def test_triples_derive_entity_arrays_once(spark):
    """The located_in cross product and the co_occurs triangular transform
    reference the derived non-location/location arrays inside inner
    lambdas; each derivation (a filter over the pinned entity array) must
    appear exactly once — one for non_loc, one for loc."""
    from military_entity_extraction_based_on_large_models_spark.operators.triples import (
        _all_triples_expr,
    )

    ents_schema = (
        "ents array<struct<canonical:string,label:string,name:string>>"
    )
    df = spark.createDataFrame(
        [([("e1", "weapon", "E1"), ("p1", "location", "P1")],)], ents_schema
    ).select(F.explode(_all_triples_expr(F.col("ents"))).alias("t"))
    plan = _optimized(df)
    assert plan.count("filter(ents") <= 2


def test_bind_once_value_semantics(spark):
    from military_entity_extraction_based_on_large_models_spark.functions.text import (
        bind_once,
    )

    row = spark.range(1).select(
        bind_once(
            F.array(F.lit(1), F.lit(2), F.lit(3)),
            lambda a: F.size(a) + F.element_at(a, 1),
        ).alias("v")
    ).first()
    assert row["v"] == 4
