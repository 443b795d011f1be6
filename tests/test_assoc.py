"""PMI edge weighting: hand formula, independence baseline, and input
non-distinctness handling."""

from __future__ import annotations

import math

from military_entity_extraction_based_on_large_models_spark.operators.assoc import (
    pmi_edge_weights,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, ["subj", "obj", "doc_id"])


def test_hand_formula(spark):
    # docs 1..4; (a,b) together in docs 1,2; a alone in 3; b alone in 4
    # via pairs with other entities
    rows = [
        ("a", "b", 1),
        ("a", "b", 2),
        ("a", "x", 3),
        ("b", "y", 4),
    ]
    out = {
        (r["subj"], r["obj"]): r
        for r in pmi_edge_weights(_pairs(spark, rows)).collect()
    }
    ab = out[("a", "b")]
    # N=4 docs, c_a=3 (docs 1,2,3), c_b=3 (docs 1,2,4), c_ab=2
    assert (ab["c_ab"], ab["c_a"], ab["c_b"]) == (2, 3, 3)
    assert ab["pmi"] == round(math.log(2 * 4 / (3 * 3)), 6)


def test_independence_is_zero(spark):
    # one pair in the only doc: c_ab=1, c_a=1, c_b=1, N=1 → pmi = ln(1) = 0
    out = pmi_edge_weights(_pairs(spark, [("a", "b", 1)])).collect()
    assert len(out) == 1
    assert out[0]["pmi"] == 0.0


def test_duplicate_observations_collapse(spark):
    # the operator distincts its input: repeating an observation changes
    # nothing (counts are distinct-document counts)
    rows = [("a", "b", 1), ("a", "b", 1), ("a", "c", 2)]
    a = sorted(map(tuple, pmi_edge_weights(_pairs(spark, rows)).collect()))
    b = sorted(
        map(tuple, pmi_edge_weights(_pairs(spark, rows[1:])).collect())
    )
    assert a == b


def test_marginals_count_both_roles(spark):
    # entity 'm' appears as subj in doc 1 and as obj in doc 2: c_m = 2
    rows = [("m", "n", 1), ("k", "m", 2)]
    out = {
        (r["subj"], r["obj"]): r
        for r in pmi_edge_weights(_pairs(spark, rows)).collect()
    }
    assert out[("m", "n")]["c_a"] == 2  # m
    assert out[("k", "m")]["c_b"] == 2  # m
