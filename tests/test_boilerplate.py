"""Corpus boilerplate removal: planted-boilerplate fixture, tail/empty-doc
edges, distinct-doc (not occurrence) counting, and repartition invariance."""

from __future__ import annotations

from military_entity_extraction_based_on_large_models_spark.operators.boilerplate import (
    boilerplate_units,
    doc_units,
    remove_boilerplate,
)

BOILER = "subscribe to our newsletter now"  # 5 words → one w=5 unit


def _docs(spark):
    rows = [
        (1, f"alpha beta gamma delta epsi {BOILER}"),
        (2, f"{BOILER} zeta eta theta iota kappa"),
        (3, f"lam mu nu xi omicron {BOILER}"),
        (4, "pi rho sigma tau upsilon phi chi"),  # 7 words → tail unit of 2
        (5, ""),  # empty doc must survive with zero units
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_planted_boilerplate_removed(spark):
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate(
            _docs(spark), window_words=5, min_docs=3
        ).collect()
    }
    assert len(out) == 5  # every doc present, including the empty one
    for did in (1, 2, 3):
        assert BOILER not in out[did]["clean_text"]
        assert out[did]["n_removed"] == 1
        assert out[did]["n_kept"] == 1
    # untouched doc: both its units (5-word + 2-word tail) survive in order
    assert out[4]["clean_text"] == "pi rho sigma tau upsilon phi chi"
    assert out[4]["n_removed"] == 0 and out[4]["n_kept"] == 2
    assert out[5]["clean_text"] == "" and out[5]["n_kept"] == 0
    # surviving text keeps original word order
    assert out[1]["clean_text"] == "alpha beta gamma delta epsi"


def test_distinct_doc_counting_not_occurrences(spark):
    # one doc repeating a unit 3 times is repetition, not boilerplate
    spam = "buy cheap pills"
    rows = [(1, f"{spam} {spam} {spam}"), (2, "totally different words")]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    assert (
        boilerplate_units(doc_units(d, window_words=3), min_docs=3).count()
        == 0
    )
    # but three DISTINCT docs trip the threshold
    rows3 = [(i, f"{spam} unique{i} filler words") for i in range(1, 4)]
    d3 = spark.createDataFrame(rows3, ["doc_id", "text"])
    units = boilerplate_units(doc_units(d3, window_words=3), min_docs=3)
    got = [(r["unit"], r["n_docs"]) for r in units.collect()]
    assert got == [(spam, 3)]


def test_tail_window_shorter_than_w(spark):
    d = spark.createDataFrame([(1, "a b c d e f g")], ["doc_id", "text"])
    units = sorted(
        (r["pos"], r["unit"]) for r in doc_units(d, window_words=3).collect()
    )
    assert units == [(0, "a b c"), (1, "d e f"), (2, "g")]


def test_repartition_invariance(spark):
    rows = [
        (i, f"{BOILER} word{i} word{i + 1} word{i + 2} tail") for i in range(20)
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    a = remove_boilerplate(d, window_words=5, min_docs=3).collect()
    b = remove_boilerplate(
        d.repartition(11), window_words=5, min_docs=3
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
