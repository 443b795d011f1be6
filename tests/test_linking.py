"""Linking: ambiguous-alias disambiguation + MinHash/LSH fuzzy blocking."""

from __future__ import annotations

from military_entity_extraction_based_on_large_models_spark.operators.extract import (
    extract_mentions,
)
from military_entity_extraction_based_on_large_models_spark.operators.linking import (
    fuzzy_block_candidates,
    link_mentions,
)
from military_entity_extraction_based_on_large_models_spark.sources.documents import (
    with_doc_sha,
)
from military_entity_extraction_based_on_large_models_spark.sources.gazetteer import (
    CONTEXT_TERMS,
    MILITARY_GAZETTEER,
)


def _docs(spark, rows):
    return with_doc_sha(
        spark.createDataFrame(
            [("r", f"p{i}", "c", "en", t) for i, t in enumerate(rows)],
            ["repo", "path", "commit", "lang", "content"],
        )
    )


def test_ambiguous_alias_resolved_by_context(spark):
    docs = _docs(
        spark,
        [
            "the Tiger helicopter squadron flew at dawn",
            "a Tiger tank battalion moved its armor forward",
            "Tiger sighted",  # no evidence → lexicographic fallback
        ],
    )
    mentions = extract_mentions(docs, MILITARY_GAZETTEER)
    linked = link_mentions(mentions, CONTEXT_TERMS)
    got = {
        (r["path"], r["canonical"])
        for r in linked.where("name = 'Tiger'").collect()
    }
    assert got == {
        ("p0", "ent_tiger_heli"),
        ("p1", "ent_tiger_tank"),
        ("p2", "ent_tiger_heli"),  # tie → canonical asc
    }


def test_link_is_one_row_per_span(spark):
    docs = _docs(spark, ["Tiger Tiger helicopter rotor"])
    mentions = extract_mentions(docs, MILITARY_GAZETTEER)
    linked = link_mentions(mentions, CONTEXT_TERMS)
    rows = linked.where("name = 'Tiger'").select("begin", "canonical").collect()
    assert len(rows) == 2  # two occurrences, one canonical each


def test_fuzzy_blocking_pairs_similar_names(spark):
    names = spark.createDataFrame(
        [("Eurofighter Typhoon",), ("Eurofighter Typhoon FGR4",), ("HIMARS",)],
        ["name"],
    )
    pairs = fuzzy_block_candidates(names)
    got = {(r["name_a"], r["name_b"]) for r in pairs.collect()}
    assert ("Eurofighter Typhoon", "Eurofighter Typhoon FGR4") in got
    assert all("HIMARS" not in p for p in got)
