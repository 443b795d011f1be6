"""Extraction stage: Aho-Corasick matching vs pure-Python containment oracle.

Semantics pinned to the reference: extract-only-literal-substrings
(EntityExtractor.py:124-130) and (name,label) set dedup
(reflect_workflow1.py:44-53).
"""

from __future__ import annotations

from military_entity_extraction_based_on_large_models_spark.operators.extract import (
    AhoCorasick,
    _Automaton,
    dedup_mentions,
    extract_mentions,
)
from military_entity_extraction_based_on_large_models_spark.sources import fixtures
from military_entity_extraction_based_on_large_models_spark.sources.gazetteer import (
    MILITARY_GAZETTEER,
)


def test_aho_corasick_finds_all_overlapping_matches():
    ac = AhoCorasick(["he", "she", "his", "hers"])
    text = "ushers"
    hits = set()
    for end, idx in ac.find(text):
        pat = ["he", "she", "his", "hers"][idx]
        assert text[end - len(pat) : end] == pat
        hits.add(pat)
    assert hits == {"he", "she", "hers"}


def test_automaton_nested_aliases():
    auto = _Automaton([("Tornado", "ent_t", "aircraft"), ("Tornado GR4", "ent_t4", "aircraft")])
    matches = list(auto.match("a Tornado GR4 flew"))
    names = {m[2] for m in matches}
    # pure containment: BOTH the nested and the enclosing alias match
    assert names == {"Tornado", "Tornado GR4"}


def test_automaton_ambiguous_alias_fans_out():
    auto = _Automaton(
        [("Tiger", "ent_tiger_heli", "aircraft"), ("Tiger", "ent_tiger_tank", "vehicle")]
    )
    matches = list(auto.match("the Tiger advanced"))
    assert {(m[3], m[4]) for m in matches} == {
        ("ent_tiger_heli", "aircraft"),
        ("ent_tiger_tank", "vehicle"),
    }


def test_find_scan_and_aho_corasick_agree():
    from military_entity_extraction_based_on_large_models_spark.sources.gazetteer import (
        MILITARY_GAZETTEER,
    )

    texts = [
        "a Tornado GR4 and a Tornado and G36k G36k Tiger",
        "Eurofighter Typhoon over the Baltic Sea near Ramstein Air Base",
        "",
        "aaa",  # overlap stress (no match, but exercises scanning)
    ]
    fast = _Automaton(MILITARY_GAZETTEER)
    slow = _Automaton(MILITARY_GAZETTEER)
    slow.use_find = False
    from military_entity_extraction_based_on_large_models_spark.operators.extract import (
        AhoCorasick,
    )

    slow.ac = AhoCorasick(slow.patterns)
    for t in texts:
        assert sorted(fast.match(t)) == sorted(slow.match(t)), t


def test_extract_matches_oracle(spark, corpus, docs_df):
    mentions = extract_mentions(docs_df, MILITARY_GAZETTEER)
    got = {
        (r["doc_sha"], r["name"], r["label"])
        for r in mentions.select("doc_sha", "name", "label").distinct().collect()
    }
    expected = fixtures.oracle_mentions(corpus)
    assert got == expected


def test_extract_offsets_are_exact(spark, docs_df):
    rows = (
        extract_mentions(docs_df, MILITARY_GAZETTEER)
        .join(docs_df.select("doc_sha", "content"), "doc_sha")
        .select("content", "name", "begin", "end")
        .collect()
    )
    assert rows
    for r in rows:
        assert r["content"][r["begin"] : r["end"]] == r["name"]


def test_dedup_mentions_is_setlike(spark, docs_df):
    mentions = extract_mentions(docs_df, MILITARY_GAZETTEER)
    deduped = dedup_mentions(mentions)
    keys = deduped.select("doc_sha", "name", "label").collect()
    assert len(keys) == len({(r[0], r[1], r[2]) for r in keys})


def test_extract_empty_and_null_content(spark):
    docs = spark.createDataFrame(
        [
            ("r", "p1", "c", "en", ""),
            ("r", "p2", "c", "en", None),
        ],
        ["repo", "path", "commit", "lang", "content"],
    ).withColumn("doc_sha", __import__("pyspark").sql.functions.sha2(
        __import__("pyspark").sql.functions.coalesce("content", __import__("pyspark").sql.functions.lit("")), 256))
    out = extract_mentions(docs, MILITARY_GAZETTEER)
    assert out.count() == 0
