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


def test_dedup_mentions_deterministic_on_begin_ties(spark):
    """Round-3 review: an alias fanning out to two canonicals at the SAME
    span must dedup to a deterministic canonical (ordered struct-min), not
    an engine-defined min_by tie."""
    from military_entity_extraction_based_on_large_models_spark.operators.extract import (
        dedup_mentions,
        extract_mentions,
    )
    from military_entity_extraction_based_on_large_models_spark.sources.documents import (
        with_doc_sha,
    )

    docs = with_doc_sha(
        spark.createDataFrame(
            [("r", "p", "c", "en", "a Tiger appeared")],
            ["repo", "path", "commit", "lang", "content"],
        )
    )
    gaz = [("Tiger", "tiger_mbt", "vehicle"), ("Tiger", "tiger_arh", "vehicle")]
    for _ in range(3):
        out = dedup_mentions(extract_mentions(docs, gaz)).collect()
        assert len(out) == 1
        assert out[0]["canonical"] == "tiger_arh"  # lexicographic struct-min


def test_gazetteer_fingerprint_row_boundaries():
    """Round-3 review: per-row hash updates concatenate, so distinct
    gazetteers could collide without a row terminator."""
    from military_entity_extraction_based_on_large_models_spark.operators.extract import (
        _gazetteer_fingerprint,
    )

    a = [("x", "y", "z1"), ("q", "r", "s")]
    b = [("x", "y", "z"), ("1q", "r", "s")]
    assert _gazetteer_fingerprint(a) != _gazetteer_fingerprint(b)
    # and order-sensitivity (ids-path decode contract)
    assert _gazetteer_fingerprint(a) != _gazetteer_fingerprint(list(reversed(a)))


def test_empty_alias_rejected():
    import pytest

    from military_entity_extraction_based_on_large_models_spark.operators.extract import (
        build_alias_meta,
    )

    with pytest.raises(ValueError, match="non-empty"):
        build_alias_meta([("", "ent_x", "label")])


def test_gazetteer_broadcast_is_cached_per_fingerprint(spark):
    """Round-3 review: per-call broadcasts leaked one pinned block per
    micro-batch; same gazetteer must reuse one broadcast."""
    from military_entity_extraction_based_on_large_models_spark.operators import extract

    gaz = [("alpha", "ent_a", "other")]
    key = extract._gazetteer_fingerprint([tuple(e) for e in gaz])
    cache_key = (spark.sparkContext.applicationId, key)
    extract._BROADCAST_CACHE.pop(cache_key, None)
    docs = spark.createDataFrame(
        [("r", "p", "c", "s", "alpha beta")],
        ["doc_sha", "repo", "path", "commit", "content"],
    ).selectExpr("doc_sha", "repo", "path", "commit", "content")
    extract.extract_doc_mentions(docs, gaz).count()
    bc1 = extract._BROADCAST_CACHE.get(cache_key)
    extract.extract_doc_mentions(docs, gaz).count()
    assert extract._BROADCAST_CACHE.get(cache_key) is bc1
