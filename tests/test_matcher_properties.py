"""Property-based tests (hypothesis): the matcher equals pure-Python
containment semantics on arbitrary text — the reference's contract
(EntityExtractor.py:124-130: every emitted name is a literal substring)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from military_entity_extraction_based_on_large_models_spark.operators.extract import (
    AhoCorasick,
    _Automaton,
)
from military_entity_extraction_based_on_large_models_spark.sources.gazetteer import (
    MILITARY_GAZETTEER,
)

ALIASES = sorted({a for a, _, _ in MILITARY_GAZETTEER})

# alias-dense soup: lists of chars and whole aliases, joined
text_strategy = st.lists(
    st.sampled_from(list("abcdefgh AEFTGNR-0123456789") + ALIASES),
    max_size=60,
).map("".join)


def _oracle_occurrences(text: str, patterns: list[str]) -> set[tuple[int, int, str]]:
    out = set()
    for p in patterns:
        start = 0
        while True:
            i = text.find(p, start)
            if i < 0:
                break
            out.add((i, i + len(p), p))
            start = i + 1
    return out


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_find_scanner_matches_containment_oracle(text):
    auto = _Automaton(MILITARY_GAZETTEER)
    got = {(b, e, n) for b, e, n, _c, _l in auto.match(text)}
    assert got == _oracle_occurrences(text, auto.patterns)


@settings(max_examples=100, deadline=None)
@given(text_strategy)
def test_aho_corasick_matches_containment_oracle(text):
    auto = _Automaton(MILITARY_GAZETTEER)
    ac = AhoCorasick(auto.patterns)
    got = set()
    for end, idx in ac.find(text):
        pat = auto.patterns[idx]
        got.add((end - len(pat), end, pat))
    assert got == _oracle_occurrences(text, auto.patterns)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))  # full unicode, incl. CJK and surrogate-adjacent
def test_matcher_handles_arbitrary_unicode(text):
    auto = _Automaton(MILITARY_GAZETTEER + [("坦克", "ent_tank_zh", "vehicle")])
    got = {(b, e, n) for b, e, n, _c, _l in auto.match(text)}
    assert got == _oracle_occurrences(text, auto.patterns)
    for b, e, n in got:
        assert text[b:e] == n  # offsets exact in code points
