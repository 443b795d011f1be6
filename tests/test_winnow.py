"""Winnowing (MOSS) fingerprints + clone pairs — operators/winnow.py.

Oracle: an independent pure-python implementation of the paper's scheme
(hashlib md5, explicit sliding windows) — not a transliteration of the
Spark column expressions.
"""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.operators.winnow import (
    POS_BITS,
    clone_pairs,
    winnow_fingerprints,
)

POS_MOD = 1 << POS_BITS


def py_winnow(text: str, k: int = 8, w: int = 4) -> set[tuple[int, int]]:
    norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", text.lower()).strip()
    n = len(norm) - k + 1
    if n < 1:
        return set()
    keys = [
        int(hashlib.md5(norm[i - 1 : i - 1 + k].encode()).hexdigest()[3:13], 16)
        * POS_MOD
        + (POS_MOD - 1 - i)
        for i in range(1, n + 1)
    ]
    sel = {min(keys[s : s + w]) for s in range(max(n - w + 1, 1))}
    return {(kk // POS_MOD, POS_MOD - 1 - kk % POS_MOD) for kk in sel}


DOCS = [
    (1, "The quick brown fox jumps over the lazy dog near the river bank."),
    (2, "def  foo():\n    return  42\n# The quick brown fox jumps over the lazy dog"),
    (3, "short"),
    (4, ""),
    (5, "exactly8!"),
    (6, "aaaaaaaaaaaaaaaaaaaaaaaa"),  # degenerate: all grams hash equal
    (7, "Füße läuft ÜBER die    Straße — naïve café"),  # non-ASCII chars
    (8, "tab\tand\x0bvertical\ffeeds\r\ncollapse to one space"),
]


@pytest.fixture(scope="module")
def fps(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    return winnow_fingerprints(df, k=8, w=4).collect()


def test_matches_python_reference(fps):
    got = {(r.doc_id, r.fp, r.pos) for r in fps}
    exp = {(i, h, p) for i, t in DOCS for h, p in py_winnow(t)}
    assert got == exp


def test_short_and_empty_docs_emit_nothing(fps):
    by_doc = {r.doc_id for r in fps}
    assert 3 not in by_doc  # 5 chars < k
    assert 4 not in by_doc


def test_degenerate_equal_hashes_pick_rightmost(fps):
    # 24 a's -> 17 positions, all the same hash; each window's rightmost
    # wins, so selected positions are exactly w..npos.
    pos = sorted(r.pos for r in fps if r.doc_id == 6)
    assert pos == list(range(4, 18))


def test_moss_guarantee_shared_run_yields_common_fp(fps):
    # docs 1 and 2 share the 43-char fox sentence (>= w + k - 1 = 11).
    a = {r.fp for r in fps if r.doc_id == 1}
    b = {r.fp for r in fps if r.doc_id == 2}
    assert a & b


def test_extraction_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    plan = winnow_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # pure codegen HOFs, no UDF


def test_position_overflow_fails_fast(spark):
    big = spark.range(1).select(
        F.col("id").alias("doc_id"),
        F.concat_ws("", F.array_repeat(F.lit("abcdefgh"), 140000)).alias("text"),
    )
    with pytest.raises(Exception, match="exceeds 2\\^20"):
        winnow_fingerprints(big).collect()


def _clone_fps(spark):
    docs = [
        (1, "unique alpha prelude " + "shared payload body of this clone family " + "tail one"),
        (2, "different beta opener " + "shared payload body of this clone family " + "tail two"),
        (3, "totally unrelated text about weather patterns and geology"),
        (4, "shared payload body of this clone family"),  # pure subset doc
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    return winnow_fingerprints(df, k=8, w=4)


def test_clone_pairs_containment_and_counts(spark):
    fp = _clone_fps(spark)
    rows = {(r.id_a, r.id_b): r for r in clone_pairs(fp, min_shared=1).collect()}
    assert (1, 2) in rows
    # doc 4 is a pure subset of docs 1 and 2: containment uses the SMALLER
    # doc's fingerprint count, so its scores are the highest of all pairs.
    assert (1, 4) in rows and (2, 4) in rows
    assert rows[(1, 4)].score >= rows[(1, 2)].score
    r = rows[(1, 2)]
    assert r.score == r.shared / min(r.n_a, r.n_b)
    # doc 3 shares nothing
    assert not any(3 in p for p in rows)


def test_clone_pairs_df_cap_drops_ubiquitous_fps(spark):
    # one gram family present in EVERY doc: with max_df below the corpus
    # size those fps carry no pair evidence.
    docs = [(i, f"unique part {i * 7919} common boilerplate everywhere") for i in range(10)]
    fp = winnow_fingerprints(
        spark.createDataFrame(docs, "doc_id int, text string"), k=8, w=4
    )
    capped = clone_pairs(fp, min_shared=1, max_df=5).collect()
    uncapped = clone_pairs(fp, min_shared=1, max_df=None).collect()
    assert len(uncapped) > 0
    assert len(capped) < len(uncapped)
    # the cap cannot INFLATE scores: denominators stay the pre-cap counts
    pre = {r.doc_id: 0 for r in fp.select("doc_id").distinct().collect()}
    for r in fp.select("doc_id", "fp").distinct().collect():
        pre[r.doc_id] += 1
    for r in capped:
        assert r.n_a == pre[r.id_a] and r.n_b == pre[r.id_b]


def test_clone_pairs_plan_is_equi_join(spark):
    fp = _clone_fps(spark)
    plan = (
        clone_pairs(fp, min_shared=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
