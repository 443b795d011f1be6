"""Bigram LM training + quality scoring — operators/lm.py.

Oracle: a hand-rolled pure-python bigram LM (collections.Counter +
math.log) replaying the exact fixed-point device.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.operators.lm import (
    doc_bigrams,
    score_docs_bigram,
    train_bigram_lm,
)

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the hat"),
    (3, "the dog sat on the mat"),
    (4, "zq xv qqj zzk vvx"),  # gibberish: every bigram unseen elsewhere
    (5, "single"),  # < 2 tokens -> no bigrams, no score row
    (6, ""),
]


def _tok(t: str) -> list[str]:
    return [w for w in re.split(r"[^\w]+", t.lower()) if w]


def py_lm(docs, min_count):
    uni, bi = Counter(), Counter()
    for _, t in docs:
        ws = _tok(t)
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    v = len(uni)
    unip = {w: c for w, c in uni.items() if c >= min_count}
    bip = {b: c for b, c in bi.items() if c >= min_count}
    out = {}
    for did, t in docs:
        ws = _tok(t)
        if len(ws) < 2:
            continue
        total = 0
        n = 0
        for b in zip(ws, ws[1:]):
            c12 = bip.get(b, 0)
            c1 = unip.get(b[0], 0)
            # banker's-vs-half-up differences cannot occur in this fixture
            total += int(round(math.log((c12 + 1) / (c1 + v)) * 1e6))
            n += 1
        out[did] = (n, total, total / (n * 1e6))
    return out


@pytest.fixture(scope="module")
def lm_scores(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    uni, bi, vocab = train_bigram_lm(df, min_count=2)
    return {r.doc_id: r for r in score_docs_bigram(df, uni, bi, vocab).collect()}


def test_matches_python_replica(lm_scores):
    exp = py_lm(DOCS, min_count=2)
    assert set(lm_scores) == set(exp)
    for did, (n, total, avg) in exp.items():
        r = lm_scores[did]
        assert (r.n_bigrams, r.score_micro) == (n, total), did
        assert r.avg_logp == avg, did


def test_no_bigram_docs_have_no_row(lm_scores):
    assert 5 not in lm_scores and 6 not in lm_scores


def test_gibberish_scores_below_natural(lm_scores):
    natural = [lm_scores[d].avg_logp for d in (1, 2, 3)]
    assert lm_scores[4].avg_logp < min(natural)


def test_repartition_invariance(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    outs = []
    for nparts in (1, 13):
        d = df.repartition(nparts)
        uni, bi, vocab = train_bigram_lm(d, min_count=2)
        outs.append(
            sorted(
                (r.doc_id, r.n_bigrams, r.score_micro)
                for r in score_docs_bigram(d, uni, bi, vocab).collect()
            )
        )
    assert outs[0] == outs[1]


def test_min_count_prune_never_raises_scores(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    by_mc = {}
    for mc in (1, 2):
        uni, bi, vocab = train_bigram_lm(df, min_count=mc)
        by_mc[mc] = {
            r.doc_id: r.score_micro
            for r in score_docs_bigram(df, uni, bi, vocab).collect()
        }
    for did, s1 in by_mc[1].items():
        assert by_mc[2][did] <= s1


def test_doc_bigrams_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    plan = doc_bigrams(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_oov_gets_laplace_floor(spark):
    # score a doc whose bigrams were never trained: every contribution is
    # ln(1 / (0 + V)) exactly.
    train = spark.createDataFrame(DOCS[:3], "doc_id int, text string")
    uni, bi, vocab = train_bigram_lm(train, min_count=2)
    target = spark.createDataFrame([(9, "purple monkey dishwasher")], "doc_id int, text string")
    r = score_docs_bigram(target, uni, bi, vocab).collect()[0]
    v = len({w for _, t in DOCS[:3] for w in _tok(t)})
    floor = int(round(math.log(1 / v) * 1e6))
    assert (r.n_bigrams, r.score_micro) == (2, 2 * floor)
