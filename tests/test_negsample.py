"""Negative sampling: python replay, SQL-twin parity, filtered
semantics, pool capping, both corruption sides."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

from military_entity_extraction_based_on_large_models_spark.operators.negsample import (
    negative_samples,
    negative_samples_sql,
)


def _md5long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[3:16], 16)


def _replay(triples, k, pool_size, seed="neg", corrupt="obj"):
    tri = sorted(set(triples))
    ents = sorted({s for s, _, _ in tri} | {o for _, _, o in tri})
    # pool = smallest pool_size by (h, e); index order is the same (h, e)
    pool = sorted(
        ents, key=lambda e: (_md5long(f"{seed}:pool:{e}"), e)
    )[:pool_size]
    out = set()
    truth = set(tri)
    for s, p, o in tri:
        for i in range(k):
            idx = _md5long(f"{seed}:draw:{s}:{p}:{o}:{i}") % len(pool)
            e = pool[idx]
            cand = (e, p, o) if corrupt == "subj" else (s, p, e)
            if cand not in truth:
                out.add((*cand, i))
    return out


TRIPLES = [
    ("a", "r1", "b"), ("a", "r1", "c"), ("b", "r2", "c"),
    ("c", "r1", "d"), ("d", "r2", "a"), ("e", "r1", "a"),
]


def _spark_rows(spark, triples, **kw):
    df = spark.createDataFrame(triples, ["subj", "pred", "obj"])
    return {
        (r["subj"], r["pred"], r["obj"], r["neg_idx"])
        for r in negative_samples(df, **kw).collect()
    }


def test_matches_python_replay(spark):
    got = _spark_rows(spark, TRIPLES, k=3)
    assert got == _replay(TRIPLES, 3, 1024)
    # filtered semantics: no emitted row is a true triple
    truth = set(TRIPLES)
    assert all((s, p, o) not in truth for s, p, o, _ in got)
    assert got  # non-vacuous


def test_corrupt_subj_side(spark):
    got = _spark_rows(spark, TRIPLES, k=2, corrupt="subj")
    assert got == _replay(TRIPLES, 2, 1024, corrupt="subj")
    # objs are untouched on the subj-corruption side
    assert {o for _, _, o, _ in got} <= {o for _, _, o in TRIPLES}


def test_pool_cap_restricts_draws(spark):
    got = _spark_rows(spark, TRIPLES, k=4, pool_size=2)
    assert got == _replay(TRIPLES, 4, 2)
    pool2 = sorted(
        {s for s, _, _ in TRIPLES} | {o for _, _, o in TRIPLES},
        key=lambda e: (_md5long("neg:pool:" + e), e),
    )[:2]
    assert {o for _, _, o, _ in got} <= set(pool2)


def test_duckdb_twin_parity(spark):
    for corrupt in ("obj", "subj"):
        got = sorted(_spark_rows(spark, TRIPLES, k=3, corrupt=corrupt))
        con = duckdb.connect()
        con.register("t_in", pd.DataFrame(TRIPLES, columns=["subj", "pred", "obj"]))
        want = sorted(
            tuple(r)
            for r in con.execute(
                negative_samples_sql(
                    "SELECT subj, pred, obj FROM t_in", k=3, corrupt=corrupt
                )
            ).fetchall()
        )
        assert got == want, corrupt


def test_parallelism_invariant_and_guards(spark):
    df = spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])
    r1 = _spark_rows(spark, TRIPLES, k=2)
    r2 = {
        (r["subj"], r["pred"], r["obj"], r["neg_idx"])
        for r in negative_samples(df.repartition(7), k=2).collect()
    }
    assert r1 == r2
    with pytest.raises(ValueError):
        negative_samples(df, corrupt="pred")
    with pytest.raises(ValueError):
        negative_samples(df, k=0)
