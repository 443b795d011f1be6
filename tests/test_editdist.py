"""Edit-distance join: brute-force completeness (the FastSS theorem),
DuckDB-twin parity, d=2, cap semantics, plan gate."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from military_entity_extraction_based_on_large_models_spark.operators.editdist import (
    edit_distance_join,
    edit_distance_join_sql,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(names, d):
    uniq = sorted(set(names))
    return {
        (a, b, _lev(a, b))
        for i, a in enumerate(uniq)
        for b in uniq[i + 1 :]
        if _lev(a, b) <= d
    }


def _spark_pairs(spark, names, d, **kw):
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    return {
        (r["name_a"], r["name_b"], r["dist"])
        for r in edit_distance_join(df, max_dist=d, **kw).collect()
    }


NAMES = [
    "patriot", "pattriot", "patriott", "patriots", "pariot",  # ed-1 family
    "tomahawk", "tomahawke", "tomohawk",
    "harpoon", "harpoon",  # duplicate collapses
    "f16", "f-16", "f1",
    "abrams", "abram", "",  # empty string edge
]


def test_matches_brute_force_d1(spark):
    assert _spark_pairs(spark, NAMES, 1) == _brute(NAMES, 1)


def test_matches_brute_force_d2(spark):
    assert _spark_pairs(spark, NAMES, 2) == _brute(NAMES, 2)


def test_property_random_typos(spark):
    # deterministic pseudo-random corpus with planted deletions,
    # substitutions, insertions and transposition-ish noise
    import hashlib

    base = ["javelin", "stinger", "phalanx", "exocet", "mig29", "kh101"]
    names = list(base)
    for i, w in enumerate(base * 3):
        h = int(hashlib.md5(f"{i}:{w}".encode()).hexdigest(), 16)
        p = h % max(len(w), 1)
        kind = (h >> 8) % 3
        if kind == 0:
            names.append(w[:p] + w[p + 1 :])            # deletion
        elif kind == 1:
            names.append(w[:p] + "xz"[h % 2] + w[p:])    # insertion
        else:
            names.append(w[:p] + "q" + w[p + 1 :])       # substitution
    for d in (1, 2):
        assert _spark_pairs(spark, names, d) == _brute(names, d)


def test_duckdb_twin_parity(spark):
    got = sorted(_spark_pairs(spark, NAMES, 1))
    con = duckdb.connect()
    con.register("n_in", pd.DataFrame({"name": NAMES}))
    want = sorted(
        tuple(r)
        for r in con.execute(
            edit_distance_join_sql("SELECT name FROM n_in", 1)
        ).fetchall()
    )
    assert got == want


def test_unicode_names(spark):
    names = ["导弹系统", "导弹系统x", "导系统", "坦克"]
    assert _spark_pairs(spark, names, 1) == _brute(names, 1)


def test_max_key_df_documented_recall_trade(spark):
    # single-char names: every one matches every other at ed<=1 via the
    # shared empty-string deletion key whose df == n; capping below n
    # drops that key, and these pairs share no other key -> recall loss
    # is exactly the documented semantics
    names = ["a", "b", "c", "d"]
    assert len(_spark_pairs(spark, names, 1)) == 6
    assert _spark_pairs(spark, names, 1, max_key_df=3) == set()


def test_guards_and_plan(spark):
    df = spark.createDataFrame([("x",)], ["name"])
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_join(df, max_dist=3)
    plan = (
        edit_distance_join(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
