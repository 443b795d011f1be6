"""Exact prefix-filtered set-similarity join: brute-force equality at
several thresholds (the prefix theorem's end-to-end check), duplicate
collapse, empty sets, and the no-Cartesian plan gate."""

import itertools
import random

from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.operators.setsim import setsim_join


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, toks array<string>")


def _brute(rows, t_num, t_den):
    out = set()
    sets = {i: set(tk) for i, tk in rows}
    for (i, x), (j, y) in itertools.combinations(sorted(sets.items()), 2):
        if not x or not y:
            continue
        inter = len(x & y)
        uni = len(x | y)
        if inter * t_den >= uni * t_num:
            out.add((i, j, inter, uni, inter * 1_000_000 // uni))
    return out


def _spark_pairs(spark, rows, t_num, t_den):
    got = setsim_join(_df(spark, rows), t_num=t_num, t_den=t_den).collect()
    return {
        (r["id_a"], r["id_b"], r["inter"], r["uni"], r["jaccard_micro"])
        for r in got
    }


class TestExactness:
    def test_seeded_random_vs_bruteforce_multiple_thresholds(self, spark):
        rng = random.Random(42)
        vocab = [f"w{i}" for i in range(60)]
        rows = [
            (i, rng.sample(vocab, rng.randint(3, 20)))
            for i in range(80)
        ]
        for t_num, t_den in [(1, 2), (3, 10), (7, 10), (1, 1)]:
            assert _spark_pairs(spark, rows, t_num, t_den) == _brute(
                rows, t_num, t_den
            ), (t_num, t_den)

    def test_duplicate_tokens_collapse(self, spark):
        rows = [(1, ["a", "a", "b"]), (2, ["a", "b", "b", "b"])]
        got = _spark_pairs(spark, rows, 1, 1)
        assert got == {(1, 2, 2, 2, 1_000_000)}

    def test_empty_and_singleton_sets(self, spark):
        rows = [(1, []), (2, []), (3, ["x"]), (4, ["x"])]
        # empty sets pair with nothing (no prefix tokens); identical
        # singletons match at J=1
        assert _spark_pairs(spark, rows, 1, 2) == {(3, 4, 1, 1, 1_000_000)}

    def test_threshold_one_means_identical_sets(self, spark):
        rows = [(1, ["a", "b"]), (2, ["b", "a"]), (3, ["a", "b", "c"])]
        assert _spark_pairs(spark, rows, 1, 1) == {(1, 2, 2, 2, 1_000_000)}


class TestPlan:
    def test_no_cartesian(self, spark):
        rows = [(1, ["a", "b"]), (2, ["a", "c"])]
        plan = (
            setsim_join(_df(spark, rows), t_num=1, t_den=2)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_rejects_bad_threshold(self, spark):
        import pytest

        with pytest.raises(ValueError):
            setsim_join(_df(spark, [(1, ["a"])]), t_num=0, t_den=1)
        with pytest.raises(ValueError):
            setsim_join(_df(spark, [(1, ["a"])]), t_num=3, t_den=2)


class TestAutoSkew:
    """r6: the setsim ring of the auto-skew program — exact salted
    replicate-join for hot prefix tokens, probe-engaged."""

    def _skewed_rows(self):
        # 'hot' appears in every doc and, at t=3/10, prefixes are long
        # enough to admit it; the rest are distinct-ish tails
        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(40)]
        return [
            (i, ["hot"] + rng.sample(vocab, rng.randint(2, 6)))
            for i in range(60)
        ]

    def test_forced_hot_tokens_preserve_results(self, spark):
        rows = self._skewed_rows()
        plain = _spark_pairs(spark, rows, 3, 10)
        salted = {
            (r["id_a"], r["id_b"], r["inter"], r["uni"], r["jaccard_micro"])
            for r in setsim_join(
                _df(spark, rows), t_num=3, t_den=10,
                hot_prefix_tokens=["hot"], buckets=8,
            ).collect()
        }
        assert salted == plain == _brute(rows, 3, 10)

    def test_auto_engages_on_hot_prefix_and_matches(self, spark):
        from military_entity_extraction_based_on_large_models_spark.operators.setsim import (
            setsim_join_auto,
        )

        rows = self._skewed_rows()
        df = _df(spark, rows)
        auto = setsim_join_auto(df, t_num=3, t_den=10, hot_rows_threshold=10)
        plan = auto._jdf.queryExecution().executedPlan().toString()
        # the engaged plan is the hot/cold split: a Union of the two
        # candidate joins feeds the distinct
        assert "Union" in plan
        got = {
            (r["id_a"], r["id_b"], r["inter"], r["uni"], r["jaccard_micro"])
            for r in auto.collect()
        }
        assert got == _brute(rows, 3, 10)

    def test_auto_stays_plain_below_threshold(self, spark):
        from military_entity_extraction_based_on_large_models_spark.operators.setsim import (
            setsim_join_auto,
        )

        rows = self._skewed_rows()
        auto = setsim_join_auto(
            _df(spark, rows), t_num=3, t_den=10, hot_rows_threshold=10_000
        )
        plan = auto._jdf.queryExecution().executedPlan().toString()
        assert "Union" not in plan
