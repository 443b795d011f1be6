"""Seeded BPE tokenizer: trainer determinism (retrain == frozen rules),
pure-Python replica exactness of the Arrow apply path, structural
invariants, the Arrow plan gate, and packing by learned-token budgets."""

from __future__ import annotations

import pytest

from military_entity_extraction_based_on_large_models_spark.operators import bpe


def test_encode_word_semantics():
    merges = [("a", "b"), ("ab", "c")]
    assert bpe.encode_word("abc", merges) == ["abc"]
    assert bpe.encode_word("abab", merges) == ["ab", "ab"]
    # left-to-right non-overlap: aaa with (a,a) -> [aa, a], never [a, aa]
    assert bpe.encode_word("aaa", [("a", "a")]) == ["aa", "a"]
    assert bpe.encode_word("x", merges) == ["x"]


def test_encode_concat_invariant():
    merges = [("a", "b"), ("b", "c"), ("ab", "c")]
    for w in ["abcabc", "aabbcc", "cba", "abcd", "a"]:
        assert "".join(bpe.encode_word(w, merges)) == w


def test_trainer_reproduces_frozen_merges(spark):
    """The frozen BPE_MERGES constant IS the trainer's output on the sf0.001
    corpus — retraining must reproduce it exactly (drift gate: if the
    trainer or the corpus changes, this fails loudly rather than letting
    the oracle chain diverge from the Spark path)."""
    import __spark_entry__ as entrymod

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = bpe.train_bpe_merges(d, n_merges=60, max_words=2000)
    assert got == [tuple(m) for m in entrymod.BPE_MERGES]


def test_spark_apply_matches_pure_python(spark):
    import __spark_entry__ as entrymod

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = {
        r["doc_id"]: (r["n_bpe_tokens"], r["bpe_tokens"])
        for r in bpe.bpe_token_stats(d, entrymod.BPE_MERGES).collect()
    }
    src = {r["doc_id"]: r["text"] for r in d.select("doc_id", "text").collect()}
    assert set(rows) == set(src)
    for doc_id, text in src.items():
        toks = bpe.encode_text(text, entrymod.BPE_MERGES)
        assert rows[doc_id] == (len(toks), " ".join(toks)), doc_id


def test_apply_plan_is_arrow_batched(spark):
    import __spark_entry__ as entrymod

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = bpe.bpe_token_stats(d, entrymod.BPE_MERGES)._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan  # whole-batch Arrow, not row-at-a-time Python
    assert "BatchEvalPython" not in plan


def test_pack_documents_by_bpe_counts(spark):
    """size_col wires the learned token counts into the packing window: the
    bin offsets must be the running sum of n_bpe_tokens, not whitespace
    counts."""
    from pyspark.sql import functions as F

    from military_entity_extraction_based_on_large_models_spark.operators.packing import (
        pack_documents,
    )

    import __spark_entry__ as entrymod

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = bpe.bpe_token_stats(d, entrymod.BPE_MERGES)
    joined = d.join(stats.select("doc_id", "n_bpe_tokens"), "doc_id")
    packed = pack_documents(
        joined,
        bin_tokens=256,
        text_col="text",
        order_col="doc_id",
        shard=(F.col("doc_id") % 4),
        size_col=F.col("n_bpe_tokens"),
    ).collect()
    by_shard: dict[int, list] = {}
    for r in packed:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == 4
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["doc_id"])
        offset = 0
        for r in rows:
            assert r["n_tokens"] == r["n_bpe_tokens"]
            assert r["bin_offset"] == offset
            assert r["bin_id"] == offset // 256
            offset += r["n_tokens"]


def test_trainer_tie_break_deterministic(spark):
    # two words with identical counts: pair ties must break to the
    # lexicographically smallest pair, independent of input order
    a = spark.createDataFrame([("zz xy",), ("xy zz",)], ["text"])
    b = spark.createDataFrame([("xy zz",), ("zz xy",)], ["text"])
    ma = bpe.train_bpe_merges(a, n_merges=2, max_words=10)
    mb = bpe.train_bpe_merges(b, n_merges=2, max_words=10)
    assert ma == mb == [("x", "y"), ("z", "z")]
