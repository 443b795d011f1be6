"""End-to-end: triples vs pure-Python oracle (P/R ≥ 0.95 gate, north rule),
sha256 lineage invariant, and checkpointed resume."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.plans import lineage
from military_entity_extraction_based_on_large_models_spark.plans.pipeline import (
    kg_pipeline,
    run_resumable,
)
from military_entity_extraction_based_on_large_models_spark.sources import fixtures


def _pipeline_triples(docs_df):
    return {
        (r["subj"], r["pred"], r["obj"], r["doc_sha"])
        for r in kg_pipeline(docs_df).collect()
    }


def test_triples_match_oracle_pr(spark, corpus, docs_df):
    got = _pipeline_triples(docs_df)
    gold = fixtures.oracle_triples(corpus)
    p, r, f1 = fixtures.judge_prf(got, gold)
    assert p >= 0.95 and r >= 0.95, (p, r, len(got), len(gold))
    # and in fact the deterministic cascade should be exact:
    assert got == gold


def test_sha256_lineage_invariant(spark, corpus, docs_df):
    """Every output row's doc_sha equals sha256 of the source content it came
    from (BASELINE.json input_hint per-row invariant)."""
    triples = kg_pipeline(docs_df)
    joined = triples.join(docs_df.select("doc_sha", "content"), "doc_sha", "inner")
    n_triples = triples.count()
    assert joined.count() == n_triples  # every sha resolves to a source row
    # spot-check the sha really is sha256(content)
    sample = joined.select("doc_sha", "content").limit(50).collect()
    for row in sample:
        assert hashlib.sha256(row["content"].encode()).hexdigest() == row["doc_sha"]


def test_resumable_write_and_skip(spark, docs_df, tmp_path):
    out = str(tmp_path / "kg_out")
    m1 = run_resumable(docs_df, out, n_buckets=8)
    first = spark.read.parquet(out + "/data")
    n1 = first.count()
    assert n1 > 0
    manifest = spark.read.parquet(out + "/_lineage")
    assert manifest.count() <= 8
    assert manifest.agg(F.sum("row_count")).first()[0] == n1
    # run metrics (north rule: lineage + metrics) agree with the manifest
    assert m1["rows_total"] == n1
    assert m1["buckets_written"] == m1["buckets_total"] == manifest.count()
    assert m1["docs_vouched"] == docs_df.count()

    # resume: the manifest records the INPUT digest per bucket, so with an
    # identical input NOTHING remains — including buckets whose docs emitted
    # zero triples
    remaining = lineage.resume_filter(docs_df, out, n_buckets=8)
    assert remaining.count() == 0

    # idempotency: re-running everything produces the identical triple set,
    # and the metrics record a zero-work resume
    m2 = run_resumable(docs_df, out, n_buckets=8)
    second = spark.read.parquet(out + "/data")
    assert second.count() == n1
    assert m2["buckets_written"] == 0
    assert m2["rows_total"] == n1


def test_resume_detects_new_doc_in_committed_bucket(spark, docs_df, tmp_path):
    """A NEW doc hashing into an already-committed bucket must flip that
    bucket's digest and re-process it (ADVICE r01: membership-only resume
    silently dropped such docs)."""
    from military_entity_extraction_based_on_large_models_spark.sources.documents import (
        with_doc_sha,
    )

    out = str(tmp_path / "kg_out2")
    run_resumable(docs_df, out, n_buckets=4)
    n1 = spark.read.parquet(out + "/data").count()

    new_doc = with_doc_sha(
        spark.createDataFrame(
            [("r9", "p9", "c9", "en", "an Eurofighter circled the base")],
            ["repo", "path", "commit", "lang", "content"],
        )
    )
    grown = docs_df.unionByName(new_doc)
    remaining = lineage.resume_filter(grown, out, n_buckets=4)
    # exactly the new doc's bucket re-opens: remaining covers every grown-input
    # doc of that bucket and nothing from the untouched buckets
    new_bucket = lineage.with_bucket(new_doc, 4).select("part_bucket").first()[0]
    rem_buckets = {r[0] for r in remaining.select("part_bucket").distinct().collect()}
    assert rem_buckets == {new_bucket}

    # end-to-end: re-running over the grown input picks the new doc up
    run_resumable(grown, out, n_buckets=4)
    data = spark.read.parquet(out + "/data")
    assert data.count() > n1
    assert data.where(F.col("subj") == "ent_eurofighter").count() > 0
    # and a third run over the same grown input is a no-op resume
    assert lineage.resume_filter(grown, out, n_buckets=4).count() == 0


def test_dictionary_encoded_ids_path_matches_jvm_path(spark, docs_df):
    """The dictionary-encoded Arrow path (int meta-row ids through Arrow +
    broadcast-vocab decode; the payload-bound opt-in alternative to the
    default strings path) must produce the identical triple set to the
    literal-containment JVM path on the same gazetteer."""
    from military_entity_extraction_based_on_large_models_spark.operators.extract import (
        extract_doc_mention_ids,
    )
    from military_entity_extraction_based_on_large_models_spark.operators.triples import (
        materialize_triples_from_doc_ids,
        materialize_triples_jvm,
    )
    from military_entity_extraction_based_on_large_models_spark.sources.gazetteer import (
        MILITARY_GAZETTEER,
    )

    # unambiguous slice of the real gazetteer (ambiguity is the linking
    # stage's job, not this path's), padded with never-matching aliases
    seen: dict[str, set] = {}
    for a, c, _l in MILITARY_GAZETTEER:
        seen.setdefault(a, set()).add(c)
    unamb = [e for e in MILITARY_GAZETTEER if len(seen[e[0]]) == 1]
    gaz = unamb + [(f"zz_unmatchable_{i}", f"ent_zz{i}", "other") for i in range(80)]
    per_doc = extract_doc_mention_ids(docs_df, gaz)
    got = {
        (r["subj"], r["pred"], r["obj"], r["doc_sha"])
        for r in materialize_triples_from_doc_ids(per_doc, gaz).collect()
    }
    want = {
        (r["subj"], r["pred"], r["obj"], r["doc_sha"])
        for r in materialize_triples_jvm(docs_df, unamb).collect()
    }
    assert got == want and len(got) > 0


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _docs_frame(spark, names):
    return spark.createDataFrame([(_sha(n), n) for n in names], ["doc_sha", "name"])


def _triples_frame(spark, rows):
    return spark.createDataFrame(
        [(_sha(d), s) for d, s in rows], ["doc_sha", "subj"]
    )


def test_stale_bucket_truncated_when_output_goes_empty(spark, tmp_path):
    """ADVICE r02 (medium): a re-processed bucket whose docs now produce ZERO
    output rows must have its old partition truncated and its manifest row
    re-committed with row_count=0 — not keep stale rows that the manifest then
    vouches for."""
    out = str(tmp_path / "lz")
    docs = _docs_frame(spark, ["d1", "d2"])
    t1 = _triples_frame(spark, [("d1", "s1a"), ("d1", "s1b"), ("d2", "s2")])
    lineage.write_with_lineage(t1, out, n_buckets=4, input_docs=docs)
    assert spark.read.parquet(out + "/data").count() == 3

    # same input docs, but d1 now emits nothing (content semantics changed)
    t2 = _triples_frame(spark, [("d2", "s2")])
    lineage.write_with_lineage(t2, out, n_buckets=4, input_docs=docs)
    data = spark.read.parquet(out + "/data")
    assert {r["subj"] for r in data.collect()} == {"s2"}
    manifest = spark.read.parquet(out + "/_lineage")
    assert manifest.agg(F.sum("row_count")).first()[0] == 1
    # the zero-output bucket is still vouched complete: resume skips everything
    assert lineage.resume_filter(docs, out, n_buckets=4).count() == 0


def test_crash_window_reprocesses_unvouched_bucket(spark, tmp_path):
    """The write commits in the order: un-vouch manifest rows → truncate
    partitions → append data → commit manifest.  Simulate a crash inside the
    window (bucket truncated, manifest row already dropped, data not yet
    written): resume must RE-PROCESS that bucket, never skip it."""
    out = str(tmp_path / "lz3")
    docs = _docs_frame(spark, ["d1", "d2"])
    t1 = _triples_frame(spark, [("d1", "s1"), ("d2", "s2")])
    lineage.write_with_lineage(t1, out, n_buckets=4, input_docs=docs)

    # reproduce the crash state for d1's bucket
    b1 = lineage.with_bucket(
        _docs_frame(spark, ["d1"]), 4, key="doc_sha"
    ).select("part_bucket").first()[0]
    m = spark.read.parquet(out + "/_lineage")
    kept = spark.createDataFrame(
        m.where(F.col("part_bucket") != b1).collect(), m.schema
    )
    kept.write.mode("overwrite").parquet(out + "/_lineage")
    lineage._delete_bucket_dirs(spark, out + "/data", [b1])

    remaining = lineage.resume_filter(docs, out, n_buckets=4)
    rem_buckets = {r["part_bucket"] for r in remaining.select("part_bucket").distinct().collect()}
    assert b1 in rem_buckets  # the un-vouched bucket re-opens

    # completing the interrupted run restores the full dataset
    lineage.write_with_lineage(
        _triples_frame(spark, [("d1", "s1")]), out, n_buckets=4,
        input_docs=_docs_frame(spark, ["d1"]),
    )
    data = spark.read.parquet(out + "/data")
    assert {r["subj"] for r in data.collect()} == {"s1", "s2"}
    assert lineage.resume_filter(docs, out, n_buckets=4).count() == 0


def test_full_input_prunes_vanished_buckets(spark, tmp_path):
    """full_input=True: buckets whose docs disappeared from the corpus are
    deleted (data + manifest row) instead of persisting forever."""
    out = str(tmp_path / "lz2")
    both = _docs_frame(spark, ["d1", "d2"])
    t1 = _triples_frame(spark, [("d1", "s1"), ("d2", "s2")])
    lineage.write_with_lineage(t1, out, n_buckets=4, input_docs=both)

    only_d2 = _docs_frame(spark, ["d2"])
    t2 = _triples_frame(spark, [("d2", "s2")])
    lineage.write_with_lineage(t2, out, n_buckets=4, input_docs=only_d2, full_input=True)
    data = spark.read.parquet(out + "/data")
    assert {r["subj"] for r in data.collect()} == {"s2"}
    manifest = spark.read.parquet(out + "/_lineage")
    assert manifest.agg(F.sum("row_count")).first()[0] == 1
    assert manifest.agg(F.sum("doc_count")).first()[0] == 1
    assert lineage.resume_filter(only_d2, out, n_buckets=4).count() == 0


def test_linking_keeps_null_name_error_rows(spark):
    """I5 error-containment rows (name NULL) must survive the hot/cold split
    in link_mentions (ADVICE r01: NULL fails both isin branches)."""
    from military_entity_extraction_based_on_large_models_spark.operators.linking import (
        link_mentions,
    )

    rows = [
        ("r", "p1", "c", 0, "Tiger", "ent_tiger_heli", "ctx"),
        ("r", "p2", "c", 0, None, None, None),  # error-containment row
    ]
    mentions = spark.createDataFrame(
        rows, ["repo", "path", "commit", "begin", "name", "canonical", "context"]
    )
    linked = link_mentions(mentions, {}, ambiguous_names=["Tiger"])
    assert linked.count() == 2
    assert linked.where(F.col("name").isNull()).count() == 1


# ---- randomized incremental-maintenance equivalence -------------------------

_MUT_GAZ = [
    ("alpha", "ent_alpha", "other"),
    ("bravo", "ent_bravo", "other"),
    ("charlie", "ent_charlie", "other"),
]


def _corpus_docs(spark, corpus):
    from military_entity_extraction_based_on_large_models_spark.sources.documents import (
        with_doc_sha,
    )

    rows = [("r", name, "c0", "txt", content) for name, content in sorted(corpus.items())]
    df = spark.createDataFrame(rows, ["repo", "path", "commit", "lang", "content"])
    return with_doc_sha(df)


def _incremental_step(spark, corpus, out, n_buckets):
    docs = _corpus_docs(spark, corpus)
    sliced = lineage.resume_filter(docs, out, n_buckets).drop("part_bucket")
    lineage.write_with_lineage(
        kg_pipeline(sliced, _MUT_GAZ), out, n_buckets, input_docs=sliced
    )
    return docs


def test_resume_equivalence_under_random_mutations(spark, tmp_path):
    """Property: an evolving corpus (seeded random adds / modifies / deletes)
    maintained through resume_filter + write_with_lineage always equals the
    fresh batch output on every LIVE bucket after each incremental step, and
    exactly (stale vanished buckets pruned) after a final full_input pass.
    Generalizes the single-scenario stale-bucket / crash-window tests."""
    import random

    rng = random.Random(20260816)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]

    def content():
        return " ".join(rng.choice(words) for _ in range(6))

    corpus = {f"d{i:03d}": content() for i in range(20)}
    next_id = 20
    out = str(tmp_path / "kg")
    n_buckets = 8

    _incremental_step(spark, corpus, out, n_buckets)

    for _step in range(4):
        for name in rng.sample(sorted(corpus), k=3):
            corpus[name] = content()          # modify
        for name in rng.sample(sorted(corpus), k=2):
            del corpus[name]                  # delete
        for _ in range(3):
            corpus[f"d{next_id:03d}"] = content()  # add
            next_id += 1

        docs = _incremental_step(spark, corpus, out, n_buckets)
        want = kg_pipeline(docs, _MUT_GAZ)

        # the incremental contract: every bucket the CURRENT corpus hashes
        # into is exact; only fully-vanished buckets may hold stale rows
        # until a full_input pass prunes them
        live = [
            r["part_bucket"]
            for r in lineage.with_bucket(docs, n_buckets)
            .select("part_bucket").distinct().collect()
        ]
        got_live = (
            spark.read.parquet(out + "/data")
            .where(F.col("part_bucket").isin(live))
            .drop("part_bucket")
        )
        assert got_live.exceptAll(want).count() == 0
        assert want.exceptAll(got_live).count() == 0

    # final reconcile: complete-corpus pass prunes vanished buckets exactly
    docs = _corpus_docs(spark, corpus)
    lineage.write_with_lineage(
        kg_pipeline(docs, _MUT_GAZ), out, n_buckets,
        input_docs=docs, full_input=True,
    )
    got = spark.read.parquet(out + "/data").drop("part_bucket")
    want = kg_pipeline(docs, _MUT_GAZ)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert lineage.resume_filter(docs, out, n_buckets).count() == 0


def test_ids_path_survives_reordered_gazetteer_cache(spark, docs_df):
    """Round-3 review: the executor automaton cache key must be
    ORDER-sensitive — a reordered-but-equal gazetteer enumerates meta-row
    ids differently, and a shared (sorted) key let the ids path decode
    against the wrong vocabulary.  Prime the cache with one order, then run
    the reversed order: both must yield the identical triple set."""
    from military_entity_extraction_based_on_large_models_spark.operators.extract import (
        extract_doc_mention_ids,
    )
    from military_entity_extraction_based_on_large_models_spark.operators.triples import (
        materialize_triples_from_doc_ids,
    )
    from military_entity_extraction_based_on_large_models_spark.sources.gazetteer import (
        MILITARY_GAZETTEER,
    )

    seen: dict[str, set] = {}
    for a, c, _l in MILITARY_GAZETTEER:
        seen.setdefault(a, set()).add(c)
    gaz = [e for e in MILITARY_GAZETTEER if len(seen[e[0]]) == 1]

    def triples(g):
        return {
            (r["subj"], r["pred"], r["obj"], r["doc_sha"])
            for r in materialize_triples_from_doc_ids(
                extract_doc_mention_ids(docs_df, g), g
            ).collect()
        }

    first = triples(gaz)
    assert first
    assert triples(list(reversed(gaz))) == first


def test_full_input_crash_window_never_vouches_deleted_buckets(
    spark, tmp_path, monkeypatch
):
    """Round-3 review: under full_input, vanished buckets must be un-vouched
    BEFORE their data is deleted — a crash inside the delete window must
    leave the on-disk manifest without their rows, not vouching deleted
    data."""
    out = str(tmp_path / "lzc")
    both = _docs_frame(spark, ["d1", "d2"])
    t1 = _triples_frame(spark, [("d1", "s1"), ("d2", "s2")])
    lineage.write_with_lineage(t1, out, n_buckets=4, input_docs=both)

    real_delete = lineage._delete_bucket_dirs

    def delete_then_crash(spark_, data_dir, buckets):
        real_delete(spark_, data_dir, buckets)
        raise RuntimeError("simulated crash after partition delete")

    monkeypatch.setattr(lineage, "_delete_bucket_dirs", delete_then_crash)
    only_d2 = _docs_frame(spark, ["d2"])
    t2 = _triples_frame(spark, [("d2", "s2")])
    try:
        lineage.write_with_lineage(
            t2, out, n_buckets=4, input_docs=only_d2, full_input=True
        )
    except RuntimeError:
        pass
    monkeypatch.setattr(lineage, "_delete_bucket_dirs", real_delete)

    # crash state: d1's bucket data is gone, and the manifest must NOT
    # contain its row (it was un-vouched before the delete)
    manifest = spark.read.parquet(out + "/_lineage")
    d1_bucket = lineage.with_bucket(
        _docs_frame(spark, ["d1"]), 4, key="doc_sha"
    ).select("part_bucket").first()[0]
    assert manifest.where(F.col("part_bucket") == d1_bucket).count() == 0

    # completing the interrupted run converges to the correct final state
    lineage.write_with_lineage(
        t2, out, n_buckets=4, input_docs=only_d2, full_input=True
    )
    data = spark.read.parquet(out + "/data")
    assert {r["subj"] for r in data.collect()} == {"s2"}
    assert lineage.resume_filter(only_d2, out, n_buckets=4).count() == 0


def test_to_ntriples_escaping(spark):
    from military_entity_extraction_based_on_large_models_spark.operators.triples import (
        to_ntriples,
    )

    t = spark.createDataFrame(
        [("ent a", "instance_of", 'we<ird">obj')], ["subj", "pred", "obj"]
    )
    line = to_ntriples(t).first()["ntriple"]
    assert line == (
        "<http://example.org/entity/ent%20a> "
        "<http://example.org/rel/instance_of> "
        "<http://example.org/entity/we%3Cird%22%3Eobj> ."
    )
