"""End-to-end KG construction pipeline (SURVEY.md §7.0 stages 1-5).

ingest → extract → link → dedup → (canonicalize) → materialize triples.

Each stage is a pure DataFrame→DataFrame function; the composition here is
the Spark-native equivalent of the reference's best cascade
(reflect_workflow3.py:93-217: extract → dedup → route → candidate-generate →
verify → normalize → materialize).  The whole plan is lazy — Catalyst sees
one tree and can pushdown/prune across stage boundaries.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame

from ..operators.canonicalize import canonical_clusters
from ..operators.extract import (
    dedup_mentions,
    extract_doc_mentions,
    extract_mentions,
)
from ..operators.linking import link_mentions
from ..operators.triples import (
    EXPR_GAZETTEER_MAX,
    materialize_triples,
    materialize_triples_from_doc_arrays,
    materialize_triples_jvm,
)
from ..sources.gazetteer import CONTEXT_TERMS, MILITARY_GAZETTEER
from . import lineage


def _ambiguous_names(gazetteer: Sequence[tuple[str, str, str]]) -> list[str]:
    """Aliases mapping to more than one canonical — only these need the
    disambiguation window in the link stage."""
    seen: dict[str, set[str]] = {}
    for alias, canonical, _label in gazetteer:
        seen.setdefault(alias, set()).add(canonical)
    return [a for a, cs in seen.items() if len(cs) > 1]


def kg_pipeline(
    docs: DataFrame,
    gazetteer: Sequence[tuple[str, str, str]] = MILITARY_GAZETTEER,
    context_terms: Mapping[str, Sequence[str]] | None = None,
) -> DataFrame:
    """documents(repo, path, commit, lang, content [, doc_sha]) → triples."""
    if "doc_sha" not in docs.columns:
        from ..sources.documents import with_doc_sha

        docs = with_doc_sha(docs)
    ambiguous = _ambiguous_names(gazetteer)
    if not ambiguous:
        if len(list(gazetteer)) <= EXPR_GAZETTEER_MAX:
            # pure-JVM path: small gazetteer → literal containment filter,
            # whole-stage codegen end-to-end, no Python stage, no shuffle
            from ..plans.parallelism import scale_out

            return materialize_triples_jvm(scale_out(docs), gazetteer)
        # zero-shuffle Arrow path: the extraction stage already emits one row
        # per document with its mention array; the per-doc entity set is an
        # in-place array_distinct, so no explode→regroup round trip and NO
        # exchange anywhere past the input repartition.
        # A dictionary-encoded variant exists (extract_doc_mention_ids +
        # materialize_triples_from_doc_ids: 4-byte ids through Arrow,
        # broadcast-vocab decode) — measured A/B at pinned 4 cores
        # (tools/bench_extract_dict.py, 930-alias dict, 16k docs): extraction
        # alone 1.45 vs 1.51 s, end-to-end 17.3 vs 16.4 s — the round-2
        # vocabulary-take assembly already removed the string cost, so the
        # decode join loses more than the payload saves.  Strings stay the
        # default; the ids path is the opt-in for payload-bound deployments.
        per_doc = extract_doc_mentions(docs, gazetteer, emit_context=False)
        return materialize_triples_from_doc_arrays(per_doc)
    mentions = extract_mentions(docs, gazetteer, emit_context=True)
    linked = link_mentions(
        mentions,
        # `is not None`: an explicit {} asks for pure lexicographic
        # tie-breaking — `or` would silently substitute the military defaults
        context_terms if context_terms is not None else CONTEXT_TERMS,
        ambiguous,
    )
    # no dedup_mentions stage: materialize_triples' per-doc collect_set IS the
    # (name, label) set semantics — one shuffle end-to-end instead of two
    return materialize_triples(linked)


def kg_mentions(
    docs: DataFrame,
    gazetteer: Sequence[tuple[str, str, str]] = MILITARY_GAZETTEER,
) -> DataFrame:
    """documents → deduped (doc, name, label) mention rows (stage 2+D1 only)."""
    if "doc_sha" not in docs.columns:
        from ..sources.documents import with_doc_sha

        docs = with_doc_sha(docs)
    return dedup_mentions(extract_mentions(docs, gazetteer))


def kg_pipeline_with_canonicalization(
    docs: DataFrame,
    gazetteer: Sequence[tuple[str, str, str]] = MILITARY_GAZETTEER,
    context_terms: Mapping[str, Sequence[str]] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full pipeline + connected-components canonical clusters.

    Returns (triples, clusters) where clusters maps every surface form and
    canonical id to its component representative.
    """
    if "doc_sha" not in docs.columns:
        from ..sources.documents import with_doc_sha

        docs = with_doc_sha(docs)
    ambiguous = _ambiguous_names(gazetteer)
    mentions = extract_mentions(docs, gazetteer, emit_context=bool(ambiguous))
    linked = link_mentions(
        mentions,
        # `is not None`: an explicit {} asks for pure lexicographic
        # tie-breaking — `or` would silently substitute the military defaults
        context_terms if context_terms is not None else CONTEXT_TERMS,
        ambiguous,
    )
    deduped = dedup_mentions(linked)
    clusters = canonical_clusters(deduped)
    triples = materialize_triples(deduped)
    return triples, clusters


def run_resumable(
    docs: DataFrame,
    out_dir: str,
    gazetteer: Sequence[tuple[str, str, str]] = MILITARY_GAZETTEER,
    n_buckets: int = 64,
) -> dict:
    """Checkpointed end-to-end run: skip committed buckets, write the rest
    idempotently with a per-partition lineage manifest (north rule).

    Returns run metrics (the north rule's "lineage + metrics" surface),
    derived from the tiny pinned manifest — no extra job over the data:
    ``buckets_total`` / ``buckets_written`` (manifest rows changed by THIS
    run; 0 on an unchanged-input re-run), ``docs_vouched`` / ``rows_total``
    (corpus-wide sums the manifest commits to), ``wall_sec``.
    """
    import time

    t0 = time.time()
    if "doc_sha" not in docs.columns:
        from ..sources.documents import with_doc_sha

        docs = with_doc_sha(docs)
    spark = docs.sparkSession
    before = lineage._read_manifest(spark, out_dir)  # noqa: SLF001
    before_rows = {tuple(r) for r in before.collect()} if before is not None else set()
    # resume_state runs the per-bucket digest ONCE and hands the rows to the
    # writer — two input scans per run (digest + pipeline), not three
    remaining, remaining_digests = lineage.resume_state(docs, out_dir, n_buckets)
    triples = kg_pipeline(remaining.drop("part_bucket"), gazetteer)
    # the manifest records the INPUT digest of the slice this run covered, so
    # resume validation can also vouch for docs that emitted zero triples
    lineage.write_with_lineage(
        triples, out_dir, n_buckets, input_digests=remaining_digests
    )
    after = lineage._read_manifest(spark, out_dir)  # noqa: SLF001
    after_rows = after.collect() if after is not None else []
    return {
        "buckets_total": len(after_rows),
        "buckets_written": sum(1 for r in after_rows if tuple(r) not in before_rows),
        "docs_vouched": sum(r["doc_count"] for r in after_rows),
        "rows_total": sum(r["row_count"] for r in after_rows),
        "wall_sec": round(time.time() - t0, 3),
    }
