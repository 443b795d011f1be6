"""Streaming KG construction: incremental extraction over a document stream.

The reference processes a fixed directory once per run (reflect_workflow1.py
main loop re-reads everything); at 100 TB the operational mode is
incremental — new documents land continuously and triples must append
exactly once.  Two surfaces:

* :func:`stream_kg_triples` — the stateless extraction plan running AS a
  Structured Streaming query: the same ``kg_pipeline`` stages (pure-JVM
  containment filter or the mapInArrow matcher) are streaming-compatible
  because the flagship plan is stateless per document (no shuffle, no
  window).  Append mode, watermark-free.  Ambiguity-routed linking needs a
  per-doc groupBy, so gazetteers with ambiguous aliases are rejected here —
  use the foreachBatch path below, where each micro-batch is a plain batch
  frame and the FULL pipeline applies.

* :func:`run_streaming_resumable` — the production sink: ``foreachBatch``
  drives the batch pipeline per micro-batch and writes through the lineage
  writer into a per-batch directory (``batch=<id>/data`` +
  ``batch=<id>/_lineage``).  Structured Streaming's commit log guarantees a
  micro-batch is never skipped but MAY be replayed after a failure between
  the sink write and the commit; the lineage writer makes the replay
  idempotent (same input docs → same buckets truncated and rewritten →
  byte-identical output), so the composition is exactly-once at the row
  level without any sink transaction support.
"""

from __future__ import annotations

import os
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..plans import lineage
from ..plans.pipeline import _ambiguous_names, kg_pipeline
from ..sources.gazetteer import MILITARY_GAZETTEER


def stream_documents(spark: SparkSession, path: str, schema) -> DataFrame:
    """``readStream`` over a directory of input_hint-shaped parquet files.

    Streaming file sources require an explicit schema (no inference race
    with concurrently-landing files); pass the batch table's ``.schema``.
    """
    return spark.readStream.schema(schema).parquet(path)


def stream_kg_triples(
    docs: DataFrame,
    gazetteer: Sequence[tuple[str, str, str]] = MILITARY_GAZETTEER,
) -> DataFrame:
    """The flagship extraction plan on a streaming frame (append mode).

    Works for the stateless regimes (unambiguous gazetteers — the pure-JVM
    and Arrow paths); raises for ambiguous-alias gazetteers, whose linking
    stage needs a per-document groupBy that append-mode streaming cannot
    express without state — route those through
    :func:`run_streaming_resumable` instead.
    """
    if not docs.isStreaming:
        raise ValueError("stream_kg_triples expects a streaming frame; "
                         "use kg_pipeline for batch inputs")
    if _ambiguous_names(gazetteer):
        raise ValueError(
            "ambiguous-alias linking requires per-doc grouping state; use "
            "run_streaming_resumable (foreachBatch runs the full batch "
            "pipeline per micro-batch)"
        )
    return kg_pipeline(docs, gazetteer)


def write_batch_with_lineage(
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    gazetteer: Sequence[tuple[str, str, str]] = MILITARY_GAZETTEER,
    context_terms: Mapping[str, Sequence[str]] | None = None,
    n_buckets: int = 16,
) -> None:
    """Process ONE micro-batch: full batch pipeline → lineage write under
    ``out_dir/batch=<id>``.  Replay-idempotent: re-running the same
    (batch_df, batch_id) truncates and rewrites the same buckets, so a
    micro-batch replayed after a crash-before-commit cannot duplicate rows.
    Exposed module-level (not a closure) so tests can replay it directly.
    """
    from ..sources.documents import with_doc_sha

    if "doc_sha" not in batch_df.columns:
        batch_df = with_doc_sha(batch_df)
    # NOT "batch=<id>": a name=value dir would collide with Spark partition
    # discovery when globbing across batches (CONFLICTING_DIRECTORY_STRUCTURES)
    batch_out = os.path.join(out_dir, f"batch_{batch_id:08d}")
    triples = kg_pipeline(batch_df, gazetteer, context_terms)
    lineage.write_with_lineage(
        triples, batch_out, n_buckets, input_docs=batch_df
    )


def run_streaming_resumable(
    docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    gazetteer: Sequence[tuple[str, str, str]] = MILITARY_GAZETTEER,
    context_terms: Mapping[str, Sequence[str]] | None = None,
    n_buckets: int = 16,
    available_now: bool = True,
):
    """Incremental KG construction over a document stream.

    ``available_now=True`` (default) drains everything currently in the
    source and stops — the incremental-batch operational shape (cron-style
    catch-up runs); ``False`` runs continuously.  Returns the started query;
    callers ``awaitTermination()``.
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        write_batch_with_lineage(
            batch_df, batch_id, out_dir, gazetteer, context_terms, n_buckets
        )

    writer = (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_streamed_triples(spark: SparkSession, out_dir: str) -> DataFrame:
    """All triples emitted so far across micro-batches (append-only union).

    Batch dirs are enumerated through the Hadoop FileSystem API (works on
    local, HDFS, S3A alike) and passed as explicit root paths so each batch's
    ``part_bucket=`` layout is partition-discovered independently — a single
    glob would trip CONFLICTING_DIRECTORY_STRUCTURES across batch roots."""
    fs, path_cls = lineage._hadoop_fs(spark, out_dir)  # noqa: SLF001
    root = path_cls(out_dir)
    if not fs.exists(root):
        raise FileNotFoundError(out_dir)
    data_dirs = [
        str(st.getPath().toString()) + "/data"
        for st in fs.listStatus(root)
        if st.isDirectory() and st.getPath().getName().startswith("batch_")
        and fs.exists(path_cls(str(st.getPath().toString()) + "/data"))
    ]
    if not data_dirs:
        raise FileNotFoundError(f"no committed batch outputs under {out_dir}")
    # one read per batch root, unioned: Spark refuses multi-root partition
    # discovery over the per-batch part_bucket= layouts (KD009).  Fine for
    # operational batch counts; a long history is compacted downstream.
    # A micro-batch whose docs matched nothing leaves a data dir with only
    # _SUCCESS — no parquet files, so the read raises AnalysisException
    # (UNABLE_TO_INFER_SCHEMA); those batches contribute no rows and are
    # skipped.
    from functools import reduce

    from pyspark.errors import AnalysisException

    frames = []
    for d in sorted(data_dirs):
        try:
            frames.append(spark.read.parquet(d))
        except AnalysisException:
            continue
    if not frames:
        raise FileNotFoundError(
            f"every committed batch under {out_dir} produced zero triples"
        )
    out = reduce(lambda a, b: a.unionByName(b), frames)
    # part_bucket is the sink's physical layout, not part of the triple schema
    return out.drop("part_bucket")


def compact_streamed_triples(
    spark: SparkSession,
    out_dir: str,
    target_dir: str,
    n_buckets: int = 64,
) -> None:
    """Fold the per-batch streaming history into one bucket-partitioned
    dataset (``target_dir/data``, same physical layout as the batch sink).

    One shuffle (repartition by doc-sha bucket).  The batch dirs are left
    untouched — the history stays append-only; readers swap to the compacted
    dir once this write commits.  The compacted dir is a READ optimization,
    not a resume checkpoint: lineage manifests vouch for input-doc digests,
    which triples alone cannot reconstruct (zero-triple docs are invisible
    here), so incremental processing keeps running against ``out_dir``.
    """
    triples = read_streamed_triples(spark, out_dir)
    bucketed = lineage.with_bucket(triples, n_buckets, key="doc_sha")
    (
        bucketed.repartition("part_bucket")
        .write.partitionBy("part_bucket")
        .mode("overwrite")
        .parquet(os.path.join(target_dir, "data"))
    )
