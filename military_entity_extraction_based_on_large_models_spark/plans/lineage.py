"""Per-partition lineage manifests + checkpointed resumability.

The reference "checkpoints" by rewriting the entire output JSON after every
document (foundation_workflow.py:114-115) — O(n²) I/O and its single biggest
scalability defect (SURVEY.md §4.1).  The Spark-native replacement:

* output is written partitioned by a stable bucket of the document key
  (``part_bucket = pmod(xxhash64(doc_sha), n_buckets)``), one idempotent
  overwrite per bucket (dynamic partition overwrite);
* a manifest row per bucket records the INPUT digest (distinct-doc count +
  xor of distinct doc shas) plus output row counts — enough to verify
  per-row sha256 lineage AND to decide, on resume, whether the committed
  bucket still covers exactly the docs the new input hashes into it;
* on restart, buckets whose committed input digest matches the current
  input's per-bucket digest are anti-joined away before any expensive stage
  runs; a NEW or changed doc flips its bucket's digest and the whole bucket
  re-processes (the idempotent overwrite makes that safe).

At 100 TB the bucket count is sized so one bucket ≈ one comfortable write task
(n_buckets ~ total_bytes / 256 MB); here it defaults small for tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_lineage"


def with_bucket(df: DataFrame, n_buckets: int, key: str = "doc_sha") -> DataFrame:
    return df.withColumn(
        "part_bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )


def _sha_long(key: str):
    return F.conv(F.substring(F.col(key), 1, 15), 16, 10).cast("long")


def _doc_digest(bucketed: DataFrame, key: str = "doc_sha") -> DataFrame:
    """(part_bucket, doc_count, doc_sha_xor) over DISTINCT doc shas — the
    order-independent per-bucket identity of an input slice."""
    return (
        bucketed.select("part_bucket", key)
        .distinct()
        .groupBy("part_bucket")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.bit_xor(_sha_long(key)).alias("doc_sha_xor"),
        )
    )


def manifest_for(
    df: DataFrame, key: str = "doc_sha", input_docs: DataFrame | None = None
) -> DataFrame:
    """Aggregate a bucketed output frame into its per-bucket lineage manifest.

    ``sha_xor`` folds the per-row content shas of the OUTPUT (bit_xor of the
    first 16 hex chars) — cheap, commutative, detects dropped/duplicated
    output rows.  ``doc_count``/``doc_sha_xor`` fold the DISTINCT doc shas of
    the INPUT slice (``input_docs``, bucketed; defaults to the output's own
    distinct keys) — comparable against a future input regardless of per-doc
    output fan-out, including docs that produced zero output rows.
    """
    doc_side = _doc_digest(input_docs if input_docs is not None else df, key)
    row_side = df.groupBy("part_bucket").agg(
        F.count(F.lit(1)).alias("row_count"),
        F.bit_xor(_sha_long(key)).alias("sha_xor"),
    )
    return doc_side.join(row_side, "part_bucket", "left").select(
        "part_bucket",
        "doc_count",
        "doc_sha_xor",
        F.coalesce("row_count", F.lit(0)).alias("row_count"),
        F.coalesce("sha_xor", F.lit(0)).alias("sha_xor"),
    )


def write_with_lineage(
    df: DataFrame,
    out_dir: str,
    n_buckets: int = 64,
    key: str = "doc_sha",
    input_docs: DataFrame | None = None,
) -> None:
    """Idempotent partitioned write + manifest commit.

    Dynamic partition overwrite makes re-running a subset of buckets safe:
    only the buckets present in ``df`` are replaced.  ``input_docs`` (the doc
    slice that produced ``df``) lets the manifest claim completeness for
    buckets whose docs produced zero output rows; manifest rows for buckets
    NOT covered by this run are carried over from the previous manifest.
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    bucketed = with_bucket(df, n_buckets, key)
    bucketed.write.partitionBy("part_bucket").mode("overwrite").parquet(
        os.path.join(out_dir, "data")
    )
    prev = _read_manifest(spark, out_dir)
    # manifest computed from what was just durably written (not the in-flight
    # frame) so the manifest can never claim more rows than the data dir holds
    written = spark.read.parquet(os.path.join(out_dir, "data"))
    bucketed_input = (
        with_bucket(input_docs, n_buckets, key) if input_docs is not None else None
    )
    current = manifest_for(written, key, input_docs=bucketed_input)
    if prev is not None:
        # pin the previous manifest in memory (tiny: one row per bucket)
        # before overwriting the directory its lazy plan would read from
        prev_pinned = spark.createDataFrame(prev.collect(), prev.schema)
        carried = prev_pinned.join(
            current.select("part_bucket"), "part_bucket", "left_anti"
        )
        current = current.unionByName(carried)
    current.write.mode("overwrite").parquet(os.path.join(out_dir, MANIFEST_DIR))


def _read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = os.path.join(out_dir, MANIFEST_DIR)
    try:
        df = spark.read.parquet(path)
        df.first()  # force schema+read so a half-written dir fails here
        return df
    except Exception:
        return None


def completed_buckets(spark: SparkSession, out_dir: str) -> DataFrame | None:
    m = _read_manifest(spark, out_dir)
    if m is None:
        return None
    return m.select("part_bucket", "doc_count", "doc_sha_xor")


def resume_filter(
    docs: DataFrame,
    out_dir: str,
    n_buckets: int = 64,
    key: str = "doc_sha",
    validate: bool = True,
) -> DataFrame:
    """Drop input rows whose bucket already committed — the checkpointed-
    resumability contract of the north rule.

    With ``validate`` (default), a committed bucket is skipped only when the
    input's per-bucket (distinct-doc count, doc-sha xor) matches what the
    manifest recorded: a NEW or changed document hashing into a previously
    committed bucket flips the digest and the whole bucket is re-processed
    (round-1 review: membership-only anti-join silently dropped such docs).
    ``validate=False`` keeps the cheap membership-only anti-join for callers
    that guarantee an identical input set across runs.
    """
    done = completed_buckets(docs.sparkSession, out_dir)
    bucketed = with_bucket(docs, n_buckets, key)
    if done is None:
        return bucketed
    if not validate:
        return bucketed.join(
            F.broadcast(done.select("part_bucket")), "part_bucket", "left_anti"
        )
    verified = _doc_digest(bucketed, key).join(
        F.broadcast(done), ["part_bucket", "doc_count", "doc_sha_xor"], "left_semi"
    ).select("part_bucket")
    return bucketed.join(F.broadcast(verified), "part_bucket", "left_anti")
