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
_MANIFEST_DDL = (
    "part_bucket int, doc_count bigint, doc_sha_xor bigint, "
    "row_count bigint, sha_xor bigint"
)


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
    first 15 hex chars — 16 could exceed signed-long range) — cheap, commutative, detects dropped/duplicated
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


def _hadoop_fs(spark: SparkSession, path_str: str):
    """(fs, Path-class) for the filesystem owning ``path_str`` — works for
    local, HDFS, and S3A alike (the Hadoop FileSystem API, not os.*)."""
    jvm = spark.sparkContext._jvm  # noqa: SLF001
    path_cls = jvm.org.apache.hadoop.fs.Path
    fs = path_cls(path_str).getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    )
    return fs, path_cls


def _delete_bucket_dirs(spark: SparkSession, data_dir: str, buckets) -> None:
    fs, path_cls = _hadoop_fs(spark, data_dir)
    if not fs.exists(path_cls(data_dir)):
        return
    for b in buckets:
        fs.delete(path_cls(f"{data_dir}/part_bucket={b}"), True)


def _list_bucket_dirs(spark: SparkSession, data_dir: str) -> set[int]:
    fs, path_cls = _hadoop_fs(spark, data_dir)
    base = path_cls(data_dir)
    if not fs.exists(base):
        return set()
    out: set[int] = set()
    for st in fs.listStatus(base):
        name = st.getPath().getName()
        if name.startswith("part_bucket="):
            try:
                out.add(int(name.split("=", 1)[1]))
            except ValueError:
                pass
    return out


def write_with_lineage(
    df: DataFrame,
    out_dir: str,
    n_buckets: int = 64,
    key: str = "doc_sha",
    input_docs: DataFrame | None = None,
    full_input: bool = False,
    input_digests: list | None = None,
) -> None:
    """Idempotent partitioned write + manifest commit.

    With ``input_docs`` (the doc slice that produced ``df``), every bucket
    the INPUT hashes into is re-committed — including buckets whose docs now
    produce ZERO output rows (round-2 review: dynamic partition overwrite
    only replaces buckets present in the output, so a re-processed bucket
    that went empty kept its stale rows AND had them folded into the fresh
    manifest digest).  Commit order makes the truncation crash-safe:

    1. drop the covered buckets' rows from the manifest (a crash after the
       partition delete then leaves them UN-vouched → they re-process on
       resume, instead of an unchanged-input resume skipping a bucket whose
       data was deleted);
    2. truncate every covered partition directory;
    3. append the new rows (partitions are clean, so append ≡ overwrite);
    4. commit the full manifest (fresh digests for covered buckets, carried
       rows for untouched ones).

    ``full_input`` declares ``input_docs`` to be the COMPLETE corpus (not a
    resume slice): buckets on disk that the input no longer hashes into are
    deleted and their manifest rows dropped (docs vanished entirely).  Leave
    it False when writing a ``resume_filter`` slice — untouched buckets must
    carry over.

    ``input_digests`` (rows of ``_doc_digest`` shape for the covered slice,
    e.g. from :func:`resume_state`) skips the digest job here entirely — one
    input scan per resumable run instead of two.

    Without ``input_docs``/``input_digests`` the legacy dynamic-overwrite
    path runs (digests derive from the output; zero-output buckets are
    invisible to it).
    """
    spark = df.sparkSession
    data_dir = os.path.join(out_dir, "data")
    manifest_dir = os.path.join(out_dir, MANIFEST_DIR)
    bucketed = with_bucket(df, n_buckets, key)
    prev_pinned = _read_manifest(spark, out_dir)  # already memory-pinned

    if input_docs is None and input_digests is None:
        # per-WRITE dynamic overwrite: setting the session conf here leaked
        # dynamic mode into every later partitioned overwrite in the session
        # (e.g. a recompaction that shrank its partition set silently kept
        # the stale ones — r3 review)
        (
            bucketed.write.option("partitionOverwriteMode", "dynamic")
            .partitionBy("part_bucket")
            .mode("overwrite")
            .parquet(data_dir)
        )
        written = _read_data(spark, data_dir)
        if written is None:
            current = spark.createDataFrame([], _MANIFEST_DDL)
        else:
            current = manifest_for(written, key)
        if prev_pinned is not None:
            carried = prev_pinned.join(
                current.select("part_bucket"), "part_bucket", "left_anti"
            )
            current = current.unionByName(carried)
        current.write.mode("overwrite").parquet(manifest_dir)
        return

    if input_digests is not None:
        in_digests = list(input_digests)
    else:
        bucketed_input = with_bucket(input_docs, n_buckets, key)
        # one job over the input: per-bucket digests (≤ n_buckets rows)
        in_digests = _doc_digest(bucketed_input, key).collect()
    covered = sorted(r["part_bucket"] for r in in_digests)

    stale = set(covered)
    if full_input:
        # docs vanished entirely: drop their data AND their manifest rows
        stale |= _list_bucket_dirs(spark, data_dir) - set(covered)
    if prev_pinned is not None:
        # step 1: un-vouch every bucket this run will touch — covered AND
        # (under full_input) vanished — BEFORE any partition delete, so a
        # crash anywhere in the window leaves those buckets un-vouched and
        # re-processable, never a manifest vouching deleted data (kept
        # derives from the pinned in-memory rows, so writing over the
        # manifest dir is safe)
        kept = prev_pinned.where(~F.col("part_bucket").isin(sorted(stale)))
        kept.write.mode("overwrite").parquet(manifest_dir)
        prev_pinned = None if full_input else kept
    _delete_bucket_dirs(spark, data_dir, sorted(stale))
    bucketed.write.partitionBy("part_bucket").mode("append").parquet(data_dir)

    # manifest computed from what was just durably written (not the in-flight
    # frame) so the manifest can never claim more rows than the data dir holds
    written = _read_data(spark, data_dir)
    doc_side = spark.createDataFrame(
        in_digests, "part_bucket int, doc_count bigint, doc_sha_xor bigint"
    )
    if written is None:  # every covered bucket went empty; nothing on disk
        row_side = spark.createDataFrame(
            [], "part_bucket int, row_count bigint, sha_xor bigint"
        )
    else:
        # restrict the digest scan to the buckets this run covers — the left
        # join below discards everything else anyway, and the isin predicate
        # partition-prunes the data scan (an incremental commit reads only
        # the just-written partitions, not the whole history)
        row_side = (
            written.where(F.col("part_bucket").isin(covered))
            .groupBy("part_bucket")
            .agg(
                F.count(F.lit(1)).alias("row_count"),
                F.bit_xor(_sha_long(key)).alias("sha_xor"),
            )
        )
    current = doc_side.join(row_side, "part_bucket", "left").select(
        "part_bucket",
        "doc_count",
        "doc_sha_xor",
        F.coalesce("row_count", F.lit(0)).alias("row_count"),
        F.coalesce("sha_xor", F.lit(0)).alias("sha_xor"),
    )
    if prev_pinned is not None:
        carried = prev_pinned.join(
            current.select("part_bucket"), "part_bucket", "left_anti"
        )
        current = current.unionByName(carried)
    current.write.mode("overwrite").parquet(manifest_dir)


def _read_data(spark: SparkSession, data_dir: str) -> DataFrame | None:
    """The written data, or None when nothing has ever produced output rows
    (an all-empty write leaves no parquet files to infer a schema from).

    Only AnalysisException (missing path / no files to infer a schema from)
    maps to None; any other failure — a transient store listing error,
    permissions — propagates, because treating it as "no data" would commit
    row_count=0 digests for buckets that really hold rows."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(data_dir)
        df.schema  # force schema inference so an empty dir fails here
        return df
    except AnalysisException:
        return None


def _read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Read the manifest PINNED in memory (one row per bucket by design):
    downstream plans — resume filters, carried-row unions — must not keep
    lazy references to manifest files that a subsequent commit overwrites."""
    path = os.path.join(out_dir, MANIFEST_DIR)
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(path)
    except AnalysisException:  # no manifest yet; other errors propagate
        return None
    return spark.createDataFrame(df.collect(), df.schema)


def completed_buckets(spark: SparkSession, out_dir: str) -> DataFrame | None:
    m = _read_manifest(spark, out_dir)
    if m is None:
        return None
    return m.select("part_bucket", "doc_count", "doc_sha_xor")


def resume_state(
    docs: DataFrame,
    out_dir: str,
    n_buckets: int = 64,
    key: str = "doc_sha",
) -> tuple[DataFrame, list]:
    """One-scan resume: (remaining bucketed docs, their per-bucket digests).

    Same validated semantics as :func:`resume_filter` (a bucket is skipped
    only when its digest matches the manifest), but the digest job runs ONCE
    and its rows feed straight into ``write_with_lineage(input_digests=...)``
    — a resumable run then scans the input twice (digest + pipeline) instead
    of three times.  The bucket-set compare happens driver-side on the
    ≤ n_buckets collected rows.
    """
    spark = docs.sparkSession
    done = completed_buckets(spark, out_dir)
    bucketed = with_bucket(docs, n_buckets, key)
    digest_rows = _doc_digest(bucketed, key).collect()
    committed = (
        {
            (r["part_bucket"], r["doc_count"], r["doc_sha_xor"])
            for r in done.collect()
        }
        if done is not None
        else set()
    )
    remaining_digests = [
        r
        for r in digest_rows
        if (r["part_bucket"], r["doc_count"], r["doc_sha_xor"]) not in committed
    ]
    rem_buckets = [r["part_bucket"] for r in remaining_digests]
    remaining = bucketed.where(F.col("part_bucket").isin(rem_buckets))
    return remaining, remaining_digests


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
