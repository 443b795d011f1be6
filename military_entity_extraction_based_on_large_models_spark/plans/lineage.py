"""Per-partition lineage manifests + checkpointed resumability.

The reference "checkpoints" by rewriting the entire output JSON after every
document (foundation_workflow.py:114-115) — O(n²) I/O and its single biggest
scalability defect (SURVEY.md §4.1).  The Spark-native replacement:

* output is written partitioned by a stable bucket of the document key
  (``part_bucket = pmod(xxhash64(doc_sha), n_buckets)``), one idempotent
  overwrite per bucket (dynamic partition overwrite);
* a manifest row per bucket records (bucket, doc_count, row_count,
  content_sha_xor) — enough to verify per-row sha256 lineage and to decide
  completeness;
* on restart, completed buckets are read from the manifest and the input is
  anti-joined away before any expensive stage runs — resume costs one scan of
  the (tiny) manifest, not a re-run.

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


def manifest_for(df: DataFrame, key: str = "doc_sha") -> DataFrame:
    """Aggregate a bucketed frame into its per-bucket lineage manifest.

    ``sha_xor`` is an order-independent fold of the per-row content shas
    (bit_xor of the first 16 hex chars) — cheap, commutative, and enough to
    detect any dropped/duplicated row per bucket.
    """
    return df.groupBy("part_bucket").agg(
        F.countDistinct(key).alias("doc_count"),
        F.count(F.lit(1)).alias("row_count"),
        F.bit_xor(F.conv(F.substring(F.col(key), 1, 15), 16, 10).cast("long")).alias(
            "sha_xor"
        ),
    )


def write_with_lineage(
    df: DataFrame,
    out_dir: str,
    n_buckets: int = 64,
    key: str = "doc_sha",
) -> None:
    """Idempotent partitioned write + manifest commit.

    Dynamic partition overwrite makes re-running a subset of buckets safe:
    only the buckets present in ``df`` are replaced.
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    bucketed = with_bucket(df, n_buckets, key)
    bucketed.write.partitionBy("part_bucket").mode("overwrite").parquet(
        os.path.join(out_dir, "data")
    )
    # manifest computed from what was just durably written (not the in-flight
    # frame) so the manifest can never claim more than the data directory holds
    written = spark.read.parquet(os.path.join(out_dir, "data"))
    manifest_for(written, key).write.mode("overwrite").parquet(
        os.path.join(out_dir, MANIFEST_DIR)
    )


def completed_buckets(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = os.path.join(out_dir, MANIFEST_DIR)
    try:
        return spark.read.parquet(path).select("part_bucket")
    except Exception:
        return None


def resume_filter(
    docs: DataFrame, out_dir: str, n_buckets: int = 64, key: str = "doc_sha"
) -> DataFrame:
    """Drop input rows whose bucket already committed (anti-join on the
    manifest) — the checkpointed-resumability contract of the north rule."""
    done = completed_buckets(docs.sparkSession, out_dir)
    bucketed = with_bucket(docs, n_buckets, key)
    if done is None:
        return bucketed
    return bucketed.join(F.broadcast(done), "part_bucket", "left_anti")
