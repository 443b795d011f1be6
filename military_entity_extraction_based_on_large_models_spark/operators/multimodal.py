"""Multimodal columns: binary payloads + typed metadata, Arrow-batched stages.

The reference pairs each document with a ``{doc_id}.jpg`` on disk and runs a
VLM per entity (ImageEntityExtractor.py:23-83); image bytes never enter its
data model.  Here media are first-class: an opaque ``binary`` column plus a
typed metadata struct, processed by ``mapInPandas`` stages whose Spark-side
plumbing (schema, batching, partitioning) is real.  The codec itself is
environment-dependent (no image/audio libs in this container), so decode is
a deterministic fake keyed on the payload bytes — clearly marked; swap
``_fake_decode`` for a real PIL/ffmpeg call in production.

Scale notes: binary payloads make rows wide — the stage repartitions by a
payload-size-aware bucket only when asked, and Arrow batch size should be
lowered (maxRecordsPerBatch) when payloads are MB-scale.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("payload_sha", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feat_0", IntegerType()),
        StructField("feat_1", IntegerType()),
        StructField("error", StringType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """DETERMINISTIC FAKE decode standing in for PIL/ffmpeg (libs absent in
    this container).  Real implementation: decode payload, return actual
    features.  The fake derives two stable pseudo-features from the bytes so
    the full Spark plumbing is testable end-to-end."""
    h = hashlib.sha256(payload).digest()
    return int.from_bytes(h[:2], "big"), int.from_bytes(h[2:4], "big")


def manifest_from_dir(spark, path: str) -> DataFrame:
    """binaryFile scan → media manifest (the reference's os.listdir existence
    set, foundation_workflow.py:56-59, as a DataFrame)."""
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("content").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """media rows → per-payload features via an Arrow-batched stage with
    row-level error capture (never task failure — reference I5 semantics)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in FEATURE_SCHEMA.fields}
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    data = bytes(payload)
                    f0, f1 = _fake_decode(data)
                    out["media_id"].append(media_id)
                    out["kind"].append(kind)
                    out["payload_sha"].append(hashlib.sha256(data).hexdigest())
                    out["n_bytes"].append(len(data))
                    out["feat_0"].append(f0)
                    out["feat_1"].append(f1)
                    out["error"].append(None)
                except Exception as exc:
                    out["media_id"].append(media_id)
                    out["kind"].append(kind)
                    out["payload_sha"].append(None)
                    out["n_bytes"].append(None)
                    out["feat_0"].append(None)
                    out["feat_1"].append(None)
                    out["error"].append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(out)

    from ..plans.parallelism import scale_out

    return scale_out(media.select("media_id", "kind", "payload")).mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: schema/partitioning are real; the pixel transform is
    NotImplemented in this container (no image libs) — the payload passes
    through and target dims are recorded, so downstream schema contracts can
    be integration-tested without codecs."""
    return media.withColumn("width", F.lit(width)).withColumn(
        "height", F.lit(height)
    )
