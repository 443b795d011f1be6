"""Document-corpus sources.

The engine's canonical input is the BASELINE.json ``input_hint`` table::

    documents(repo: string, path: string, commit: string, lang: string,
              content: string)

(the Iceberg-shaped analogue of the reference's ``{doc_id -> {"text"}}`` JSON
corpus, foundation_workflow.py:53-54).  Two readers:

* :func:`read_documents` — parquet/Iceberg scan of an input_hint-shaped table.
* :func:`read_driver_documents` — adapter over the driver testdata's
  ``documents.parquet`` (columns doc_id, text, lang, source, n_chars),
  projecting it into input_hint shape so every KG operator runs unchanged.

Both attach ``doc_sha = sha2(content, 256)`` — the per-row lineage invariant
the north rule requires carried through every stage — and repartition by
``hash(repo, path)`` (mega-repo skew clause) only when asked: at read time the
parquet split already balances bytes; the explicit repartition matters before
wide per-doc UDF stages where row cost, not byte count, dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def with_doc_sha(df: DataFrame) -> DataFrame:
    """Attach the per-row content lineage key (input_hint invariant)."""
    return df.withColumn("doc_sha", F.sha2(F.col("content"), 256))


def read_documents(
    spark: SparkSession,
    path: str,
    repartition_by_repo_path: bool = False,
    source_format: str = "parquet",
) -> DataFrame:
    """Scan an input_hint-shaped table.

    ``source_format``: "parquet" (default — the only format present in this
    container), "iceberg" (``spark.read.format("iceberg").load``; requires the
    Iceberg runtime jar on the cluster), or "table" (catalog-registered
    Iceberg table name via ``spark.table`` — the production path at 100 TB,
    where partition pruning comes from the Iceberg metadata layer).

    Column pruning and predicate pushdown are Catalyst's job — callers filter
    and select on the returned frame and the scan narrows automatically
    (verify with ``df.explain``: PushedFilters / ReadSchema).
    """
    if source_format == "parquet":
        df = spark.read.parquet(path)
    elif source_format == "iceberg":
        # Guarded: this container carries no Iceberg runtime jar, so the raw
        # Spark error ("Failed to find data source: iceberg") is replaced with
        # an actionable one naming the dependency (round-1 review item).
        try:
            df = spark.read.format("iceberg").load(path)
        except Exception as exc:  # noqa: BLE001 — re-raise with context
            raise RuntimeError(
                "Iceberg read requires the iceberg-spark-runtime jar on the "
                "cluster classpath (spark.jars.packages="
                "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<version>); "
                "it is not bundled in this environment"
            ) from exc
    elif source_format == "table":
        df = spark.table(path)
    else:
        raise ValueError(f"unknown source_format: {source_format}")
    df = with_doc_sha(df.select(*DOC_COLUMNS))
    if repartition_by_repo_path:
        # Balance per-document compute cost ahead of the extraction UDF; at
        # cluster scale this also breaks up mega-repo file locality skew.
        df = df.repartition(F.pmod(F.hash("repo", "path"), F.lit(2048)))
    return df


def read_driver_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver testdata documents.parquet → input_hint shape.

    doc_id → path (stringified), source → repo, text → content; commit is a
    deterministic function of (repo, path) as in FIXTURES.md §1.
    """
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = raw.select(
        F.col("source").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.substring(F.sha2(F.concat_ws("/", "source", F.col("doc_id").cast("string")), 256), 1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    return with_doc_sha(df)
