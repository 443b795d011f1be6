"""spark-submit --py-files deployment test (north-rule deployment shape).

Runs the REAL ``spark-submit`` binary (the one bundled with the installed
pyspark) with the engine shipped ONLY as a --py-files zip: the entry script
is copied to a temp dir and the subprocess environment carries no
PYTHONPATH, so the package can resolve from nowhere but the archive —
exactly what a cluster submit looks like.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

sys.path.insert(0, REPO)

from tools.make_pyfiles_zip import build  # noqa: E402


def _spark_submit() -> str:
    bundled = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return bundled if os.path.exists(bundled) else shutil.which("spark-submit")


def _run_submit(pyfiles: str, script: str, out_dir: str) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [
        _spark_submit(),
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=4g",
        "--py-files", pyfiles,
        script,
        "--input", SF_DIR,
        "--output", out_dir,
        "--source-format", "driver",
        "--gazetteer", "vocab",
        "--n-buckets", "8",
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=600, env=env, cwd=os.path.dirname(script),
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-4000:]}"
    summary_line = [
        ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
    ][-1]
    return json.loads(summary_line)


def test_spark_submit_pyfiles_roundtrip(spark, tmp_path):
    """Submit the job with the package importable only from the zip; the
    output must match the in-process batch pipeline, and a re-submit must be
    a no-op (resume skips every committed bucket)."""
    pyfiles = build(str(tmp_path / "mee_spark_pyfiles.zip"), repo_root=REPO)
    script = str(tmp_path / "submit_job.py")
    shutil.copy(os.path.join(REPO, "tools", "submit_job.py"), script)
    out_dir = str(tmp_path / "kg_out")

    first = _run_submit(pyfiles, script, out_dir)
    assert first["status"] == "ok"
    assert first["triples"] > 0

    # batch-equivalence: same triples as the in-process pipeline
    from military_entity_extraction_based_on_large_models_spark.plans.pipeline import (
        kg_pipeline,
    )
    from military_entity_extraction_based_on_large_models_spark.sources.documents import (
        read_driver_documents,
    )
    from military_entity_extraction_based_on_large_models_spark.sources.gazetteer import (
        VOCAB_GAZETTEER,
    )

    docs = read_driver_documents(spark, SF_DIR)
    expected = kg_pipeline(docs, VOCAB_GAZETTEER).count()
    assert first["triples"] == expected

    written = spark.read.parquet(out_dir + "/data")
    assert written.count() == expected

    # idempotent re-submit: nothing re-processed, nothing duplicated — the
    # run metrics (north rule: lineage + metrics) show zero buckets written
    second = _run_submit(pyfiles, script, out_dir)
    assert second["triples"] == expected
    assert second["committed_buckets"] == first["committed_buckets"]
    assert first["buckets_written"] == first["buckets_total"] > 0
    assert second["buckets_written"] == 0
    assert second["rows_total"] == first["rows_total"]


def test_pyfiles_zip_is_deterministic(tmp_path):
    a = build(str(tmp_path / "a.zip"), repo_root=REPO)
    b = build(str(tmp_path / "b.zip"), repo_root=REPO)
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()


def test_read_documents_table_format(spark):
    """source_format='table' resolves through the session catalog — the
    production path where an Iceberg table name comes from the metastore."""
    from military_entity_extraction_based_on_large_models_spark.sources.documents import (
        read_documents,
        read_driver_documents,
    )

    docs = read_driver_documents(spark, SF_DIR)
    docs.drop("doc_sha").createOrReplaceTempView("docs_catalog_view")
    via_table = read_documents(spark, "docs_catalog_view", source_format="table")
    assert via_table.count() == docs.count()
    assert via_table.exceptAll(docs).count() == 0


def _iceberg_on_classpath(spark) -> bool:
    """True iff the iceberg-spark-runtime jar is loadable in this JVM."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_read_documents_iceberg_guard(spark):
    import pytest

    from military_entity_extraction_based_on_large_models_spark.sources.documents import (
        read_documents,
    )

    if _iceberg_on_classpath(spark):
        pytest.skip("iceberg runtime present — guard path not reachable")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_documents(spark, "/tmp/nope", source_format="iceberg")
    with pytest.raises(ValueError, match="unknown source_format"):
        read_documents(spark, "/tmp/nope", source_format="csv")


def test_iceberg_round_trip(spark, tmp_path):
    """input_hint round-trip through a REAL Iceberg catalog (r3 verdict #7).

    Runs whenever the iceberg-spark-runtime jar is on the classpath — the day
    this environment gains the jar, the path is exercised with zero new work;
    until then it SKIPS (never silently passes).  Catalog configs are
    runtime-settable, so the shared session works: a hadoop catalog over
    tmp_path, writeTo().create(), then both readers (catalog table name and
    path-based iceberg format) must return the identical input_hint frame."""
    import pytest

    from military_entity_extraction_based_on_large_models_spark.sources.documents import (
        read_documents,
        read_driver_documents,
    )

    if not _iceberg_on_classpath(spark):
        pytest.skip(
            "iceberg-spark-runtime jar not on the classpath in this sandbox"
        )
    warehouse = str(tmp_path / "warehouse")
    spark.conf.set(
        "spark.sql.catalog.icetest", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.icetest.type", "hadoop")
    spark.conf.set("spark.sql.catalog.icetest.warehouse", warehouse)
    docs = read_driver_documents(spark, SF_DIR).drop("doc_sha")
    docs.writeTo("icetest.db.docs").create()

    via_table = read_documents(spark, "icetest.db.docs", source_format="table")
    assert via_table.count() == docs.count()
    via_path = read_documents(
        spark, f"{warehouse}/db/docs", source_format="iceberg"
    )
    assert via_path.exceptAll(via_table).count() == 0
    assert "doc_sha" in via_path.columns
