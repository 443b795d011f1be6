"""spark-submit entry point: resumable KG construction as a cluster job.

The north rule's deployment shape (reference runs a single-process GPU loop;
this engine ships as a Spark application):

    spark-submit --master <cluster-url> \
        --py-files dist/mee_spark_pyfiles.zip \
        tools/submit_job.py \
        --input  <parquet dir | iceberg path | catalog table> \
        --output <triples dir> \
        [--source-format parquet|iceberg|table|driver] \
        [--n-buckets 64] [--shuffle-partitions N]

The engine package is imported from the ``--py-files`` zip (built by
tools/make_pyfiles_zip.py) — nothing is read from a checkout on the
executors.  The job is idempotent: re-submitting after a failure skips
committed buckets via the per-partition lineage manifest
(plans/lineage.py), so a preempted cluster run resumes where it stopped.

tests/test_submit.py drives this exact command end-to-end (local master,
package importable ONLY from the zip) and asserts batch-equivalence plus
resume idempotency.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="input documents location")
    p.add_argument("--output", required=True, help="triples output directory")
    p.add_argument(
        "--source-format",
        default="parquet",
        choices=["parquet", "iceberg", "table", "driver"],
        help="'driver' = the sandbox testdata shape (documents.parquet dir); "
        "others are input_hint-shaped (repo, path, commit, lang, content)",
    )
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument(
        "--gazetteer",
        default="military",
        choices=["military", "vocab"],
        help="'military' = the reference alias dictionary; 'vocab' = the "
        "sandbox-testdata vocabulary gazetteer (what entry()/bench.py use)",
    )
    p.add_argument(
        "--shuffle-partitions",
        type=int,
        default=None,
        help="override spark.sql.shuffle.partitions (cluster: ~2-3x total cores)",
    )
    args = p.parse_args(argv)

    # imported here, not at module top: the package arrives via --py-files,
    # which lands on sys.path during app startup
    from military_entity_extraction_based_on_large_models_spark.plans.pipeline import (
        run_resumable,
    )
    from military_entity_extraction_based_on_large_models_spark.session import get_spark
    from military_entity_extraction_based_on_large_models_spark.sources.documents import (
        read_documents,
        read_driver_documents,
    )

    # master="" → the engine's scale defaults (AQE, skew split, Arrow, UTC)
    # on top of whatever master/deploy-mode spark-submit provided
    spark = get_spark(
        app_name="mee-kg-submit",
        master="",
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("WARN")

    if args.source_format == "driver":
        docs = read_driver_documents(spark, args.input)
    else:
        docs = read_documents(spark, args.input, source_format=args.source_format)

    if args.gazetteer == "vocab":
        from military_entity_extraction_based_on_large_models_spark.sources.gazetteer import (
            VOCAB_GAZETTEER,
        )

        gaz = VOCAB_GAZETTEER
    else:
        from military_entity_extraction_based_on_large_models_spark.sources.gazetteer import (
            MILITARY_GAZETTEER,
        )

        gaz = MILITARY_GAZETTEER

    metrics = run_resumable(
        docs, args.output, gazetteer=gaz, n_buckets=args.n_buckets
    )
    print(
        json.dumps(
            {
                "status": "ok",
                "output": args.output,
                "triples": metrics["rows_total"],
                "committed_buckets": metrics["buckets_total"],
                **metrics,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
