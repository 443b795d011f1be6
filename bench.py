"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "docs_per_sec": ..., "triples_per_sec": ...}

The headline metric is total wall time of the query set; per-query seconds
under "queries".  Throughput figures (docs/sec, triples/sec for the KG
pipeline) and the two-parallelism scaling run live in BENCH.md — run
`python bench.py --scaling` to produce both levels (local[8] vs local[32])
in separate JVMs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline set: flagship KG pipeline + heaviest relational/curation/vector ops
HEADLINE = [
    "kg_pipeline",            # special-cased: full extract→link→dedup→triples
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "outer_join_order_counts",
    "window_top_customer_per_nation",
    "events_daily",
    "events_user_sessions",
    "doc_quality",
    "dedup_minhash_pairs",
    "ann_bruteforce",
]


def run_bench(sf_dir: str, cpus: int) -> dict:
    from military_entity_extraction_based_on_large_models_spark.session import (
        get_spark,
    )

    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    spark = get_spark(app_name=f"mee-bench-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from military_entity_extraction_based_on_large_models_spark.plans.pipeline import (
        kg_pipeline,
    )
    from military_entity_extraction_based_on_large_models_spark.sources.documents import (
        read_driver_documents,
    )
    from military_entity_extraction_based_on_large_models_spark.sources.gazetteer import (
        VOCAB_GAZETTEER,
    )

    queries = entrymod.queries()
    timings: dict[str, float] = {}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_triples = 0

    for name in HEADLINE:
        t0 = time.time()
        if name == "kg_pipeline":
            docs = read_driver_documents(spark, sf_dir)
            out = kg_pipeline(docs, VOCAB_GAZETTEER, context_terms={})
            n_triples = out.count()
        else:
            queries[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    kg_sec = timings["kg_pipeline"]
    result = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "n_docs": n_docs,
        "n_triples": n_triples,
        "docs_per_sec": round(n_docs / kg_sec, 1) if kg_sec else None,
        "triples_per_sec": round(n_triples / kg_sec, 1) if kg_sec else None,
    }
    spark.stop()
    return result


def main() -> None:
    if "--scaling" in sys.argv:
        # run each level in its own JVM so executor-thread count is honest
        results = {}
        for cpus in (8, 32):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
            out = subprocess.run(
                [sys.executable, __file__],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        t8 = results[8]["docs_per_sec"]
        t32 = results[32]["docs_per_sec"]
        eff = round((t32 / t8) / 4, 3) if t8 else None
        print(
            json.dumps(
                {
                    "metric": "scaling_efficiency_8_to_32",
                    "value": eff,
                    "unit": "ratio",
                    "docs_per_sec_8": t8,
                    "docs_per_sec_32": t32,
                    "detail": results,
                }
            )
        )
        return
    print(json.dumps(run_bench(SF_DIR, CPUS)))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
