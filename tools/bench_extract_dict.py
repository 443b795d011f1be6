"""Large-dictionary extraction A/B: string-struct Arrow path vs
dictionary-encoded ids path (NOTES.md round-2 lead #1).

Dictionary: every ordered pair of distinct words from the first 50 docs'
vocabulary (hundreds of aliases, far past EXPR_GAZETTEER_MAX), so the
flagship routes through the Arrow stage and many aliases really match —
the regime where mention strings dominated the Arrow payload.
``build_bigram_gazetteer`` is shared with ``bench.py --scaling``'s arrow
mode (one construction, no drift).

Run pinned:  taskset -c 0-3 python tools/bench_extract_dict.py 4
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.operators.extract import (
    extract_doc_mention_ids,
    extract_doc_mentions,
)
from military_entity_extraction_based_on_large_models_spark.operators.triples import (
    materialize_triples_from_doc_arrays,
    materialize_triples_from_doc_ids,
)
from military_entity_extraction_based_on_large_models_spark.session import get_spark
from military_entity_extraction_based_on_large_models_spark.sources.documents import (
    read_driver_documents,
    with_doc_sha,
)


def build_bigram_gazetteer(base_docs, sample_docs: int = 50):
    """Deterministic heavily-matching dictionary: every ordered pair of
    distinct words drawn from the first ``sample_docs`` docs' vocabulary."""
    words = sorted(
        {
            w
            for r in base_docs.select("content").limit(sample_docs).collect()
            for w in r["content"].split()
        }
    )
    return [
        (f"{a} {b}", f"ent_{a}_{b}", "other")
        for a in words
        for b in words
        if a != b
    ]


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(
        app_name=f"dict-bench-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = read_driver_documents(spark, sf_dir).drop("doc_sha")
    docs = with_doc_sha(
        base.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))))
        .withColumn("path", F.concat_ws("#", "path", "_r"))
        .drop("_r")
    ).repartition(2 * cpus).localCheckpoint(eager=True)
    n_docs = docs.count()

    gaz = build_bigram_gazetteer(base)
    print(f"docs={n_docs} dict={len(gaz)}", file=sys.stderr)

    def run_strings() -> int:
        per_doc = extract_doc_mentions(docs, gaz, emit_context=False)
        return materialize_triples_from_doc_arrays(per_doc).count()

    def run_ids() -> int:
        per_doc = extract_doc_mention_ids(docs, gaz)
        return materialize_triples_from_doc_ids(per_doc, gaz).count()

    results = {}
    for name, fn in [("strings", run_strings), ("ids", run_ids)]:
        fn()  # warm: JIT/codegen + automaton build
        times = []
        n = 0
        for _ in range(3):
            t0 = time.time()
            n = fn()
            times.append(time.time() - t0)
        results[name] = {"sec": round(min(times), 3), "n_triples": n,
                         "runs": [round(t, 3) for t in times]}
    results["speedup"] = round(
        results["strings"]["sec"] / results["ids"]["sec"], 3
    )
    results["cpus"] = cpus
    results["n_docs"] = n_docs
    print(results)
    spark.stop()


if __name__ == "__main__":
    main()
