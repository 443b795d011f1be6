"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "docs_per_sec": ..., "triples_per_sec": ...}

The headline metric is total wall time of the query set measured COLD
(first execution, codegen/JIT included — comparable with rounds <= 3);
"warm_total_sec"/"queries_warm" report the median of 3 warm repeats per
query, the steady-state figure comparable across rounds.

Variance protocol (r5 verdict finding #1: single-run cold on this shared
host spread 66% between two runs of identical code): the DEFAULT
invocation now runs the whole cold+warm measurement in
$SPARK_GRAFT_BENCH_RUNS (default 3) FRESH JVMs — cold is genuinely cold
in each — and reports the per-query MEDIAN across runs for both regimes,
plus every run's totals and the host load average, so round-over-round
driver comparisons are robust to noisy neighbors and auditable when they
are not.  `--one` runs the single-JVM measurement (what each subprocess
executes).

Throughput figures (docs/sec, triples/sec for the KG pipeline) and the
two-parallelism scaling run live in BENCH.md — run
`python bench.py --scaling` to produce both levels (local[4] vs local[16])
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
    warm_timings: dict[str, float] = {}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_triples = 0

    # retired driver entries (correctness-registry cap) remain benchable
    queries.update(entrymod.retired_queries())

    def run_one(name: str) -> int:
        if name == "kg_pipeline":
            docs = read_driver_documents(spark, sf_dir)
            return kg_pipeline(docs, VOCAB_GAZETTEER, context_terms={}).count()
        return queries[name](spark, sf_dir).count()

    # cold once (first-plan codegen/JIT included), then median of 3 warm runs:
    # cold deltas across rounds are mostly codegen noise (~4-6 s of an ~11 s
    # headline); the warm figure is the steady-state signal comparable across
    # rounds (r3 verdict nit #3)
    for name in HEADLINE:
        t0 = time.time()
        n = run_one(name)
        if name == "kg_pipeline":
            n_triples = n
        timings[name] = round(time.time() - t0, 3)
        wt = []
        for _ in range(3):
            t0 = time.time()
            run_one(name)
            wt.append(time.time() - t0)
        warm_timings[name] = round(sorted(wt)[1], 3)

    total = round(sum(timings.values()), 3)
    warm_total = round(sum(warm_timings.values()), 3)
    kg_sec = timings["kg_pipeline"]
    kg_warm = warm_timings["kg_pipeline"]
    result = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "warm_total_sec": warm_total,
        "queries_warm": warm_timings,
        "sf": sf_dir,
        "cpus": cpus,
        "n_docs": n_docs,
        "n_triples": n_triples,
        "docs_per_sec": round(n_docs / kg_sec, 1) if kg_sec else None,
        "triples_per_sec": round(n_triples / kg_sec, 1) if kg_sec else None,
        "docs_per_sec_warm": round(n_docs / kg_warm, 1) if kg_warm else None,
        "triples_per_sec_warm": round(n_triples / kg_warm, 1) if kg_warm else None,
    }
    spark.stop()
    return result


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def run_bench_median(sf_dir: str, cpus: int) -> dict:
    """Median-of-N protocol: run the single-JVM measurement (``--one``)
    in N fresh subprocesses — cold timings are genuinely cold in each —
    and take the per-query median across runs for BOTH regimes.  Also
    records each run's totals and the 1-minute load average before and
    after, so a noisy-host round is visible in the artifact itself
    instead of needing forensics (r5 verdict finding #1)."""
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    load_before = round(os.getloadavg()[0], 2)
    runs: list[dict] = []
    for _ in range(n_runs):
        out = subprocess.run(
            [sys.executable, __file__, "--one"],
            env=dict(os.environ),
            capture_output=True,
            text=True,
            check=True,
        )
        runs.append(json.loads(out.stdout.strip().splitlines()[-1]))
    load_after = round(os.getloadavg()[0], 2)

    names = list(runs[0]["queries"])
    queries = {
        q: round(_median([r["queries"][q] for r in runs]), 3) for q in names
    }
    queries_warm = {
        q: round(_median([r["queries_warm"][q] for r in runs]), 3)
        for q in names
    }
    total = round(sum(queries.values()), 3)
    warm_total = round(sum(queries_warm.values()), 3)
    n_docs = runs[0]["n_docs"]
    n_triples = runs[0]["n_triples"]
    kg_sec, kg_warm = queries["kg_pipeline"], queries_warm["kg_pipeline"]
    return {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "protocol": f"per-query median over {n_runs} fresh-JVM runs",
        "queries": queries,
        "warm_total_sec": warm_total,
        "queries_warm": queries_warm,
        "runs_total_sec": [r["value"] for r in runs],
        "runs_warm_total_sec": [r["warm_total_sec"] for r in runs],
        "loadavg_1m": {"before": load_before, "after": load_after},
        "sf": sf_dir,
        "cpus": cpus,
        "n_docs": n_docs,
        "n_triples": n_triples,
        "docs_per_sec": round(n_docs / kg_sec, 1) if kg_sec else None,
        "triples_per_sec": round(n_triples / kg_sec, 1) if kg_sec else None,
        "docs_per_sec_warm": round(n_docs / kg_warm, 1) if kg_warm else None,
        "triples_per_sec_warm": (
            round(n_triples / kg_warm, 1) if kg_warm else None
        ),
    }


def run_scaling_job(sf_dir: str, cpus: int, replicate: int) -> dict:
    """KG pipeline throughput on a compute-bound input: the sf documents
    replicated ``replicate``× (identical input at every parallelism level —
    each copy gets a distinct path so no two rows collapse).  This is the
    north-rule scaling evidence: the per-doc extraction work dominates, so
    wall time reflects cores, not fixed stage overhead."""
    from pyspark.sql import functions as F

    from military_entity_extraction_based_on_large_models_spark.plans.pipeline import (
        kg_pipeline,
    )
    from military_entity_extraction_based_on_large_models_spark.session import (
        get_spark,
    )
    from military_entity_extraction_based_on_large_models_spark.sources.documents import (
        read_driver_documents,
        with_doc_sha,
    )
    from military_entity_extraction_based_on_large_models_spark.sources.gazetteer import (
        VOCAB_GAZETTEER,
    )

    spark = get_spark(app_name=f"mee-scaling-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # SPARK_GRAFT_SCALING_PATH=arrow measures the mapInArrow extraction stage
    # (the north-rule-mandated path, taken for large/ambiguous dictionaries)
    # on the workload that routes to it: a large corpus-bigram dictionary.
    # Measuring the Arrow stage on the tiny vocab gazetteer is misleading —
    # per-doc work is then so light that the shared input-scan cost masks it
    # at low parallelism and Arrow serialization dominates at high, reading
    # as false scaling loss (observed: same-4-core-time as the JVM path).
    arrow_mode = os.environ.get("SPARK_GRAFT_SCALING_PATH") == "arrow"
    if arrow_mode:
        from military_entity_extraction_based_on_large_models_spark.operators.extract import (
            extract_doc_mentions,
        )
        from military_entity_extraction_based_on_large_models_spark.operators.triples import (
            materialize_triples_from_doc_arrays,
        )

        def pipeline(docs, gaz, context_terms):  # noqa: ARG001
            return materialize_triples_from_doc_arrays(
                extract_doc_mentions(docs, gaz, emit_context=False)
            )
    else:
        pipeline = kg_pipeline

    base = read_driver_documents(spark, sf_dir).drop("doc_sha")
    docs = with_doc_sha(
        base.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))))
        .withColumn("path", F.concat_ws("#", "path", "_r"))
        .withColumn("content", F.concat_ws(" ", "content", F.col("_r").cast("string")))
        .drop("_r")
    )
    # materialize the generated input once, properly partitioned, so the
    # timed section measures the pipeline — not a single-threaded shuffle
    # write out of the 1-split parquet scan
    docs = docs.repartition(2 * cpus).localCheckpoint(eager=True)
    n_docs = docs.count()

    if arrow_mode:
        # heavily-matching corpus-bigram dictionary (shared constructor, no
        # drift): hundreds of aliases, most of which hit, so Python-side
        # matching dominates wall time at every core count
        from tools.bench_extract_dict import build_bigram_gazetteer

        gazetteer = build_bigram_gazetteer(base)
    else:
        gazetteer = VOCAB_GAZETTEER
    # warm-up + MEDIAN-of-N (SPARK_GRAFT_SCALING_RUNS, default 3): excludes
    # JIT/codegen compile and is robust to noisy-neighbor variance on the
    # shared host.  r5 verdict finding #2: best-of-N made the ≥0.8 criterion
    # best-run-dependent; the headline figure is now the median, with every
    # run and the best retained in the artifact so intra-config agreement
    # (and any residual host noise) stays visible.
    n_runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
    pipeline(docs, gazetteer, context_terms={}).count()
    times = []
    n_triples = 0
    for _ in range(n_runs):
        t0 = time.time()
        n_triples = pipeline(docs, gazetteer, context_terms={}).count()
        times.append(time.time() - t0)
    dt = _median(times)
    best = min(times)
    spark.stop()
    return {
        "cpus": cpus,
        "n_docs": n_docs,
        "n_triples": n_triples,
        "sec": round(dt, 3),
        "sec_best": round(best, 3),
        "runs_sec": [round(t, 3) for t in times],
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "docs_per_sec": round(n_docs / dt, 1),
        "triples_per_sec": round(n_triples / dt, 1),
        "docs_per_sec_best": round(n_docs / best, 1),
    }


def main() -> None:
    if "--scaling" in sys.argv:
        # run each level in its own JVM so executor-thread count is honest.
        # Heap sized like a production executor fleet (48g over the box, not
        # the 8g test default): with a small heap, GC pauses scale with core
        # count and asymmetrically tax the high-parallelism level.
        os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
        # arrow mode does ~100× more per-doc work (large dictionary), so its
        # compute-bound regime needs far fewer docs
        default_replicate = (
            "16" if os.environ.get("SPARK_GRAFT_SCALING_PATH") == "arrow" else "256"
        )
        replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", default_replicate))
        levels = tuple(
            int(x) for x in os.environ.get("SPARK_GRAFT_LEVELS", "4,16").split(",")
        )
        results = {}
        have_taskset = subprocess.run(
            ["which", "taskset"], capture_output=True
        ).returncode == 0
        for cpus in levels:
            env = dict(
                os.environ,
                SPARK_GRAFT_CPUS=str(cpus),
                SPARK_GRAFT_REPLICATE=str(replicate),
            )
            cmd = [sys.executable, __file__, "--scaling-one"]
            if have_taskset:
                # pin the process tree to exactly `cpus` CPUs: in local mode
                # GC/shuffle/python-worker threads otherwise spill onto the
                # remaining cores and inflate the low-parallelism level
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            out = subprocess.run(
                cmd, env=env, capture_output=True, text=True, check=True
            )
            results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        lo, hi = levels
        t_lo = results[lo]["docs_per_sec"]
        t_hi = results[hi]["docs_per_sec"]
        factor = hi / lo
        eff = round((t_hi / t_lo) / factor, 3) if t_lo else None
        b_lo = results[lo]["docs_per_sec_best"]
        b_hi = results[hi]["docs_per_sec_best"]
        eff_best = round((b_hi / b_lo) / factor, 3) if b_lo else None
        print(
            json.dumps(
                {
                    "metric": f"scaling_efficiency_{lo}_to_{hi}",
                    "value": eff,
                    "unit": "ratio",
                    "protocol": "median-of-N per level (value); best-of-N"
                                " retained as value_best",
                    "value_best": eff_best,
                    f"docs_per_sec_{lo}": t_lo,
                    f"docs_per_sec_{hi}": t_hi,
                    "detail": results,
                }
            )
        )
        return
    if "--scaling-one" in sys.argv:
        replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "256"))
        print(json.dumps(run_scaling_job(SF_DIR, CPUS, replicate)))
        return
    if "--one" in sys.argv:
        print(json.dumps(run_bench(SF_DIR, CPUS)))
        return
    print(json.dumps(run_bench_median(SF_DIR, CPUS)))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
