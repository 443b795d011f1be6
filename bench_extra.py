"""Noop-sink stage isolation for the headline queries (guide §1.4).

NOT the driver bench — bench.py is frozen for measurement.  This harness
times individual stages of the expensive headline queries with the noop
sink so the computation is measured without the count()-side pruning or
the sink, and dumps .explain("formatted") for each query to
plans/r07/<name>_{before,after}.txt.

Usage:
    python bench_extra.py [--explain-dir plans/r07 --suffix before]
    python bench_extra.py --stages            # per-stage noop timings
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "kg_pipeline",
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


def get_session():
    from military_entity_extraction_based_on_large_models_spark.session import (
        get_spark,
    )

    spark = get_spark(
        app_name="mee-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def headline_df(spark, name):
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

    if name == "kg_pipeline":
        docs = read_driver_documents(spark, SF_DIR)
        return kg_pipeline(docs, VOCAB_GAZETTEER, context_terms={})
    queries = entrymod.queries()
    queries.update(entrymod.retired_queries())
    return queries[name](spark, SF_DIR)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, reps=3):
    # one cold + median of warm reps
    t0 = time.time()
    fn()
    cold = time.time() - t0
    ws = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ws.append(time.time() - t0)
    warm = sorted(ws)[len(ws) // 2]
    print(f"{label:55s} cold={cold:7.3f}  warm={warm:7.3f}")
    return cold, warm


def dump_plans(spark, outdir, suffix):
    os.makedirs(outdir, exist_ok=True)
    for name in HEADLINE:
        df = headline_df(spark, name)
        p = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(p)
        print("wrote", path)


def stage_timings(spark):
    from pyspark.sql import functions as F

    from military_entity_extraction_based_on_large_models_spark.functions import (
        text as T,
    )
    from military_entity_extraction_based_on_large_models_spark.operators import (
        dedup,
    )
    from military_entity_extraction_based_on_large_models_spark.plans.parallelism import (
        scale_out,
    )

    sc = spark.sparkContext

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    sc.setJobDescription("minhash: shingles only")
    sh = scale_out(docs.select(F.col("doc_id").alias("id"), F.col("text").alias("_t"))).select(
        "id", T.shingles(F.col("_t"), 3).alias("sh")
    )
    timed("minhash/shingles", lambda: noop(sh))

    sc.setJobDescription("minhash: shingle hashes")
    hv = scale_out(docs.select(F.col("doc_id").alias("id"), F.col("text").alias("_t"))).select(
        "id",
        F.transform(T.shingles(F.col("_t"), 3), lambda s: F.xxhash64(s)).alias("hv"),
    )
    timed("minhash/shingle-hashes", lambda: noop(hv))

    sc.setJobDescription("minhash: banded (signature+buckets)")
    narrow = scale_out(docs.select(F.col("doc_id").alias("id"), F.col("text").alias("_t")))
    bands = dedup.minhash_band_buckets(T.shingles(F.col("_t"), 3), 32, 4)
    banded = narrow.select("id", F.posexplode(bands).alias("band", "bucket"))
    timed("minhash/banded", lambda: noop(banded))

    sc.setJobDescription("minhash: full pairs")
    pairs = dedup.pairs_from_buckets(banded)
    timed("minhash/pairs_from_buckets", lambda: noop(pairs))
    print("pair count:", pairs.count())

    sc.setJobDescription("q3: full")
    q3 = headline_df(spark, "q3_top_revenue_orders")
    timed("q3/full-noop", lambda: noop(q3))

    sc.setJobDescription("q3: li scan+join-cols only")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    timed("q3/lineitem-3col-scan", lambda: noop(li))

    sc.setJobDescription("q1: full")
    q1 = headline_df(spark, "q1_pricing_summary")
    timed("q1/full-noop", lambda: noop(q1))

    sc.setJobDescription("ann: full")
    ann = headline_df(spark, "ann_bruteforce")
    timed("ann/full-noop", lambda: noop(ann))

    sc.setJobDescription("kg: full")
    kg = headline_df(spark, "kg_pipeline")
    timed("kg/full-noop", lambda: noop(kg))

    sc.setJobDescription("events_user_sessions: full")
    ev = headline_df(spark, "events_user_sessions")
    timed("events_user_sessions/full-noop", lambda: noop(ev))

    sc.setJobDescription("outer_join_order_counts: full")
    oj = headline_df(spark, "outer_join_order_counts")
    timed("outer_join/full-noop", lambda: noop(oj))

    sc.setJobDescription("window_top_customer: full")
    wt = headline_df(spark, "window_top_customer_per_nation")
    timed("window_top/full-noop", lambda: noop(wt))

    sc.setJobDescription(None)


def main():
    spark = get_session()
    if "--stages" in sys.argv:
        stage_timings(spark)
    else:
        suffix = "before"
        outdir = "plans/r07"
        if "--suffix" in sys.argv:
            suffix = sys.argv[sys.argv.index("--suffix") + 1]
        if "--explain-dir" in sys.argv:
            outdir = sys.argv[sys.argv.index("--explain-dir") + 1]
        dump_plans(spark, outdir, suffix)
    spark.stop()


if __name__ == "__main__":
    main()
