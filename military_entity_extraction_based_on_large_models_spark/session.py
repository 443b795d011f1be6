"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point and scaled down by env for the
local[32] sandbox:

* AQE on (runtime coalescing + skew-join splitting) — the skew clause of the
  north rule (hot entity names, mega-repos) is handled by AQE plus explicit
  salting in ``operators.canonicalize``.
* Arrow on for every pandas-UDF stage, with a bounded batch size so automaton
  setup is amortized but executor memory is not blown at wide rows.
* Session timezone pinned to UTC so timestamp results compare exactly against
  the DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mee-kg-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's defaults.

    ``master`` falls back to ``local[$SPARK_GRAFT_CPUS]`` (default 32); pass
    ``master=""`` to defer to an externally-provided master — the
    ``spark-submit`` deployment shape (tools/submit_job.py), where the
    cluster manager URL comes from the submit command, not from code.
    ``shuffle_partitions`` falls back to the local core count — at cluster
    scale you would size this to ~2-3× total executor cores instead.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # bytes are a bad proxy for cost in this engine (per-row automaton /
        # signature work dominates, rows are narrow): stop AQE from merging
        # reduce partitions below the core count just because they're small
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # default skew threshold (256M) never fires on narrow-row graph
        # workloads: the CC loop's giant-star root concentrates ~1M 16-byte
        # rows (~16M) in ONE join partition — a 2 s straggler per round while
        # 15 cores idle.  8M/4M splits it; regular partitions are far smaller
        # than 4M so nothing else changes.
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        # without force, AQE declines the split whenever the join output's
        # partitioning could be reused downstream — in this engine join
        # outputs are re-keyed by the next groupBy anyway, so the trade
        # (possible extra exchange vs a guaranteed straggler) is always right
        .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
