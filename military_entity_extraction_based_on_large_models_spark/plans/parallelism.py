"""Parallelism guard for compute-bound stages.

Spark sizes scan partitions by BYTES (maxPartitionBytes), which is right for
I/O-bound plans but wrong for CPU-heavy per-row stages (automaton matching,
32-way minhash, simhash bit votes): a few-MB parquet file arrives as ONE
split and the whole stage runs on one core.  ``scale_out`` repartitions up to
the cluster's default parallelism only when the input has fewer partitions —
at 100 TB inputs already carry thousands of splits and this is a no-op, so
no extra shuffle is introduced where it doesn't pay for itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scale_out(df: DataFrame, multiple: int = 1) -> DataFrame:
    """Repartition df up to defaultParallelism × multiple if it currently has
    fewer partitions; otherwise return it unchanged."""
    target = df.sparkSession.sparkContext.defaultParallelism * multiple
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
