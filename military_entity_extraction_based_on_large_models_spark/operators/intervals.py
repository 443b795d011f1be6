"""Interval union (gaps-and-islands): merge overlapping per-key intervals
and report coverage.

The temporal-set complement of the repo's other time operators: range_join
asks "which points fall inside intervals", sessionize asks "where do gaps
split a point stream", this asks "what is the union of the intervals
themselves" — machine uptime from overlapping leases, entity validity
windows from overlapping assertions, total covered time per key.

Classic gaps-and-islands, made deterministic and scale-shaped:

* all comparisons in INTEGER MICROSECONDS (``unix_micros`` — the
  temporal.py ANSI-safe ruling; no float epochs, no engine-divergent
  casts);
* within-key total order = (start, end, tie-break cols) so equal starts
  merge identically at any parallelism and in the SQL twin;
* an interval is an island start iff its start exceeds the RUNNING MAX
  of all previous ends (max, not lag — an early long interval can cover
  several later short ones; comparing against only the previous row's
  end re-splits covered intervals, the classic gaps-and-islands bug);
* touching intervals (next.start == prev.end) MERGE — [a,b) ∪ [b,c) is
  contiguous coverage.

Scale shape: one per-key window (running max + running island-id sum
share the same sort) and one (key, island) partial+final aggregate — two
exchanges, no join, no collect.  Per-key sequential like sessionize; the
skew ruling there applies.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    intervals: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    start_col: str = "start",
    end_col: str = "end",
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Union of per-key intervals → one row per merged island:
    ``key_cols + (island, start, end, n_intervals, covered_us)``.

    ``island`` is the 1-based index of the merged run within its key;
    ``covered_us`` the island's length in integer microseconds.  Inputs
    may overlap, nest, or touch; degenerate (start == end) intervals
    merge into whatever covers them and contribute zero length alone.
    """
    keys = list(key_cols)
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    staged = intervals.select(
        *keys, s_us.alias("_s"), e_us.alias("_e"),
        *[F.col(c) for c in order_cols],
    )
    order = [F.col("_s"), F.col("_e")] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_max_end = F.max("_e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_max_end.isNull() | (F.col("_s") > prev_max_end), F.lit(1)
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = staged.withColumn("island", F.sum(is_new).over(run))
    return (
        marked.groupBy(*keys, "island")
        .agg(
            F.min("_s").alias("_is"),
            F.max("_e").alias("_ie"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .select(
            *keys,
            "island",
            F.timestamp_micros(F.col("_is")).alias("start"),
            F.timestamp_micros(F.col("_ie")).alias("end"),
            "n_intervals",
            (F.col("_ie") - F.col("_is")).alias("covered_us"),
        )
    )


def coverage_stats(
    intervals: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    start_col: str = "start",
    end_col: str = "end",
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-key rollup of the merged islands: total covered microseconds,
    island count, interval count — one more algebraic aggregate on top of
    :func:`merge_intervals`."""
    keys = list(key_cols)
    return (
        merge_intervals(intervals, keys, start_col, end_col, order_cols)
        .groupBy(*keys)
        .agg(
            F.sum("covered_us").alias("covered_us"),
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("n_intervals").alias("n_intervals"),
        )
    )
