"""Gap-based sessionization with per-event session SEQUENCE numbers.

Complement of streaming/events.sessionize (the ``F.session_window``
session-level aggregate): ``session_window`` yields one row per session
and runs under Structured Streaming, but it cannot label the EVENTS —
joining raw events back to their session for per-session feature
extraction needs a per-event, per-key session_seq, which is this
operator.  It is also exactly replayable in a SQL oracle
(``session_window``'s internal merge order is not), which is why this is
the surface the driver's hash gate covers.

Scale shape: ONE shuffle — both window passes (the ``lag`` that detects a
gap and the running sum that numbers sessions) share the same
(partition, order) spec, so they ride the same exchange + sort; the
per-session aggregation that follows is partially aggregated map-side.
Sessionization is inherently per-key sequential (a running session counter
cannot be salted without changing its meaning), so the skew story is the
one documented for as-of joins: per-key event counts are bounded by
retention windows in practice, and a pathological key shows up in
``skew.probe_hot_keys`` before it shows up as a straggler.

Determinism: all gap arithmetic is integer microseconds
(``unix_micros``; the ANSI-safe timestamp hop — see temporal.py), and the
within-key order is totalized by the caller-supplied tie-break columns, so
the session assignment is bit-identical at any parallelism and replays
exactly in the DuckDB oracle (``epoch_us`` + identical window SQL).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    gap_seconds: int = 1800,
    order_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Assign a per-key ``session_seq`` (1-based) to every event: a new
    session starts at the key's first event and whenever the gap since the
    previous event exceeds ``gap_seconds``.

    ``order_cols`` break timestamp ties into a total order — required for
    determinism (equal-ts events would otherwise be assigned
    nondeterministically when a gap boundary falls between them).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    order = [F.col("_ts_us")] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("_ts_us").over(w)
    gap_us = F.lit(int(gap_seconds) * 1_000_000)
    is_new = F.when(
        prev.isNull() | ((F.col("_ts_us") - prev) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        events.withColumn("_ts_us", us)
        .withColumn("session_seq", F.sum(is_new).over(run))
        .drop("_ts_us")
    )


def session_stats(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    gap_seconds: int = 1800,
    order_cols: Sequence[str] = ("event_id",),
    value_col: str | None = "value",
) -> DataFrame:
    """Per-session aggregate view: start/end timestamps, event count,
    integer duration in seconds, and (optionally) the rounded value sum.

    ``duration_s`` is floor((end_us − start_us) / 1e6): the microsecond
    difference is an exact BIGINT and IEEE division by 1e6 is correctly
    rounded, so the floor is bit-identical in any engine.  The value sum is
    rounded (float sums are order-dependent in the last ulp — the
    events_value_delta convention).
    """
    s = sessionize(events, ts_col, key_cols, gap_seconds, order_cols)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.floor(
            (
                F.unix_micros(F.max(ts_col).cast("timestamp"))
                - F.unix_micros(F.min(ts_col).cast("timestamp"))
            )
            / F.lit(1_000_000.0)
        ).alias("duration_s"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias("total_value"))
    return s.groupBy(*key_cols, "session_seq").agg(*aggs)


def session_stats_sql(
    table: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    gap_seconds: int = 1800,
    order_cols: Sequence[str] = ("event_id",),
    value_col: str | None = "value",
) -> str:
    """DuckDB twin of ``session_stats`` — identical window logic over
    ``epoch_us`` so the session assignment replays exactly."""
    keys = ", ".join(key_cols)
    order = ", ".join(["_ts_us", *order_cols])
    gap_us = int(gap_seconds) * 1_000_000
    value_sel = (
        f", round(sum({value_col}), 2) AS total_value" if value_col else ""
    )
    return f"""
        WITH e AS (
          SELECT *, epoch_us({ts_col}) AS _ts_us FROM {table}
        ), marked AS (
          SELECT *,
            CASE
              WHEN lag(_ts_us) OVER w IS NULL THEN 1
              WHEN _ts_us - lag(_ts_us) OVER w > {gap_us} THEN 1
              ELSE 0
            END AS _is_new
          FROM e
          WINDOW w AS (PARTITION BY {keys} ORDER BY {order})
        ), numbered AS (
          SELECT *,
            sum(_is_new) OVER (
              PARTITION BY {keys} ORDER BY {order}
              ROWS UNBOUNDED PRECEDING
            ) AS session_seq
          FROM marked
        )
        SELECT {keys}, session_seq,
               min({ts_col}) AS session_start,
               max({ts_col}) AS session_end,
               count(*) AS n_events,
               cast(floor((max(_ts_us) - min(_ts_us)) / 1000000.0) AS bigint)
                 AS duration_s{value_sel}
        FROM numbered
        GROUP BY {keys}, session_seq
    """
