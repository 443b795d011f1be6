"""Stateful streaming as-of enrichment: latest-value join over a stream.

The batch engine's ``operators.temporal.asof_join`` has no direct streaming
equivalent — Structured Streaming forbids window functions on streams — so
the streaming form is a custom stateful operator (``applyInPandasWithState``,
the same extension point as ``streaming.stateful.dedup_stream``):

* LEFT (to enrich) and RIGHT (reference values) streams are tagged and
  UNIONED into one stream grouped by key — the only way to co-process two
  streams in one ``GroupState``;
* per key, the state holds the latest right row seen so far (by EVENT time
  — a late right row older than the stored one never regresses the state);
* within a micro-batch, rows are processed in (event-time, right-first)
  order, so the enrichment is the exact backward as-of for all data inside
  the batch (same ``>=`` same-instant rule as the batch operator);
* across micro-batches the semantics are as-of over ARRIVAL order: a left
  row that arrives before its matching right row (cross-batch event-time
  reordering) sees the older state.  This is the standard streaming
  trade — exact under in-order arrival, parity-tested against the batch
  ``asof_join`` in that regime — and why the batch operator remains the
  backfill tool.
* processing-time timeout expires idle keys, bounding the state store.

Concrete schema: the driver events shape (user_id keys, long ids, double
values) — the operator is a template for payload-specific variants, the
same stance as ``dedup_stream``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_id", LongType()),
        StructField("r_event_id", LongType()),
        StructField("r_value", DoubleType()),
        StructField("r_ts", TimestampType()),
    ]
)

# latest right row per key: (epoch seconds, event_id, value)
STATE_SCHEMA = StructType(
    [
        StructField("r_epoch", DoubleType()),
        StructField("r_event_id", LongType()),
        StructField("r_value", DoubleType()),
    ]
)

_TIMEOUT_MS = 60 * 60 * 1000


def _enrich_group(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    cur = state.get if state.exists else None  # (epoch, event_id, value)

    pdf = pd.concat(list(batches), ignore_index=True)
    # event-time order, right rows (_tag 0) before left at equal instants —
    # the batch operator's >= same-instant rule.  (zip, not itertuples:
    # namedtuples rename underscore-prefixed columns positionally)
    pdf = pdf.sort_values(["ts", "_tag"], kind="mergesort")
    out = {c.name: [] for c in OUTPUT_SCHEMA.fields}
    for ts_, tag, eid, val in zip(
        pdf["ts"], pdf["_tag"], pdf["event_id"], pdf["value"]
    ):
        if tag == 0:
            epoch = ts_.timestamp()
            if cur is None or epoch >= cur[0]:
                cur = (epoch, int(eid), float(val))
        else:
            out["user_id"].append(key[0])
            out["ts"].append(ts_)
            out["event_id"].append(int(eid))
            out["r_event_id"].append(None if cur is None else cur[1])
            out["r_value"].append(None if cur is None else cur[2])
            out["r_ts"].append(
                None if cur is None else pd.Timestamp(cur[0], unit="s")
            )
    if cur is not None:
        state.update(tuple(cur))
    state.setTimeoutDuration(_TIMEOUT_MS)
    if out["user_id"]:
        yield pd.DataFrame(out)


def latest_value_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """Streaming as-of enrichment: each left row (user_id, ts, event_id)
    picks up the latest right row (user_id, ts, event_id, value) at or
    before it.  Both inputs must be streaming frames with those columns."""
    r = right.select(
        "user_id", "ts", "event_id", "value", F.lit(0).alias("_tag")
    )
    l = left.select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("_tag"),
    )
    return l.unionByName(r).groupBy("user_id").applyInPandasWithState(
        _enrich_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
