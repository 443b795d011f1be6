"""Streaming CDC snapshot maintenance: the current image of a change log,
kept live by a stateful stream.

Streaming counterpart of ``operators.cdc.latest_snapshot`` (the batch
algebraic ``max(struct)`` route): a change stream ``(key, ts, seq,
payload, op)`` folds into per-key state holding the greatest-``(ts,
seq)`` change, and whenever a micro-batch CHANGES a key's winner the
operator emits the new current image — an upsert/tombstone changelog a
sink can apply idempotently (is_deleted marks keys whose latest change
is a delete, mirroring the batch operator's drop).

Semantics pin: the winner is max by ``(ts, seq)`` with ``seq`` unique —
the IDENTICAL total order as the batch operator, so replaying any
partitioning of the same change log through the stream and taking each
key's LAST emission reproduces ``latest_snapshot`` exactly (including
out-of-order delivery: while a key's state is LIVE — within the
processing-time expiry window below — an older change arriving late
never regresses the state; after expiry the key's (ts, seq) watermark is
forgotten, so a late OLDER change would be accepted as a fresh winner.
Deployments whose change feed can lag past the expiry window must either
raise ``_EXPIRY_MS`` or persist each key's winning (ts, seq) externally
and filter the input against it).  Batch parity is asserted in tests
over multi-micro-batch, shuffled-order replays.

State is one fixed-width tuple per key — O(keys), no history — expired
via processing-time timeout like the other stateful operators
(stateful.py's remove-on-timeout ruling).  Concrete driver-events
schema, the dedup_stream/enrich stance: a template for payload-specific
variants.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("ts", TimestampType()),
        StructField("is_deleted", BooleanType()),
    ]
)

# (ts_us, seq, event_type, value)
STATE_SCHEMA = StructType(
    [
        StructField("ts_us", LongType()),
        StructField("seq", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

_EXPIRY_MS = 60 * 60 * 1000


def _snapshot_group(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    cur = state.get if state.exists else None  # (ts_us, seq, type, value)
    changed = False
    for pdf in batches:
        for ts, seq, etype, val in zip(
            pdf["ts"], pdf["event_id"], pdf["event_type"], pdf["value"]
        ):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            cand = (ts_us, int(seq), str(etype), float(val))
            if cur is None or (cand[0], cand[1]) > (cur[0], cur[1]):
                cur = cand
                changed = True
    if cur is not None:
        state.update(cur)
    state.setTimeoutDuration(_EXPIRY_MS)
    if changed:
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "event_type": [cur[2]],
                "value": [cur[3]],
                "ts": [pd.Timestamp(cur[0] * 1000)],
                "is_deleted": [cur[2] == "error"],
            }
        )


def snapshot_stream(changes: DataFrame) -> DataFrame:
    """Streaming frame (user_id, ts, event_id, event_type, value) →
    per-key current-image changelog ('error' rows are deletes, the
    events_scd2 fixture convention).  Output mode: append — each emission
    is the key's new current image; apply with last-write-wins."""
    return changes.groupBy("user_id").applyInPandasWithState(
        _snapshot_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
