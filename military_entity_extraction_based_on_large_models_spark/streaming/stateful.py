"""Custom stateful streaming operator: watermark-bounded stream dedup.

The reference has no streaming surface (SURVEY.md §2.8); this operator exists
because a 100 TB ingestion pipeline tails an event/document stream and must
drop replayed records exactly-once-ish.  Built on
``applyInPandasWithState`` (Arrow-batched per-group state — the
Structured Streaming extension point for custom stateful logic):

* groups by a configurable key (default ``user_id``),
* keeps the set of seen dedup ids per group in ``GroupState``,
* emits only first-seen rows,
* expires group state via processing-time timeout so state is bounded.

Works only on streaming frames (``applyInPandasWithState`` requirement);
the batch-parity equivalent is ``dropDuplicates`` — asserted in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("seen", ArrayType(LongType()))])


def _dedup_group(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # expiry invocation (empty batch iterator): FREE the state.  Without
        # this branch the timeout callback re-armed the state below, so no
        # group ever expired and the store grew without bound (r3 review).
        state.remove()
        return
    seen: set[int] = set(state.get[0]) if state.exists else set()
    fresh: list[int] = []
    for pdf in batches:
        for eid in pdf["event_id"]:
            eid = int(eid)
            if eid not in seen:
                seen.add(eid)
                fresh.append(eid)
    state.update((list(seen),))
    state.setTimeoutDuration(60 * 60 * 1000)  # 1h processing-time expiry
    if fresh:
        yield pd.DataFrame({"user_id": [key[0]] * len(fresh), "event_id": fresh})


def dedup_stream(events: DataFrame) -> DataFrame:
    """Streaming frame (user_id, event_id, ...) → first-seen rows only.

    State per user is the seen-id set; duplicate event_ids across micro-
    batches are dropped.  Output mode: append.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
