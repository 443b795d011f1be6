"""Change-data-capture materialization: SCD2 history and latest-snapshot.

A 100 TB curation pipeline is incremental in practice — crawls re-visit
URLs, label stores re-emit corrected rows, entity tables upsert.  The two
standard materializations of a change log ``(key, ts, payload, op)`` are

* ``scd2_history`` — the Type-2 slowly-changing-dimension view: one row
  per change with ``[valid_from, valid_to)`` validity, ``valid_to`` open
  on the key's latest non-delete change.  Delete changes CLOSE the
  previous interval (their timestamp becomes its ``valid_to``) and emit
  no interval of their own.
* ``latest_snapshot`` — just the current image: the greatest-``(ts,
  seq)`` change per key, keys whose latest change is a delete dropped.

Scale shape: ``scd2_history`` is ONE shuffle — a single per-key window
whose ``lead`` supplies every interval end (the interval-validity
relation is per-key sequential, like sessionization; see sessions.py for
the skew ruling).  ``latest_snapshot`` deliberately does NOT reuse that
window: it is one algebraic ``max(struct)`` hash aggregate (the
exact_dedup shape — map-side partial ``max`` means a key with millions of
changes reduces inside each map task), because the snapshot is the view a
pipeline refreshes constantly and must not serialize a hot key.  The two
routes are independent implementations of the same semantics;
``test_cdc`` asserts snapshot == history.filter(is_current) exactly.

Determinism: the within-key change order is totalized by ``(ts,
seq_col)`` with ``seq_col`` a caller-supplied unique column (a change log
without a tie-break is not replayable — same ruling as
sessions.sessionize's ``order_cols``).  Timestamps are compared as raw
values (no float hop), so the result is bit-identical at any parallelism
and replays exactly in a windowed-SQL oracle.

Reference anchor: the reference pipeline re-runs extraction over a
growing corpus and keeps only the newest annotation per document
(foundation_workflow.py's overwrite-on-rerun file convention); this
module is that convention as an auditable relational operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    seq_col: str,
    payload_cols: Sequence[str],
    op_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """Type-2 history: ``key_cols + payload_cols + (valid_from, valid_to,
    is_current)``, one row per non-delete change.

    ``valid_from`` is the change's own timestamp; ``valid_to`` the next
    change's (NULL on the last).  ``is_current`` marks the open interval.
    With ``op_col`` set, rows whose op equals ``delete_op`` contribute
    their timestamp as the predecessor's ``valid_to`` but emit no row —
    so a deleted key has no current interval.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(seq_col))
    out = changes.withColumn("_valid_to", F.lead(F.col(ts_col)).over(w))
    if op_col is not None:
        out = out.where(F.col(op_col) != delete_op)
    return out.select(
        *keys,
        *payload_cols,
        F.col(ts_col).alias("valid_from"),
        F.col("_valid_to").alias("valid_to"),
        F.col("_valid_to").isNull().alias("is_current"),
    )


def latest_snapshot(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    seq_col: str,
    payload_cols: Sequence[str],
    op_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """Current image per key: the payload of the greatest ``(ts, seq)``
    change, keys whose latest change is a delete dropped.

    One algebraic ``max(struct(ts, seq, op?, payload...))`` aggregate —
    no window, no second scan; ``seq_col`` uniqueness makes the struct
    max a total order so ties cannot flip the winner.
    """
    keys = list(key_cols)
    fields = [F.col(ts_col), F.col(seq_col)]
    if op_col is not None:
        fields.append(F.col(op_col).alias("_op"))
    fields += [F.col(c) for c in payload_cols]
    agg = changes.groupBy(*keys).agg(
        F.max(F.struct(*fields)).alias("_last")
    )
    if op_col is not None:
        agg = agg.where(F.col("_last._op") != delete_op)
    return agg.select(
        *keys,
        *[F.col(f"_last.{c}").alias(c) for c in payload_cols],
        F.col(f"_last.{ts_col}").alias(ts_col),
    )
