"""Bounded retry-with-feedback cascade — the reference's count-reflection
loop (reflect_workflow2.py:96-122) as a DataFrame operator.

The reference re-grounds an entity until the VLM confirms the box count,
caps the retries at 3 (reflect_workflow2.py:99-102), feeds the failure back
into the next prompt as ``reflect_text`` (ImageEntityExtractor.py:165-168),
and routes rows that still fail after the cap to the API fallback backend.

Spark shape: a driver-side loop over a DataFrame of unresolved rows.  Each
pass applies a (batched, deterministic) verifier; converged rows exit via
``filter`` + ``union``; unresolved rows accumulate a feedback-hint column
and try again; after ``max_passes`` the remainder is finalized with
``status='fallback'``.  With a fixed pass cap the composition stays fully
lazy — the whole cascade is ONE Spark job at collect time, no driver-side
convergence actions (the cap, not convergence, bounds the loop, exactly as
in the reference).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HINT_COL = "reflect_hint"
# lineage-truncation cadence for callers exceeding the reference's cap of 3:
# ≤ CHECKPOINT_EVERY passes stay one fully lazy job (no driver-side actions)
CHECKPOINT_EVERY = 4


def bounded_retry(
    df: DataFrame,
    attempt: Callable[[DataFrame, int], DataFrame],
    max_passes: int = 3,
    with_hint: bool = False,
) -> DataFrame:
    """Run ``attempt(pending, pass_no)`` up to ``max_passes`` times.

    ``attempt`` must return its input with a boolean ``resolved`` column —
    the analogue of the reference's per-entity VLM count check
    (reflect_number, ImageEntityExtractor.py:165-168).  Output adds:

    * ``attempts`` — the pass on which the row resolved (or ``max_passes``);
    * ``status``   — 'resolved' | 'fallback' (3rd failure → API re-extract
      in the reference, reflect_workflow2.py:113-122);
    * ``reflect_hint`` (when ``with_hint``) — the accumulated feedback text
      the next pass sees, mirroring the reference's reflect_text prompt
      feedback.

    Plan growth: each pass filters the previous pass's ``attempt`` lineage,
    so the composed plan grows with the pass count (superlinearly if
    ``attempt`` joins).  At the reference's cap of 3 the whole cascade stays
    ONE lazy job; past ``CHECKPOINT_EVERY`` passes the pending slice is
    localCheckpointed to truncate lineage — callers with max_passes ≫ 3 pay
    a materialization every few passes instead of an exponential plan.
    """
    if max_passes < 1:
        raise ValueError("max_passes must be >= 1")
    pending = df
    if with_hint:
        pending = pending.withColumn(HINT_COL, F.lit(""))
    resolved_parts: list[DataFrame] = []
    for pass_no in range(1, max_passes + 1):
        if pass_no > 1 and (pass_no - 1) % CHECKPOINT_EVERY == 0:
            pending = pending.localCheckpoint(eager=True)
        scored = attempt(pending, pass_no)
        # NULL `resolved` (e.g. a verifier comparison over a NULL column)
        # counts as UNRESOLVED: under three-valued logic a bare
        # where(resolved) + where(~resolved) pair drops NULL rows from BOTH
        # branches, silently losing them (same class as the linking.py
        # NULL-name cold-route fix, ADVICE r01)
        ok = F.coalesce(F.col("resolved"), F.lit(False))
        resolved_parts.append(
            scored.where(ok)
            .drop("resolved")
            .withColumn("attempts", F.lit(pass_no))
            .withColumn("status", F.lit("resolved"))
        )
        pending = scored.where(~ok).drop("resolved")
        if with_hint and pass_no < max_passes:
            pending = pending.withColumn(
                HINT_COL,
                F.concat(F.col(HINT_COL), F.lit(f"pass{pass_no}:count_mismatch;")),
            )
    fallback = (
        pending.withColumn("attempts", F.lit(max_passes))
        .withColumn("status", F.lit("fallback"))
    )
    out = fallback
    for part in resolved_parts:
        out = out.unionByName(part)
    return out
