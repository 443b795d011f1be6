"""KG quality audit: per-predicate profile of a triple stream.

Before a constructed KG ships, a pipeline wants the per-relation shape
report: how many assertions, how many are duplicates (the same (s, p, o)
asserted by many documents — provenance-collapsible), how many distinct
subjects/objects, and the hottest subject's fanout (the skew diagnostic
that decides whether downstream per-subject operations need the salted
paths — the graph_degrees ruling, applied at the triple level).

Scale shape: two aggregations — one ``(pred, subj)`` partial+final count
feeding a per-pred max (both algebraic, map-side combined), and one
per-pred profile aggregate whose three COUNT(DISTINCT …) rewrite into a
single Expand + two-phase aggregate (3× row amplification map-side,
never a shuffle per distinct).  No windows, no joins against the triple
stream itself; the final join is pred-dimension-sized.

Reference anchor: the reference inspects its KG only by eyeballing the
output file (foundation_workflow.py writes and moves on); this is that
missing inspection as an auditable operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def predicate_profile(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Per-predicate audit row: ``(pred, n_triples, n_distinct, n_dup,
    n_subjects, n_objects, max_subj_fanout)``.

    ``n_dup`` counts re-assertions of an existing (s, p, o) — exactly the
    rows a provenance-collapsing dedup would fold.  ``max_subj_fanout``
    is the hot-subject diagnostic (a subject appearing in millions of
    triples is the key that serializes a naive per-subject window).
    """
    s, p, o = F.col(subj_col), F.col(pred_col), F.col(obj_col)
    prof = triples.groupBy(p.alias("pred")).agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.count_distinct(F.struct(s, o)).alias("n_distinct"),
        F.count_distinct(s).alias("n_subjects"),
        F.count_distinct(o).alias("n_objects"),
    )
    fan = (
        triples.groupBy(p.alias("pred"), s.alias("_s"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("pred")
        .agg(F.max("_n").alias("max_subj_fanout"))
    )
    return prof.join(fan, "pred").select(
        "pred",
        "n_triples",
        "n_distinct",
        (F.col("n_triples") - F.col("n_distinct")).alias("n_dup"),
        "n_subjects",
        "n_objects",
        "max_subj_fanout",
    )
