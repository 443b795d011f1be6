"""Association strength (PMI) for co-occurrence edges.

The reference materializes raw ``co_occurs_with`` pairs (co-occurrence in
the same document — triples.py cites the exact lines) and leaves every
edge equally credible.  At corpus scale that is noise: two entities that
each appear in half the corpus co-occur constantly by chance.  Pointwise
mutual information — the standard corpus-linguistics association measure
(Church & Hanks 1990) — weights each edge by how much MORE often the pair
co-occurs than independence predicts:

    pmi(a, b) = ln( c_ab · N / (c_a · c_b) )

with all four counts DISTINCT-DOCUMENT counts over the same pair universe.

Scale shape: one pair aggregate (groupBy(subj, obj)), one entity marginal
aggregate (union of both roles → distinct (entity, doc) → count), and the
corpus total N joined as a ONE-ROW broadcast frame (never a driver-side
``.count()`` action — the scalar stays in the plan).  The marginal table
is entity-cardinality-sized, so its joins are plain shuffle equi-joins
that AQE demotes to broadcasts when entities are few.

Determinism: everything up to the ln is exact BIGINT arithmetic; the ratio
is one correctly-rounded IEEE division, and the single ln is rounded to
6 dp on both engines — the doc_bm25 convention (>1000 ulps of slack
between any plausible libm divergence and the rounding boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pmi_edge_weights(
    pairs: DataFrame,
    subj_col: str = "subj",
    obj_col: str = "obj",
    doc_col: str = "doc_id",
    materialize: bool = True,
) -> DataFrame:
    """``pairs`` holds co-occurrence observations (subj, obj, doc); the
    operator distincts them itself.  → (subj, obj, c_ab, c_a, c_b, pmi),
    pmi rounded to 6 dp.

    The distinct pair set feeds FOUR aggregates (pair counts, both
    marginal roles, the corpus total), so by default it is pinned with a
    lazy ``localCheckpoint`` — without it every aggregate re-runs the
    whole upstream pipeline (here: the mention extraction), a 4× waste
    that only grows with the input.  ``materialize=False`` keeps the plan
    fully lazy for callers that already persisted their pairs."""
    p = pairs.select(subj_col, obj_col, doc_col).distinct()
    if materialize:
        p = p.localCheckpoint(eager=False)
    c_ab = p.groupBy(subj_col, obj_col).agg(F.count(F.lit(1)).alias("c_ab"))
    ent_docs = (
        p.select(F.col(subj_col).alias("_e"), doc_col)
        .unionByName(p.select(F.col(obj_col).alias("_e"), doc_col))
        .distinct()
    )
    marginals = ent_docs.groupBy("_e").agg(F.count(F.lit(1)).alias("_c_e"))
    n_docs = p.select(doc_col).distinct().agg(
        F.count(F.lit(1)).alias("_n_docs")
    )
    return (
        c_ab.join(
            marginals.select(
                F.col("_e").alias(subj_col), F.col("_c_e").alias("c_a")
            ),
            subj_col,
        )
        .join(
            marginals.select(
                F.col("_e").alias(obj_col), F.col("_c_e").alias("c_b")
            ),
            obj_col,
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            subj_col,
            obj_col,
            "c_ab",
            "c_a",
            "c_b",
            F.round(
                F.log(
                    (F.col("c_ab") * F.col("_n_docs")).cast("double")
                    / (F.col("c_a") * F.col("c_b")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )


def pmi_sql(
    pairs_sql: str,
    subj_col: str = "subj",
    obj_col: str = "obj",
    doc_col: str = "doc_id",
) -> str:
    """DuckDB twin: identical integer counts, one division, ln rounded to
    6 dp.  ``pairs_sql`` is any SELECT producing (subj, obj, doc)."""
    s, o, d = subj_col, obj_col, doc_col
    return f"""
        WITH p AS (
          SELECT DISTINCT {s}, {o}, {d} FROM ({pairs_sql}) raw_pairs
        ), cab AS (
          SELECT {s}, {o}, count(*) AS c_ab FROM p GROUP BY {s}, {o}
        ), ent AS (
          SELECT DISTINCT _e, {d} FROM (
            SELECT {s} AS _e, {d} FROM p
            UNION ALL
            SELECT {o} AS _e, {d} FROM p
          ) roles
        ), marg AS (
          SELECT _e, count(*) AS _c_e FROM ent GROUP BY _e
        ), nd AS (
          SELECT count(DISTINCT {d}) AS _n_docs FROM p
        )
        SELECT cab.{s}, cab.{o}, cab.c_ab,
               ma._c_e AS c_a, mb._c_e AS c_b,
               round(
                 ln(cast(cab.c_ab * nd._n_docs AS double)
                    / cast(ma._c_e * mb._c_e AS double)),
                 6
               ) AS pmi
        FROM cab
        JOIN marg ma ON ma._e = cab.{s}
        JOIN marg mb ON mb._e = cab.{o}
        CROSS JOIN nd
    """
