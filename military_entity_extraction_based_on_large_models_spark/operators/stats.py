"""Corpus statistics: exact quantiles over discrete domains.

``percentile_approx`` is Spark's sketch; curation THRESHOLDS (length
cutoffs, quality floors) often need exact, reproducible quantiles — and a
full sort at corpus scale is the wrong price.  For a discrete / bounded
domain (token counts, byte lengths, bucketed scores) the histogram method
is exact and cheap:

1. ``groupBy(value).count()`` — ONE shuffle, algebraic, map-side combined;
   the frame shrinks to |distinct values| rows;
2. a cumulative sum over that tiny frame (single-partition window — fine
   BY CONSTRUCTION: the whole point is that the domain is small; bucket
   continuous values first);
3. quantile q_k = the smallest value whose cumulative count reaches
   ceil(k·n/100) — the inverted-CDF (type-1) definition, tested as the
   pure-integer comparison ``cum·100 >= k·n`` so every engine lands the
   same side of the boundary (a float multiply can straddle the ceil).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_discrete_quantiles(
    df: DataFrame, col: str, percents: Sequence[int] = (25, 50, 75, 95)
) -> DataFrame:
    """One row: ``p{k}`` = exact k-th percentile of ``col`` (type-1 /
    inverted-CDF, integer percents only) plus ``n`` — empty input yields
    zero rows.  See module docstring for the scale argument."""
    for k in percents:
        if not (isinstance(k, int) and 0 < k <= 100):
            raise ValueError(f"percents must be integers in (0, 100], got {k!r}")
    counts = df.groupBy(F.col(col).alias("_v")).agg(F.count(F.lit(1)).alias("_c"))
    w_cum = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = counts.select(
        "_v",
        F.sum("_c").over(w_cum).alias("_cum"),
        F.sum("_c").over(w_all).alias("_n"),
    )
    # cum >= ceil(k*n/100) for integer cum is exactly cum*100 >= k*n — a
    # pure integer comparison, so every engine lands the same side of the
    # boundary (a float multiply can straddle the ceil)
    aggs = [
        F.min(
            F.when(
                F.col("_cum") * 100 >= F.lit(k) * F.col("_n"), F.col("_v")
            )
        ).alias(f"p{k}")
        for k in percents
    ]
    return cum.groupBy().agg(*aggs, F.max("_n").alias("n")).where(
        F.col("n").isNotNull()
    )
