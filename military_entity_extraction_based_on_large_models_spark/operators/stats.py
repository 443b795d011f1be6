"""Corpus statistics: exact quantiles over discrete domains, and a
DETERMINISTIC HyperLogLog distinct-count sketch.

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

``hll_ndv`` is the other standard corpus statistic at 100 TB: distinct
counts where exact counting shuffles every distinct value.  HyperLogLog
(Flajolet, Fusy, Gandouet & Meunier 2007) as pure DataFrame expressions:

* register index = top ``p`` bits / rank = leading-zero count of the next
  52 bits of an md5-derived hash — md5 because BOTH engines have it, so
  (unlike Spark's ``approx_count_distinct``, whose sketch is opaque and
  engine-private) the whole estimate is DETERMINISTIC and the DuckDB
  oracle reproduces it bit-for-bit; the rank uses the ``bin()``
  string-length trick (``53 − len(bin(v))``) — pure integer ops, no
  float log2 whose boundary behavior could differ;
* one ``groupBy(keys, register).max(rank)`` — algebraic, map-side
  combined, the register frame is ≤ m rows per key group: the sketch IS
  the aggregate state, mergeable by construction;
* the harmonic sum is accumulated as exact integers (``2^(52−rank)``
  summed as DECIMAL — a double sum of 4096 powers of two is
  order-DEPENDENT in its last ulp, which would break cross-engine
  determinism) and divided once at the end; the small-range linear
  correction applies below 2.5·m exactly as published.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
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


HLL_P = 12                 # 2^12 = 4096 registers, ~1.6% standard error
_HLL_M = 1 << HLL_P
_HLL_VBITS = 52            # rank bits: 13 hex digits of the md5 digest
# alpha_m for m >= 128 (Flajolet et al. 2007, fig. 3)
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)


def hll_register_cols(value: Column) -> tuple[Column, Column]:
    """(register index, rank) for one value — the sketch's per-row map step.

    Hash = md5 of the value's string form (cross-engine); index = first 3
    hex digits (12 bits), rank = 53 − bit_length(next 13 hex digits), with
    the all-zero suffix ranking 53.  ``conv`` parses hex; ``bin`` gives the
    bit length as a string length (both functions exist and agree in Spark
    and DuckDB)."""
    h = F.md5(value.cast("string"))
    idx = F.conv(F.substring(h, 1, 3), 16, 10).cast("int")
    v = F.conv(F.substring(h, 4, 13), 16, 10).cast("long")
    rank = F.when(v == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(v))
    ).cast("int")
    return idx, rank


def hll_ndv(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    est_col: str = "ndv_hll",
) -> DataFrame:
    """Per-``keys`` HyperLogLog distinct-count estimate of ``value``.

    Two algebraic aggregations (registers, then per-key fold) — never a
    per-key distinct-value shuffle; the register frame is ≤ 4096 rows per
    key.  Deterministic: same input SET → same estimate, any partitioning,
    any engine (see module doc).  NULL values are ignored (COUNT DISTINCT
    semantics)."""
    idx, rank = hll_register_cols(F.col(value))
    regs = (
        df.where(F.col(value).isNotNull())
        .select(*keys, idx.alias("_ri"), rank.alias("_rk"))
        .groupBy(*keys, "_ri")
        .agg(F.max("_rk").alias("_r"))
    )
    # exact harmonic sum: term = 2^(52 - rank) as integers, summed as
    # DECIMAL (no float-order dependence); empty registers contribute 2^52
    term = F.pow(F.lit(2.0), F.lit(52) - F.col("_r")).cast("decimal(20,0)")
    per_key = regs.groupBy(*keys).agg(
        F.sum(term).cast("decimal(38,0)").alias("_zs"),
        F.count(F.lit(1)).alias("_nreg"),
    )
    m = F.lit(float(_HLL_M))
    z_scaled = F.col("_zs").cast("double") + (
        (F.lit(_HLL_M) - F.col("_nreg")).cast("double") * F.lit(float(1 << 52))
    )
    raw = F.lit(_HLL_ALPHA) * m * m / (z_scaled / F.lit(float(1 << 52)))
    zeros = (F.lit(_HLL_M) - F.col("_nreg")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5) * m) & (zeros > 0),
        m * F.log(m / zeros),
    ).otherwise(raw)
    return per_key.select(*keys, F.round(est, 2).alias(est_col))


def hll_ndv_sql(
    relation: str, keys: Sequence[str], value: str, est_col: str = "ndv_hll"
) -> str:
    """The EXACT DuckDB twin of ``hll_ndv`` (generated, like learn.logreg_sql,
    so the two engines cannot drift).  ``value`` must be the expression's
    SQL string form; keys may be empty for a global count."""
    key_sql = ", ".join(keys)
    key_sel = (key_sql + ", ") if keys else ""
    key_grp = f"GROUP BY {key_sql}" if keys else ""
    # DuckDB types plain decimal literals as DECIMAL (whose arithmetic
    # overflows and rounds differently than the Spark doubles); a
    # string→DOUBLE cast is a correctly-rounded parse of Python's
    # round-trip repr — bit-identical constants in both engines
    def _d(x: float) -> str:
        return f"CAST('{x!r}' AS DOUBLE)"

    alpha, m, scale = _d(_HLL_ALPHA), _d(float(_HLL_M)), _d(float(1 << 52))
    raw = (
        f"({alpha} * {m} * {m} / "
        f"((zs + ({m} - nreg) * {scale}) / {scale}))"
    )
    return f"""
        WITH hx AS (
          SELECT {key_sel}md5(CAST({value} AS VARCHAR)) AS h
          FROM {relation} WHERE {value} IS NOT NULL
        ), rr AS (
          SELECT {key_sel}
                 CAST('0x' || substring(h, 1, 3) AS BIGINT) AS _ri,
                 CASE WHEN CAST('0x' || substring(h, 4, 13) AS BIGINT) = 0 THEN 53
                      ELSE 53 - length(bin(CAST('0x' || substring(h, 4, 13) AS BIGINT))) END AS _rk
          FROM hx
        ), regs AS (
          SELECT {key_sel}_ri, max(_rk) AS _r
          FROM rr GROUP BY {key_sel}_ri
        ), pk AS (
          SELECT {key_sel}
                 CAST(sum(CAST(2 ** (52 - _r) AS HUGEINT)) AS DOUBLE) AS zs,
                 count(*) AS nreg
          FROM regs {key_grp}
        )
        SELECT {key_sel}
               round(CASE WHEN {raw} <= 2.5 * {m} AND ({m} - nreg) > 0
                     THEN {m} * ln({m} / ({m} - nreg))
                     ELSE {raw}
                     END, 2) AS {est_col}
        FROM pk
    """


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): fixed-size frequency
# estimation.  The third standard corpus sketch beside quantile histograms
# and HLL: estimate per-item counts from depth × width BIGINT counters —
# state is O(d·w) REGARDLESS of input size, mergeable by addition, so at
# 100 TB the sketch build is one map-side-combined aggregate producing at
# most d·w rows, and estimation broadcasts the finished sketch.  Estimates
# NEVER undercount (each counter is a superset sum); overcounts are bounded
# by 2n/w per row with prob. 1 − 2^−d.  Hashing is the md5 device with a
# per-row salt, so sketch AND estimates are bit-reproducible in DuckDB.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 512


def cms_bucket(value: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Row ``row``'s bucket for one value: md5('cms{row}:' || v) 52-bit
    integer mod width — independent-enough hash rows via the salt."""
    h = F.md5(F.concat(F.lit(f"cms{row}:"), value.cast("string")))
    return (F.conv(F.substring(h, 4, 13), 16, 10).cast("long") % width).cast(
        "int"
    )


def _cms_pairs(value: Column, depth: int, width: int) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row"), cms_bucket(value, j, width).alias("bucket")
            )
            for j in range(depth)
        ]
    )


def cms_sketch(
    df: DataFrame,
    value: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """→ (row, bucket, c) counters, ≤ depth·width rows.  ONE scan (the
    per-row explode builds all depth pairs inside the row), one algebraic
    aggregate.  NULLs are ignored."""
    return (
        df.where(F.col(value).isNotNull())
        .select(F.explode(_cms_pairs(F.col(value), depth, width)).alias("p"))
        .groupBy(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    value: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    est_col: str = "est",
) -> DataFrame:
    """Append ``est_col`` = min over rows of the value's counters (0 for a
    never-seen bucket).  The sketch is broadcast — it is at most
    depth·width rows by construction, the whole point of the structure."""
    keyed = candidates.select(
        "*", F.explode(_cms_pairs(F.col(value), depth, width)).alias("p")
    ).select("*", F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
    joined = keyed.join(F.broadcast(sketch), ["row", "bucket"], "left")
    others = [c for c in candidates.columns]
    return (
        joined.groupBy(*others)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias(est_col))
    )
