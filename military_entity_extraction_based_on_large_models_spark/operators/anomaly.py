"""Per-group outlier flagging with EXACT integer arithmetic.

The data-quality screen between profiling and training: flag rows whose
value sits ≥ z population standard deviations from their group's mean —
corrupted telemetry, mis-scaled uploads, poisoned metrics.  A float
z-score is the obvious implementation and the wrong one here: variance
via float sums is order-dependent in its last ulps, so rows exactly AT
the boundary flip between partitionings and engines.  Instead the test

    (x − μ)² > z²·σ²          (population σ; STRICT — boundary rows pass)

is multiplied through by n² into its integer form

    (n·x − S)² > z²·(n·Q − S²)

with S = Σx, Q = Σx² over the group — every quantity a BIGINT once
values are quantized (``scale`` units, default centi-units), so the flag
is bit-deterministic at any parallelism and replays exactly in SQL.

Headroom: the per-group SUMS (S, Q, n·x) stay BIGINT — that requires
``n·X² < 2⁶³`` for group size n and quantized magnitude X (a
billion-row group of 3,000-unit values fits).  The COMPARISON terms
(S², lhs²) square those sums past 64 bits long before any realistic
corpus does, so they are computed in DECIMAL(38,0) — exact integer
arithmetic to 38 digits (HUGEINT in the DuckDB twin), good for
``n·X < 10¹⁹``.  No floats anywhere either way.

Scale shape: one partial+final aggregate for the per-group moments, one
equi join back onto the rows (AQE-splittable; the moments frame is
group-dimension-sized).  No window — a hot group costs a map-side
reduction, not a one-reducer sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flag_outliers(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    scale: int = 100,
    z: int = 3,
) -> DataFrame:
    """Append ``x_scaled`` (quantized BIGINT value) and ``is_outlier``.

    The inequality is STRICT — (n·x − S)² > z²·(n·Q − S²) — so
    zero-variance groups (constants, singletons) flag nothing: with
    σ = 0 every row has both sides 0, and 0 ≥ 0 would flag them all.
    A row exactly AT the z boundary is therefore not flagged (the
    conventional strict cut, and the one that stays exact in integers).
    """
    keys = list(key_cols)
    x = F.round(F.col(value_col) * scale).cast("long")
    staged = df.withColumn("_x", x)
    mom = staged.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_s"),
        F.sum(F.col("_x") * F.col("_x")).alias("_q"),
    )
    joined = staged.join(mom, keys)
    dec = "decimal(38,0)"
    n_d = F.col("_n").cast(dec)
    x_d = F.col("_x").cast(dec)
    s_d = F.col("_s").cast(dec)
    q_d = F.col("_q").cast(dec)
    lhs = n_d * x_d - s_d
    rhs = F.lit(int(z * z)).cast(dec) * (n_d * q_d - s_d * s_d)
    flag = lhs * lhs > rhs
    return joined.select(
        *df.columns,
        F.col("_x").alias("x_scaled"),
        flag.alias("is_outlier"),
    )
