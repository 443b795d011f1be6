"""Table profiler: per-column data-quality report in one pass.

The first thing a pipeline runs against a new input drop: null rates,
distinct counts, and value ranges per column, as ONE job — the input
contract check before any operator trusts the data (TESTDATA.md is this
repo's hand-written equivalent; this operator generates it).

Output is LONG format — one row per column, values rendered as strings —
so one fixed schema serves any input table and the report itself is a
joinable/diffable DataFrame (profile today's drop, anti-join against
yesterday's to alert on drift).

Scale shape: a single wide aggregate over one scan.  The distinct counts
rewrite into one Expand + two-phase aggregate (k× map-side row
amplification for k profiled columns — cap the column list, not the row
count, if that ever matters).  Min/max/counts are algebraic.  No
collect: the per-column pivot happens via a plan-side stack() over the
one aggregated row.

Determinism: min/max are computed in the column's native type and
rendered with a plain string cast at the end — casting BEFORE comparing
would order numerics lexicographically ('10' < '9') and is the classic
profiler bug; pinned by test.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """One row per column: ``(column, n_rows, n_nulls, n_distinct,
    min_value, max_value)`` — min/max/distinct over non-null values,
    rendered as strings in the output only."""
    cols = list(columns) if columns is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("_rows")]
    # internal aliases are INDEX-keyed (never derived from the column name),
    # input columns resolve through backtick quoting, and name literals in
    # stack() are quote-escaped, so names containing dots, spaces, quotes,
    # or hyphens profile fine (ADVICE r5)
    for i, c in enumerate(cols):
        col = F.col("`" + c.replace("`", "``") + "`")
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"_nn_{i}"),
            F.count_distinct(col).alias(f"_nd_{i}"),
            F.min(col).cast("string").alias(f"_mn_{i}"),
            F.max(col).cast("string").alias(f"_mx_{i}"),
        ]
    one = df.agg(*aggs)

    def _q(name: str) -> str:
        return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"

    stack_args = ", ".join(
        f"{_q(c)}, _nn_{i}, _nd_{i}, _mn_{i}, _mx_{i}"
        for i, c in enumerate(cols)
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("_rows").alias("n_rows"),
    ).select(
        "column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    )
