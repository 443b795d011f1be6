"""Local replica of the driver's correctness gate: every queries() entry with
an oracle_sql() entry must match DuckDB on row count, column names, and an
order-insensitive canonicalized value multiset (sf0.01, same as the driver).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style canonicalization: short repr survives tiny fp noise
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(",".join(_canon(r[i]) for i in idx) for r in rows)


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


# retired entries (driver 50-row cap) stay under the same local gate
ORACLES = {**entrymod.oracle_sql(), **entrymod.retired_oracle_sql()}
QUERIES = {**entrymod.queries(), **entrymod.retired_queries()}


def test_registry_within_driver_cap():
    # the driver records at most 50 correctness rows (r02 captured exactly
    # the first 50 of 52); every registered query must get a row
    assert len(entrymod.queries()) == 50
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        name, spark_cols, duck_cols,
    )
    assert len(spark_rows) == len(duck_rows), (
        name, len(spark_rows), len(duck_rows),
    )
    sset = _rowset(spark_cols, spark_rows)
    dset = _rowset(duck_cols, duck_rows)
    mismatches = [
        (s, d) for s, d in zip(sset, dset) if s != d
    ]
    assert not mismatches, (name, mismatches[:5])


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0


# queries whose EMPTY result is the correct, documented answer
_EXPECTED_EMPTY = {
    # sf0.01 has no customer without orders; the anti-join family's
    # non-vacuous coverage is semi_join_orders (retired r5 for exactly
    # this reason)
    "anti_join_customers",
}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_not_vacuous(duck, name):
    """Guard against fixtures that self-defeat into 0 = 0 hash matches
    (r5 caught code_call_edges/code_inherits passing vacuously after a
    parity mismatch in the planted corpus): every oracle must produce
    rows at the driver's correctness scale, except the documented empty
    answers."""
    n = len(duck.execute(ORACLES[name]).fetchall())
    if name in _EXPECTED_EMPTY:
        assert n == 0, name
    else:
        assert n > 0, name
