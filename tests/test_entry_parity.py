"""Pre-flight of the driver's correctness gate: every queries() entry must
match its oracle_sql() on DuckDB — row count, column names, sorted values.

Comparison is DTYPE-STRICT and goes through pandas on both sides, mirroring
the driver's value-hash path: DuckDB returns SUM(BIGINT) as HUGEINT which
pandas renders as float64, so an un-cast oracle produces 3.0 where Spark
produces 3 — Python tuple equality would hide that (3 == 3.0), a typed
tuple does not.
"""

from __future__ import annotations

import decimal
import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _typed(v):
    """Normalize a cell to a (kind, value) pair so int vs float is a mismatch."""
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("list", tuple(_typed(x) for x in v))
    if v is None:
        return ("null", None)
    if isinstance(v, (bool, np.bool_)):
        return ("bool", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("int", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("null", None)
        return ("float", round(f, 9))
    if isinstance(v, decimal.Decimal):
        return ("float", round(float(v), 9))
    if pd.isna(v):  # NaT
        return ("null", None)
    return (type(v).__name__, v)


def _typed_rows(pdf):
    cols = sorted(pdf.columns)
    rows = [
        tuple(_typed(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=lambda t: tuple(str(x) for x in t))


def test_every_query_has_oracle():
    missing = set(QUERIES) - set(ORACLES)
    assert not missing, f"queries without oracle: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spdf = sdf.toPandas()

    if name not in ORACLES or ORACLES[name] is None:
        pytest.skip(f"{name}: rows-only check (no oracle)")
    dpdf = duck.execute(ORACLES[name]).df()

    assert sorted(spdf.columns) == sorted(dpdf.columns), (
        f"{name}: column mismatch {list(spdf.columns)} vs {list(dpdf.columns)}"
    )
    assert len(spdf) == len(dpdf), f"{name}: row count {len(spdf)} vs {len(dpdf)}"
    sn = _typed_rows(spdf)
    dn = _typed_rows(dpdf)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches; first: {mismatches[:3]}"


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
