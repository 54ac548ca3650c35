"""Local replay of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count + column names + order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrypoint

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_DIR, t + '.parquet')}'"
        )
    return con


def _canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return f"{val:.6f}"
    if isinstance(val, bool):
        return str(bool(val))
    if isinstance(val, list):
        return "[" + ",".join(_canon(v) for v in val) + "]"
    return str(val)


def _rows_canon(columns, rows):
    cols_sorted = sorted(range(len(columns)), key=lambda i: columns[i])
    out = sorted(
        tuple(_canon(row[i]) for i in cols_sorted) for row in rows
    )
    return [columns[i] for i in cols_sorted], out


ORACLE_CASES = sorted(entrypoint.oracle_sql().keys())


@pytest.fixture(scope="module")
def duck():
    return _duck()


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, duck, name):
    q = entrypoint.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    res = duck.execute(entrypoint.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    _, s = _rows_canon(spark_cols, spark_rows)
    _, d = _rows_canon(duck_cols, duck_rows)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entrypoint.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"rule_id", "n_checked", "n_violations", "violation_rate", "pass"}


def test_every_query_is_oracled():
    """Round 4: zero rows-only queries remain — every queries() entry
    carries a DuckDB oracle (the seeded-ANN pair via the planted-
    duplicate top-1 invariant). A new query without an oracle fails
    here instead of silently weakening the gate."""
    assert set(entrypoint.queries()) == set(ORACLE_CASES)


def test_driver_window_exactly_filled():
    """The driver verifies only the FIRST DRIVER_WINDOW (50) registry
    entries; round 5 silently overflowed to 52 and two queries fell
    outside (advisor finding). QUERIES_HEAD must hold exactly the
    window, lead the merged registry in order, and never overlap the
    parked set — so adding a query without choosing what to park
    fails HERE, not silently at the driver."""
    from intent_classifier_service_spark import driver_queries as dq

    assert len(dq.QUERIES_HEAD) == dq.DRIVER_WINDOW == 50
    assert not set(dq.QUERIES_HEAD) & set(dq.QUERIES_PARKED)
    merged = list(dq.QUERIES)
    assert merged[: dq.DRIVER_WINDOW] == list(dq.QUERIES_HEAD)
    assert set(merged) == set(dq.QUERIES_HEAD) | set(dq.QUERIES_PARKED)
