"""Shared fixtures: one SparkSession per test session + a DuckDB oracle
comparator that mimics the driver's correctness gate (row-count + schema +
order-insensitive value comparison)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from flink_cep_task_spark.session import get_spark
from flink_cep_task_spark.sources.tables import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values — order-insensitive form."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def assert_parity(spark_df, ddb_con, oracle_sql: str, float_tol: float = 1e-9) -> None:
    """Driver-style comparison: same row count, same column names, same
    values (order-insensitive; floats within tolerance, everything else
    exact)."""
    left = normalize(spark_df.toPandas())
    right = normalize(ddb_con.execute(oracle_sql).df())
    assert list(left.columns) == list(right.columns), (
        f"schema mismatch: spark={list(left.columns)} oracle={list(right.columns)}"
    )
    # dtype *kind* must agree (int vs float vs object) — a value-identical
    # result can still hash-mismatch in the driver if one engine returns
    # int64 and the other float64 (e.g. DuckDB windowed sum → HUGEINT).
    for col in left.columns:
        lk, rk = left[col].dtype.kind, right[col].dtype.kind
        if {lk, rk} <= {"i", "u"}:
            continue
        assert lk == rk, f"dtype kind mismatch on {col}: spark={left[col].dtype} oracle={right[col].dtype}"
    assert len(left) == len(right), f"row count mismatch: spark={len(left)} oracle={len(right)}"
    for col in left.columns:
        lv, rv = left[col].tolist(), right[col].tolist()
        for i, (a, b) in enumerate(zip(lv, rv)):
            if a is None and b is None:
                continue
            if isinstance(a, float) or isinstance(b, float):
                a_nan = a is None or (isinstance(a, float) and math.isnan(a))
                b_nan = b is None or (isinstance(b, float) and math.isnan(b))
                if a_nan or b_nan:
                    assert a_nan and b_nan, f"{col}[{i}]: {a!r} != {b!r}"
                    continue
                assert math.isclose(float(a), float(b), rel_tol=float_tol, abs_tol=float_tol), (
                    f"{col}[{i}]: {a!r} != {b!r}"
                )
            else:
                assert a == b, f"{col}[{i}]: {a!r} != {b!r}"
