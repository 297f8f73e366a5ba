"""Parity harness for EVERY registered query vs. its DuckDB oracle —
the local mirror of the driver's correctness gate (at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from flink_cep_task_spark.registry import all_queries
from tests.conftest import SF_DIR, assert_parity

QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, (_f, sql) in QUERIES.items() if sql is not None)
ROWS_ONLY = sorted(n for n, (_f, sql) in QUERIES.items() if sql is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, ddb, name):
    fn, sql = QUERIES[name]
    assert_parity(fn(spark, SF_DIR), ddb, sql)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    fn, _ = QUERIES[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema) > 0
