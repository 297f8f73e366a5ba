"""Parity harness for EVERY registered query vs. its DuckDB oracle —
the local mirror of the driver's correctness gate (at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from flink_cep_task_spark.registry import all_queries
from tests.conftest import SF_DIR, assert_parity

QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, (_f, sql) in QUERIES.items() if sql is not None)


def test_every_query_has_an_oracle():
    """The whole registered surface is oracle-checked — no rows-only
    entries. If a future genuinely-non-SQL-expressible operator lands,
    give it a dedicated behavioral test instead of a vacuous run-check."""
    assert WITH_ORACLE == sorted(QUERIES)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, ddb, name):
    fn, sql = QUERIES[name]
    assert_parity(fn(spark, SF_DIR), ddb, sql)
