"""End-to-end CEP rule evaluation vs. the DuckDB oracle (SURVEY.md §5 (2)).

Every registered CEP query must hash-match its oracle SQL — this mirrors
the driver's CORRECTNESS gate exactly, at sf0.001 for speed.
"""

from __future__ import annotations

import pytest

from flink_cep_task_spark.plans.cep_queries import CEP_QUERIES
from tests.conftest import SF_DIR, assert_parity


@pytest.mark.parametrize("name", sorted(CEP_QUERIES))
def test_cep_query_matches_oracle(spark, ddb, name):
    fn, sql = CEP_QUERIES[name]
    assert sql is not None
    df = fn(spark, SF_DIR)
    assert_parity(df, ddb, sql)


def test_multi_rule_result_nonempty(spark):
    fn, _ = CEP_QUERIES["cep_multi_rule"]
    assert fn(spark, SF_DIR).count() > 0
