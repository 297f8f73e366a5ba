"""Central query registry: name → (spark_callable, oracle_sql | None).

Everything the engine claims as implemented surfaces here; __spark_entry__
adapts this to the driver contract and tests/test_queries.py asserts parity
for every entry that has an oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    from flink_cep_task_spark.plans.analytics import ANALYTICS_QUERIES
    from flink_cep_task_spark.plans.cep_queries import CEP_QUERIES
    from flink_cep_task_spark.plans.datapipe import DATAPIPE_QUERIES
    from flink_cep_task_spark.plans.tpch import TPCH_QUERIES

    merged: dict[str, tuple] = {}
    for reg in (CEP_QUERIES, TPCH_QUERIES, ANALYTICS_QUERIES, DATAPIPE_QUERIES):
        overlap = merged.keys() & reg.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(reg)
    return merged
