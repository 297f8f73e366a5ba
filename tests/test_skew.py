"""Skew resilience of the CEP fan-out → groupBy pipeline (the docstring
promise at operators/fanout.py): one dominant (rule, group) must not
serialize the plan. The aggregation is safe by construction — Catalyst's
partial (map-side) hash aggregation collapses each partition's share of the
hot group to one row per (group, window) BEFORE the shuffle, so the hot
group's reduce-side work is O(partitions), not O(rows) — and AQE skew
handling (session.py) covers the join stages. This test pins that property
with a 90 %-in-one-group workload at data-parallel scale."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from flink_cep_task_spark.plans.cep import evaluate_rules
from flink_cep_task_spark.rules import Rule

N_ROWS = 400_000
N_GROUPS = 1_000
RULE = Rule(
    rule_id=1, window_type="tumbling", window_minutes=1440,
    grouping_keys=("t_user",), agg_type="SUM", agg_field="m",
    limit_op=">", limit="0",
)


def _metrics(spark, skewed: bool):
    base_s = 1_700_000_000
    user = (
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % N_GROUPS)
        if skewed
        else F.col("id") % N_GROUPS
    )
    return spark.range(N_ROWS).select(
        F.timestamp_seconds(F.lit(base_s) + (F.col("id") % 1_209_600)).alias("event_time"),
        F.create_map(F.lit("t_user"), user.cast("string")).alias("tags"),
        F.create_map(F.lit("m"), (F.col("id") % 100).cast("decimal(18,2)")).alias("metrics"),
    )


def _run(spark, skewed: bool) -> tuple[float, int]:
    df = evaluate_rules(spark, _metrics(spark, skewed), [RULE])
    t0 = time.perf_counter()
    n = df.count()
    return time.perf_counter() - t0, n


def test_dominant_group_does_not_serialize_the_plan(spark):
    _run(spark, False)  # warm-up: codegen + shuffle machinery
    uniform_t, uniform_n = _run(spark, False)
    skew_t, skew_n = _run(spark, True)
    assert uniform_n > 0 and skew_n > 0
    # identical row volume, 90% of it in ONE group: partial aggregation
    # must keep the skewed run within ~2x of the uniform one (allow a bit
    # of headroom for timing noise on a shared machine)
    assert skew_t <= max(2.5 * uniform_t, uniform_t + 2.0), (
        f"skewed run {skew_t:.2f}s vs uniform {uniform_t:.2f}s"
    )
