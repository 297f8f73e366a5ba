"""Skew-mitigation primitives must be RESULT-IDENTICAL to their plain
forms (the whole point: the salt is an execution detail that never leaks
into results), and the salted plans must actually shard hot keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_cep_task_spark.operators.skew import (
    salted_join,
    salted_two_phase_distinct,
)


def _skewed_df(spark):
    # one molten key (90% of rows) + a long tail
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 137).alias("u")
    )
    tail = spark.range(1000).select(
        F.concat(F.lit("t"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 29).alias("u"),
    )
    return hot.unionAll(tail)


def test_salted_distinct_matches_plain(spark):
    df = _skewed_df(spark)
    got = {
        r.k: r.n_distinct
        for r in salted_two_phase_distinct(df, ["k"], "u").collect()
    }
    exp = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.count_distinct("u").alias("n")).collect()
    }
    assert got == exp and got["hot"] == 137


def test_salted_distinct_shards_the_first_exchange(spark):
    df = _skewed_df(spark)
    plan = (
        salted_two_phase_distinct(df, ["k"], "u")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # phase-1 exchange must partition on (k, salt), not k alone — that is
    # the property that spreads a hot key over many reducers. Catalyst
    # inlines the salt alias as _groupingexpression in the physical plan.
    first_ex = plan.split("Exchange hashpartitioning")[-1].split("\n")[0]
    assert "_groupingexpression" in first_ex or "__salt" in first_ex, first_ex
    assert "xxhash64" in plan  # the deterministic salt expression survived


def test_salted_join_matches_plain(spark):
    big = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"t{i}", f"T{i}") for i in range(50)], ["dk", "label"]
    )
    got = salted_join(big, dim, "k", "dk", n_salts=8)
    exp = big.join(dim, big.k == dim.dk)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
    assert got.columns == exp.columns


def test_salted_join_left_keeps_unmatched(spark):
    big = _skewed_df(spark)
    dim = spark.createDataFrame([("hot", "H")], ["dk", "label"])
    got = salted_join(big, dim, "k", "dk", n_salts=4, how="left")
    exp = big.join(dim, big.k == dim.dk, "left")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_salted_join_rejects_replication_unsafe_how(spark):
    import pytest

    df = _skewed_df(spark)
    dim = spark.range(10).select(F.concat(F.lit("t"), F.col("id").cast("string")).alias("dk"))
    for how in ("right", "full", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(df, dim, "k", "dk", how=how)


def test_cep_fanout_aggregation_stays_partial_under_hot_group(spark):
    """Pipeline-level skew pin (structural, not timing): the CEP
    fan-out → groupBy path must keep MAP-SIDE partial aggregation, so a
    dominant group's rows combine before the single data shuffle instead
    of melting one reducer. A change that breaks partial-agg placement
    (non-combinable aggregate, repartition above the aggregate) fails
    here."""
    import datetime as dt
    from decimal import Decimal

    from flink_cep_task_spark.plans.cep import evaluate_rules
    from flink_cep_task_spark.rules import Rule
    from flink_cep_task_spark.schemas import METRIC_SCHEMA

    # 90% of events in one group
    rows = [
        (
            dt.datetime.utcfromtimestamp(i % 600),
            {"t_g": "hot" if i % 10 else f"t{i % 7}"},
            {"m": Decimal(i % 50)},
        )
        for i in range(500)
    ]
    metrics = spark.createDataFrame(rows, METRIC_SCHEMA)
    rule = Rule(rule_id=1, window_type="tumbling", window_minutes=1,
                grouping_keys=("t_g",), agg_type="SUM", agg_field="m",
                limit_op=">", limit="0")
    out = evaluate_rules(spark, metrics, [rule])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # partial aggregate BELOW the group exchange, final above it
    pre, _, post = plan.partition("Exchange hashpartitioning")
    assert "partial_sum" in post, "no map-side partial aggregation before the shuffle"
    assert "HashAggregate" in pre, "no final aggregate above the shuffle"
    # and the result itself is correct for the molten group
    got = {(r.group_id, r.window_start): r.agg_value for r in out.collect()}
    assert any(g.startswith("1_hot") for (g, _w) in got), "hot group missing"
