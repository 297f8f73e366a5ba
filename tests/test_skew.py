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
