"""Bucketed co-located joins: pre-bucketing both sides of a recurring join
key eliminates the per-query shuffle — the 100 TB strategy for repeated
fact-fact joins (orders ⋈ lineitem). This test proves the engine's session
configuration actually produces a shuffle-free plan from bucketed tables."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from flink_cep_task_spark.sources.tables import load_table
from tests.conftest import SF_DIR

N_BUCKETS = 8


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    warehouse = str(tmp_path / "wh")
    suffix = uuid.uuid4().hex[:8]
    o_tbl, l_tbl = f"orders_b_{suffix}", f"lineitem_b_{suffix}"

    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    (orders.write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey").option("path", f"{warehouse}/{o_tbl}")
        .saveAsTable(o_tbl))
    (lineitem.write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey").option("path", f"{warehouse}/{l_tbl}")
        .saveAsTable(l_tbl))
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # tiny test tables would auto-broadcast (also shuffle-free, but
        # then the bucket layout is never exercised) — force the shuffled
        # join family, as a fact-fact join at 100 TB would be.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob, lb = spark.table(o_tbl), spark.table(l_tbl)
        joined = (
            ob.join(lb, ob.o_orderkey == lb.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join must read bucketed scans directly: no hash-repartition
        # Exchange below it (the final small aggregation still shuffles).
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        join_part = plan.split("Join")[-1]
        assert "Exchange hashpartitioning" not in join_part, (
            f"join required a shuffle:\n{plan}"
        )
        assert "Bucketed: true" in plan, plan

        # and it computes the right thing
        expected = (
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expected.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {o_tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {l_tbl}")
