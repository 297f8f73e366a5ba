"""Fresh-process smoke: the driver invokes entry()/queries() in ITS OWN
brand-new session — plan paths that work mid-suite can still fail there
(round 3 found a broadcast-join lambda-binding bug that only reproduced in
fresh sessions on local-relation inputs). This test runs the risky shapes
in a clean subprocess."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import datetime as dt
from decimal import Decimal

from flink_cep_task_spark.session import get_spark
from flink_cep_task_spark.plans.cep import evaluate_rules
from flink_cep_task_spark.rules import Rule
from flink_cep_task_spark.schemas import METRIC_SCHEMA

spark = get_spark(app_name="fresh", master="local[2]", shuffle_partitions=4)

# 1. local-relation metrics through the rule fan-out (the shape that hit
#    the lambda-binding bug)
rule = Rule(rule_id=1, window_type="tumbling", window_minutes=1,
            grouping_keys=("t_g",), agg_type="SUM", agg_field="m",
            limit_op=">", limit="5")
df = spark.createDataFrame(
    [(dt.datetime.utcfromtimestamp(1), {"t_g": "x"}, {"m": Decimal(5)}),
     (dt.datetime.utcfromtimestamp(5), {"t_g": "x"}, {"m": Decimal(7)})],
    METRIC_SCHEMA,
)
rows = evaluate_rules(spark, df, [rule]).collect()
assert len(rows) == 1 and rows[0].agg_value == 12.0, rows

# 2. the driver's entry() smoke
import __spark_entry__ as e
n = e.entry(spark).count()
assert n > 0, n

# 3. one registered query with a local-relation rule side at sf0.001
from flink_cep_task_spark.registry import all_queries
fn, _ = all_queries()["cep_rules_from_wire"]
assert fn(spark, "/root/testdata/sf0.001").count() > 0
print("FRESH_OK")
"""


def test_driver_shapes_in_fresh_process():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert "FRESH_OK" in out.stdout, f"stdout={out.stdout[-500:]}\nstderr={out.stderr[-2000:]}"
