"""Pins the bucketing FLOOR convention on negative-epoch timestamps.

The driver fixtures are all post-1970, so only this synthetic case keeps
the semantic honest. Two historical wrongs, both directions:
  * Spark-side cast-truncation ((ts/3600) cast long) truncates toward
    zero — ADVICE r5 flagged it; fixed to F.floor.
  * DuckDB's integer `//` ALSO truncates toward zero ((-7201)//3600 =
    -2, floor = -3 — probed round 6), so the oracles that used `//` were
    wrong the same way; fixed to the exact mod identity
    oracle._fmul: x - ((x % n) + n) % n.
"""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from flink_cep_task_spark.oracle import _fmul
from flink_cep_task_spark.plans.analytics import RESAMPLE_STEP_S


def test_negative_epoch_bucket_floor_in_both_engines(spark):
    ts_vals = [-7201, -3601, -3600, -1, 0, 1, 3599, 3600, 5400]
    df = spark.createDataFrame([(t,) for t in ts_vals], ["ts_s"]).select(
        F.timestamp_seconds("ts_s").alias("ts")
    )
    # the engine-side bucket expression (resample_ffill / windows.py form)
    h = (
        F.floor(F.col("ts").cast("long") / RESAMPLE_STEP_S).cast("long")
        * RESAMPLE_STEP_S
    )
    got = [r.h for r in df.select(h.alias("h")).collect()]
    # the oracle-side expression (_fmul — what every window oracle now uses)
    want = [
        r[0]
        for r in duckdb.connect()
        .execute(
            f"SELECT {_fmul('t', RESAMPLE_STEP_S)} "
            f"FROM (SELECT unnest({ts_vals!r}) AS t)"
        )
        .fetchall()
    ]
    assert got == want
    assert got[0] == -10800  # floor, not the -7200 truncation would give
    # the truncating forms are provably WRONG on the negatives — keep both
    # counterexamples so a refactor back to either fails loudly
    trunc = (F.col("ts").cast("long") / RESAMPLE_STEP_S).cast("long") * RESAMPLE_STEP_S
    got_trunc = [r.h for r in df.select(trunc.alias("h")).collect()]
    assert got_trunc != want
    duck_trunc = [
        r[0]
        for r in duckdb.connect()
        .execute(
            f"SELECT (t // {RESAMPLE_STEP_S}) * {RESAMPLE_STEP_S} "
            f"FROM (SELECT unnest({ts_vals!r}) AS t)"
        )
        .fetchall()
    ]
    assert duck_trunc != want
