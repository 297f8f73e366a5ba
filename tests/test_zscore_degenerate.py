"""zscore_outliers on a zero-variance group: the textbook variance of an
all-equal group computes as a tiny negative double — DuckDB's sqrt RAISES
on it and Spark yields NaN (which passes Spark's >= filter). Both engines
must instead exclude the degenerate group before any sqrt runs."""

from __future__ import annotations

import datetime as dt

import duckdb

from flink_cep_task_spark.plans.analytics import ZSCORE_SQL, zscore_outliers


def test_degenerate_group_excluded_in_both_engines(spark, tmp_path):
    rows = []
    ts = dt.datetime(2024, 1, 1)
    # 'flat': all-equal values (zero variance); 'mixed': one extreme outlier
    for i in range(40):
        rows.append((i, ts, 1, "flat", 7.77, "{}"))
    for i in range(40, 80):
        rows.append((i, ts, 2, "mixed", 1000.0 if i == 79 else 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)

    got = zscore_outliers.__wrapped__(spark, str(tmp_path)) if hasattr(
        zscore_outliers, "__wrapped__"
    ) else zscore_outliers(spark, str(tmp_path))
    out = {(r.event_id, r.event_type) for r in got.collect()}
    assert all(t != "flat" for (_e, t) in out), f"degenerate group leaked: {out}"
    assert (79, "mixed") in out, "the genuine outlier was lost"

    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the part-file glob
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/*.parquet')")
    oracle = {(r[0], r[1]) for r in con.execute(ZSCORE_SQL).fetchall()}
    assert oracle == out, f"engines diverge: spark={out} oracle={oracle}"
