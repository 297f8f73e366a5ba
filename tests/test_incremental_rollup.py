"""Incremental aggregate maintenance: the stored-partials + daily-batch
merge must be IDENTICAL to a full corpus recompute for any corpus/batch
split — the invariant that lets a daily pipeline stop rescanning the
corpus. Exercised at several cutoffs, including degenerate ones (empty
store / empty batch)."""

from __future__ import annotations

import pytest

from flink_cep_task_spark.plans.analytics import (
    INCREMENTAL_ROLLUP_SQL,
    read_rollup_partial_store,
    write_rollup_partial_store,
)
from flink_cep_task_spark.sources.tables import (
    load_events_before,
    load_events_since,
)
from tests.conftest import SF_DIR, assert_parity

from pyspark.sql import functions as F


def _rollup_from(store_df, batch_df):
    bp = batch_df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("value").alias("n_vals"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    merged = store_df.select(
        "event_type", "n_events", "n_vals", "sum_value", "min_value", "max_value"
    ).unionByName(bp)
    g = merged.groupBy("event_type").agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("n_vals").cast("long").alias("n_vals"),
        F.sum("sum_value").alias("_sum"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )
    return g.select(
        "event_type",
        "n_events",
        "n_vals",
        F.round(F.col("_sum").cast("double"), 2).alias("total_value"),
        "min_value",
        "max_value",
        F.round(F.col("_sum").cast("double") / F.col("n_vals"), 6).alias("avg_value"),
    )


# fixtures span 2024-01-01..2024-01-30; cutoffs: mid-corpus, before all
# data (empty store), after all data (empty batch)
CUTOFFS = [1_705_276_800, 1_600_000_000, 1_800_000_000]


@pytest.mark.parametrize("cutoff", CUTOFFS)
def test_rollup_matches_full_recompute_at_any_cutoff(spark, ddb, tmp_path, cutoff):
    store_path = str(tmp_path / "rollup_partials")
    write_rollup_partial_store(
        load_events_before(spark, SF_DIR, cutoff), store_path
    )
    store = read_rollup_partial_store(spark, store_path)
    batch = load_events_since(spark, SF_DIR, cutoff)
    got = _rollup_from(store, batch)
    assert_parity(got, ddb, INCREMENTAL_ROLLUP_SQL)


def test_store_is_day_partitioned(spark, tmp_path):
    import os

    store_path = str(tmp_path / "rollup_partials")
    write_rollup_partial_store(
        load_events_before(spark, SF_DIR, 1_705_276_800), store_path
    )
    days = [d for d in os.listdir(store_path) if d.startswith("day=")]
    assert len(days) >= 10, f"expected per-day partitions, got {days}"
