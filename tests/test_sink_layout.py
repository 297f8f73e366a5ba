"""Partitioned-dataset sink: the write produces a hive-layout directory
per partition value, and a read-back filter on the partition column is
satisfied by PLANNING-TIME pruning (PartitionFilters in the scan node,
non-matching files never opened) — the data-layout half of the 100 TB
story, complementing tests/test_bucketing.py's shuffle-free bucketed
joins."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_cep_task_spark.sources.sink import (
    events_by_day,
    read_partitioned,
    write_partitioned,
)
from tests.conftest import SF_DIR


def test_partitioned_write_layout_and_pruning(spark, tmp_path):
    path = str(tmp_path / "events_by_type")
    ev = events_by_day(spark, SF_DIR)
    write_partitioned(ev, path, ["event_type"])

    # hive layout: one directory per partition value
    dirs = sorted(d for d in os.listdir(path) if d.startswith("event_type="))
    types = sorted(
        r[0] for r in ev.select("event_type").distinct().collect()
    )
    assert dirs == [f"event_type={t}" for t in types]

    back = read_partitioned(spark, path)
    filtered = back.filter(F.col("event_type") == "purchase")

    # the filter must land in the scan's PartitionFilters (planning-time
    # pruning), not as a post-scan data filter
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "event_type" in pf_line

    # values round-trip (partition column recovered from the directory)
    want = ev.filter(F.col("event_type") == "purchase").count()
    assert filtered.count() == want


def test_partitioned_write_bounds_file_count(spark, tmp_path):
    """The pre-shuffle keys output files to partition values: each value's
    directory holds a bounded number of parquet files, not one per
    upstream task (small-files explosion)."""
    path = str(tmp_path / "events_files")
    ev = events_by_day(spark, SF_DIR).repartition(8)  # many upstream tasks
    write_partitioned(ev, path, ["event_type"])
    for d in os.listdir(path):
        if not d.startswith("event_type="):
            continue
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        # without the repartition-by-partition-col this would be ~8 per dir
        assert len(files) <= 2, f"{d}: {len(files)} files"


def test_compact_dataset_collapses_small_files(spark, tmp_path):
    """The maintenance compactor: 32 tiny files in, a handful out, rows
    and content byte-identical."""
    from flink_cep_task_spark.sources.sink import compact_dataset
    from flink_cep_task_spark.sources.tables import load_table

    src = str(tmp_path / "fragmented")
    dest = str(tmp_path / "compacted")
    e = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    e.repartition(32).write.parquet(src)

    stats = compact_dataset(spark, src, dest)
    assert stats["files_before"] == 32
    assert stats["files_after"] < 8  # tiny dataset → one target-size file or so
    a = spark.read.parquet(src)
    b = spark.read.parquet(dest)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_compact_dataset_preserves_partition_layout(spark, tmp_path):
    from flink_cep_task_spark.sources.sink import (
        compact_dataset,
        events_by_day,
        write_partitioned,
    )

    src = str(tmp_path / "part_src")
    dest = str(tmp_path / "part_dest")
    df = events_by_day(spark, SF_DIR).select("event_id", "event_type", "event_date")
    # fragment deliberately: bypass write_partitioned's pre-shuffle
    df.repartition(16).write.partitionBy("event_date").parquet(src)
    stats = compact_dataset(spark, src, dest, partition_cols=["event_date"])
    assert stats["files_after"] < stats["files_before"]
    b = spark.read.parquet(dest)
    assert {r.event_date for r in b.select("event_date").distinct().collect()} == {
        r.event_date for r in df.select("event_date").distinct().collect()
    }
    assert b.count() == df.count()


def test_compact_dataset_routes_through_hadoop_fs(spark, tmp_path):
    """compact_dataset lists and sizes through the Hadoop FileSystem API
    (round-12 substrate port): a `file:`-scheme URI — which the old
    glob/os.path machinery could not list — compacts correctly, pinning
    that the maintenance job runs against any Hadoop-supported store
    URI, which is where the datasets it exists for actually live."""
    from flink_cep_task_spark.sources.sink import compact_dataset

    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    spark.range(1000).repartition(8).write.parquet(src)
    stats = compact_dataset(spark, "file:" + src, "file:" + dest)
    assert stats["files_before"] == 8
    assert stats["files_after"] == 1
    assert stats["bytes"] > 0
    assert spark.read.parquet(dest).count() == 1000
