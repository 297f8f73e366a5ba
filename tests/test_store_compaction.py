"""Store survival under daily cadence: a 3-day admission loop followed
by compaction (VERDICT r9 task #4).

Every admission is a dynamic partition overwrite, so a daily cadence
accretes one partition directory (and at least one file) per day; this
pins the end-to-end maintenance story the 2-day rolling demos stop
short of: day 3 catches a partner admitted on day 2 (the chain only
exists through two consecutive store advances), compact_dataset then
rewrites the grown store into one right-sized file per partition, and
the day-3 probe against the COMPACTED store is result-identical with
partition pruning intact.
"""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from flink_cep_task_spark.operators.dedup import (
    append_minhash_signatures,
    dedup_incremental_minhash,
    dedup_incremental_minhash_from_store,
    release_caches,
    write_minhash_signature_store,
)
from flink_cep_task_spark.sources.sink import compact_dataset

BASE = "the quick brown fox jumps over the lazy dog before breakfast today"
D1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu xi"
D2 = D1 + " omega"          # near-dup of the day-1 doc
D3 = D1 + " omega psi"      # best partner is the DAY-2 doc (j ≈ 0.92)

ROWS = [
    (1, BASE, "en", "base"),
    (10, D1, "en", "d1"),
    (20, D2, "en", "d2"),
    (30, D3, "en", "d3"),
]
SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING"
DAYS = ["d1", "d2", "d3"]


def _store_files(path: str) -> list[str]:
    return [
        p for p in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(p)
    ]


def test_three_day_cadence_then_compaction(spark, tmp_path):
    docs = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "signatures")
    write_minhash_signature_store(
        docs.filter(~F.col("source").isin(*DAYS)), path
    )
    files_per_day = [len(_store_files(path))]
    results: dict[str, dict] = {}
    for i, day in enumerate(DAYS):
        # probe day i pinned to partitions admitted BEFORE it (its own
        # and future days excluded — the generalized day-1 pin)
        store = spark.read.parquet(path).filter(~F.col("source").isin(*DAYS[i:]))
        results[day] = {
            r["doc_id"]: (r["status"], r["match_id"])
            for r in dedup_incremental_minhash_from_store(docs, store, day).collect()
        }
        append_minhash_signatures(docs.filter(F.col("source") == day), path)
        files_per_day.append(len(_store_files(path)))
        release_caches()
    # the cadence chain: each day's partner arrived via the PREVIOUS
    # day's admission, across two consecutive store advances
    assert results["d1"][10] == ("new", None)
    assert results["d2"][20] == ("near_dup", 10)
    assert results["d3"][30] == ("near_dup", 20)
    # day-3 from-scratch oracle (inline recompute over the full table)
    inline = {
        r["doc_id"]: (r["status"], r["match_id"])
        for r in dedup_incremental_minhash(docs, "d3").collect()
    }
    assert results["d3"] == inline
    # the store genuinely accretes files day over day
    assert files_per_day == sorted(files_per_day) and files_per_day[-1] > files_per_day[0]

    # --- compaction: the maintenance job the cadence eventually needs ---
    dest = str(tmp_path / "signatures_compact")
    stats = compact_dataset(spark, path, dest, partition_cols=["source"])
    assert stats["files_before"] == files_per_day[-1]
    # one right-sized file per partition directory at this scale
    part_dirs = {os.path.dirname(p) for p in _store_files(dest)}
    assert len(part_dirs) == 4  # base + 3 admitted days
    assert stats["files_after"] == 4
    # probe-after-compaction identity: same day-3 report, bit for bit
    recheck = {
        r["doc_id"]: (r["status"], r["match_id"])
        for r in dedup_incremental_minhash_from_store(
            docs, spark.read.parquet(dest), "d3"
        ).collect()
    }
    assert recheck == results["d3"]
    # partition pruning survives the rewrite: a source predicate on the
    # compacted store lands in PartitionFilters, not a post-scan filter
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    plan = (
        spark.read.parquet(dest)
        .filter(F.col("source") != "d3")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scans and all(
        "PartitionFilters" in ln
        and "source" in ln.split("PartitionFilters")[1].split("]")[0]
        for ln in scans
    ), "compacted store lost partition pruning"
