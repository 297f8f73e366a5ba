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


# --- the REWRITING store family: cluster labels under a 3-day cadence ----
#
# The signature cadence above covers the ADDITIVE stores (each admission
# adds its own partition); the label store REWRITES: every admission
# lands a complete star-edge set under its own epoch, and consumers read
# only the latest epoch. Sliding 24-word windows with a 5-word step
# (same construction as tests/test_rolling_store.py's chain, one hop
# longer): consecutive windows share 17/27 3-shingles (0.63 >= tau),
# two steps apart 12/32 (0.375 < tau), and ALL four consecutive pairs
# band-collide for this vocabulary (verified; the pair set is exactly
# the chain) — A1~A2~D~E~F with no shortcut edges, so F's day-3 cluster
# membership is provable only through BOTH intermediate label advances.
_CW = [f"te{i:02d}" for i in range(1, 45)]


def _cw_txt(a: int, b: int) -> str:
    return " ".join(_CW[a - 1 : b])


CHAIN3_ROWS = [
    (1, _cw_txt(1, 24), "en", "base"),   # A1: corpus cluster min
    (2, _cw_txt(6, 29), "en", "base"),   # A2 ~ A1 (stored star edge)
    (10, _cw_txt(11, 34), "en", "d1"),   # D ~ A2 only
    (20, _cw_txt(16, 39), "en", "d2"),   # E ~ D only
    (30, _cw_txt(21, 44), "en", "d3"),   # F ~ E only
]


def test_cluster_label_three_day_cadence_then_compaction(spark, tmp_path, monkeypatch):
    from flink_cep_task_spark.operators.dedup import (
        CLUSTER_BASE_EPOCH,
        _cluster_from_pairs,
        dedup_clusters,
        dedup_clusters_from_store,
        minhash_pairs_from_store,
        read_cluster_label_store,
        retire_label_epochs,
        write_cluster_label_store,
    )

    # every admission in this cadence runs under the debug containment
    # check (write_cluster_label_store's fast-path precondition)
    monkeypatch.setenv("SPARK_GRAFT_DEBUG_STORES", "1")

    docs = spark.createDataFrame(CHAIN3_ROWS, SCHEMA)
    corpus_sig = docs.filter(~F.col("source").isin(*DAYS))
    sig_path = str(tmp_path / "signatures")
    write_minhash_signature_store(corpus_sig, sig_path)
    lab_path = str(tmp_path / "labels")
    sig = spark.read.parquet(sig_path)
    write_cluster_label_store(
        _cluster_from_pairs(sig.select("doc_id"), minhash_pairs_from_store(sig)),
        lab_path,
        epoch=CLUSTER_BASE_EPOCH,
    )
    release_caches()

    results: dict[str, dict] = {}
    prev_epoch = CLUSTER_BASE_EPOCH
    epoch_dirs = [len(_store_files(lab_path))]
    for i, day in enumerate(DAYS):
        store = spark.read.parquet(sig_path).filter(
            ~F.col("source").isin(*DAYS[i:])
        )
        lab = read_cluster_label_store(spark, lab_path, prev_epoch)
        universe = docs.filter(~F.col("source").isin(*DAYS[i + 1:]))
        r = dedup_clusters_from_store(universe, lab, store, day)
        results[day] = {x["doc_id"]: x["cluster_id"] for x in r.collect()}
        append_minhash_signatures(docs.filter(F.col("source") == day), sig_path)
        write_cluster_label_store(r, lab_path, epoch=day, dynamic=True)
        epoch_dirs.append(len(_store_files(lab_path)))
        prev_epoch = day
        release_caches()

    # the chain: F (day 3) lands in A1's cluster even though its ONLY
    # near-dup partner is E — the membership exists only through d1's
    # AND d2's label admissions (no shortcut edge to the corpus).
    # D joins via A2's STORED star edge (label = the component min 1),
    # E via D's admitted label, F via E's.
    assert results["d1"][10] == 1
    assert results["d2"][20] == 1
    assert results["d3"][30] == 1
    # day-3 equals the from-scratch clustering of the whole table
    inline = {
        x["doc_id"]: x["cluster_id"] for x in dedup_clusters(docs).collect()
    }
    assert results["d3"] == inline
    # the epoch store accretes one complete star-edge set per day
    assert epoch_dirs == sorted(epoch_dirs) and epoch_dirs[-1] > epoch_dirs[0]

    # --- compaction on the epoch-partitioned label store ---
    dest = str(tmp_path / "labels_compact")
    stats = compact_dataset(spark, lab_path, dest, partition_cols=["epoch"])
    assert stats["files_before"] == epoch_dirs[-1]
    part_dirs = {os.path.dirname(p) for p in _store_files(dest)}
    assert len(part_dirs) == 4  # base + 3 epochs
    # re-merge the day-3 probe against the COMPACTED store: identical
    lab_c = read_cluster_label_store(spark, dest, "d2")
    store_c = spark.read.parquet(sig_path).filter(
        ~F.col("source").isin("d3")
    )
    recheck = {
        x["doc_id"]: x["cluster_id"]
        for x in dedup_clusters_from_store(docs, lab_c, store_c, "d3").collect()
    }
    assert recheck == results["d3"]
    # epoch pruning survives the rewrite
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    plan = (
        read_cluster_label_store(spark, dest, "d2")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scans and all(
        "PartitionFilters" in ln
        and "epoch" in ln.split("PartitionFilters")[1].split("]")[0]
        for ln in scans
    ), "compacted label store lost epoch pruning"


def test_label_epoch_gc_after_cadence(spark, tmp_path):
    """Epoch retention for the REWRITING store (VERDICT r10 task #1):
    every advance writes a complete corpus-sized star-edge mapping under
    a new epoch, so without GC the store grows O(corpus × days). Reads
    are epoch-pinned, so retiring superseded epochs is safe by
    construction — proven here: after a 3-day cadence, GC epochs
    base+d1, and the day-3 probe (pinned to the surviving d2 epoch)
    answers bit-for-bit what it answered pre-GC."""
    from flink_cep_task_spark.operators.dedup import (
        CLUSTER_BASE_EPOCH,
        _cluster_from_pairs,
        dedup_clusters_from_store,
        minhash_pairs_from_store,
        read_cluster_label_store,
        retire_label_epochs,
        write_cluster_label_store,
    )
    import pytest as _pytest

    docs = spark.createDataFrame(CHAIN3_ROWS, SCHEMA)
    sig_path = str(tmp_path / "signatures")
    write_minhash_signature_store(
        docs.filter(~F.col("source").isin(*DAYS)), sig_path
    )
    lab_path = str(tmp_path / "labels")
    sig = spark.read.parquet(sig_path)
    write_cluster_label_store(
        _cluster_from_pairs(sig.select("doc_id"), minhash_pairs_from_store(sig)),
        lab_path,
        epoch=CLUSTER_BASE_EPOCH,
    )
    release_caches()

    prev = CLUSTER_BASE_EPOCH
    day3_pre = None
    bytes_per_epoch: dict[str, int] = {}
    for i, day in enumerate(DAYS):
        store = spark.read.parquet(sig_path).filter(~F.col("source").isin(*DAYS[i:]))
        lab = read_cluster_label_store(spark, lab_path, prev)
        universe = docs.filter(~F.col("source").isin(*DAYS[i + 1:]))
        r = dedup_clusters_from_store(universe, lab, store, day)
        if day == "d3":
            day3_pre = {x["doc_id"]: x["cluster_id"] for x in r.collect()}
        else:
            r.collect()
        append_minhash_signatures(docs.filter(F.col("source") == day), sig_path)
        write_cluster_label_store(r, lab_path, epoch=day, dynamic=True)
        prev = day
        release_caches()
    bytes_per_epoch = {
        ep: sum(
            os.path.getsize(p)
            for p in _store_files(os.path.join(lab_path, f"epoch={ep}"))
        )
        for ep in [CLUSTER_BASE_EPOCH, *DAYS]
    }
    # O(corpus × days): every epoch carries a full mapping's bytes
    assert all(b > 0 for b in bytes_per_epoch.values())

    # guard: a retain set matching no existing epoch refuses to run
    with _pytest.raises(ValueError, match="retains no existing epoch"):
        retire_label_epochs(spark, lab_path, keep=["nonexistent"])

    # GC the superseded epochs (keep_last sorts: base < d1 < d2 < d3 —
    # but 'base' sorts first so keep_last=2 keeps d2, d3)
    stats = retire_label_epochs(spark, lab_path, keep_last=2)
    assert stats == {"retired": [CLUSTER_BASE_EPOCH, "d1"], "kept": ["d2", "d3"]}
    dirs = {os.path.basename(d) for d in glob.glob(os.path.join(lab_path, "epoch=*"))}
    assert dirs == {"epoch=d2", "epoch=d3"}
    # reclaimed exactly the superseded epochs' bytes
    left = sum(os.path.getsize(p) for p in _store_files(lab_path))
    assert left == bytes_per_epoch["d2"] + bytes_per_epoch["d3"]

    # the day-3 probe re-runs pinned to the SURVIVING d2 epoch,
    # bit-for-bit identical — GC changed bytes, never answers
    store3 = spark.read.parquet(sig_path).filter(F.col("source") != "d3")
    lab3 = read_cluster_label_store(spark, lab_path, "d2")
    recheck = {
        x["doc_id"]: x["cluster_id"]
        for x in dedup_clusters_from_store(docs, lab3, store3, "d3").collect()
    }
    assert recheck == day3_pre
    release_caches()


def test_label_epoch_gc_routes_through_hadoop_fs(spark, tmp_path):
    """retire_label_epochs resolves the store through the Hadoop
    FileSystem API (VERDICT r11 task #2): a `file:`-scheme URI — which
    the old os.path/glob machinery could not even list — is GC'd
    correctly, pinning that the operator runs against any
    Hadoop-supported store URI (local, HDFS, s3a/gs via connectors),
    which is the difference between a demo GC and the 100 TB one. Also
    pins the newest-epoch guard: an explicit keep= omitting the
    most-recently-written epoch refuses to run."""
    import pytest as _pytest

    from flink_cep_task_spark.operators.dedup import (
        retire_label_epochs,
        write_cluster_label_store,
    )

    lab_path = str(tmp_path / "labels")
    labels = spark.createDataFrame([(2, 1), (3, 1)], "doc_id LONG, cluster_id LONG")
    for ep in ("d1", "d2", "d3"):
        write_cluster_label_store(labels, lab_path, epoch=ep, dynamic=True)

    uri = "file:" + lab_path
    with _pytest.raises(ValueError, match="newest epoch"):
        retire_label_epochs(spark, uri, keep=["d1"])

    stats = retire_label_epochs(spark, uri, keep_last=1)
    assert stats == {"retired": ["d1", "d2"], "kept": ["d3"]}
    dirs = {os.path.basename(d) for d in glob.glob(os.path.join(lab_path, "epoch=*"))}
    assert dirs == {"epoch=d3"}
    # the surviving epoch still reads back through Spark
    assert spark.read.parquet(lab_path).count() == 2


def test_write_model_parquet_routes_through_hadoop_fs(spark, tmp_path):
    """write_model_parquet resolves any URI destination through the
    Hadoop FileSystem API (VERDICT r12 task #2): a `file:`-scheme URI —
    which the old shutil/os.makedirs machinery would have mangled into
    a literal './file:' directory — lands the staged pyarrow file at
    the right place, overwrite included, pinning that model stores are
    addressable by any Hadoop-supported URI (the same routing proof as
    test_label_epoch_gc_routes_through_hadoop_fs). Bare paths keep the
    profiled millisecond local fast path."""
    import pyarrow as pa

    from flink_cep_task_spark.sources.sink import write_model_parquet

    dest = str(tmp_path / "model")
    t1 = pa.table({"k": [1, 2], "v": [0.5, 1.5]})
    write_model_parquet("file:" + dest, t1)
    assert sorted(
        (r["k"], r["v"]) for r in spark.read.parquet(dest).collect()
    ) == [(1, 0.5), (2, 1.5)]

    # overwrite through the same route replaces, never appends
    t2 = pa.table({"k": [7], "v": [9.0]})
    write_model_parquet("file:" + dest, t2)
    assert [(r["k"], r["v"]) for r in spark.read.parquet(dest).collect()] == [
        (7, 9.0)
    ]

    # the bare-path fast path still round-trips identically
    local = str(tmp_path / "model_local")
    write_model_parquet(local, t2)
    assert [(r["k"], r["v"]) for r in spark.read.parquet(local).collect()] == [
        (7, 9.0)
    ]


def test_newest_epoch_guard_tracks_write_recency_not_name_order(spark, tmp_path):
    """The GC's newest-epoch guard ranks by the partition directory's
    modification time, not name order (ADVICE r12): a rebuild epoch
    named 'rebuilt' written AFTER daily 'src0' epochs is the store's
    newest advance even though 'src0' sorts last lexicographically.
    The old lexicographic guard failed this both ways — it rejected the
    legitimate GC down to the rebuild (keep=['rebuilt'] omitted the
    'latest' src0) and would have let src0 retire a genuinely-newer
    epoch sorting before it. This is exactly the shape the composed
    label-maintenance cycle runs (plans/datapipe.cluster_label_maintenance)."""
    import time as _time

    import pytest as _pytest

    from flink_cep_task_spark.operators.dedup import (
        retire_label_epochs,
        write_cluster_label_store,
    )

    lab_path = str(tmp_path / "labels")
    labels = spark.createDataFrame([(2, 1)], "doc_id LONG, cluster_id LONG")
    for ep in ("base", "src0"):
        write_cluster_label_store(labels, lab_path, epoch=ep, dynamic=True)
    _time.sleep(1.1)  # local-FS mtime granularity can be one second
    write_cluster_label_store(labels, lab_path, epoch="rebuilt", dynamic=True)

    # retiring the newest advance (the rebuild) still refuses, even
    # though 'src0' > 'rebuilt' lexicographically
    with _pytest.raises(ValueError, match="newest epoch"):
        retire_label_epochs(spark, lab_path, keep=["src0"])

    # and the legitimate GC down to the rebuild epoch now runs
    stats = retire_label_epochs(spark, lab_path, keep=["rebuilt"])
    assert stats == {"retired": ["base", "src0"], "kept": ["rebuilt"]}
    dirs = {os.path.basename(d) for d in glob.glob(os.path.join(lab_path, "epoch=*"))}
    assert dirs == {"epoch=rebuilt"}


def test_keep_last_and_guard_share_the_recency_ranking(spark, tmp_path):
    """keep_last and the newest-epoch guard now use ONE recency
    definition — newest file mtime inside the epoch partition — so an
    idempotent re-land of an OLD epoch (the store discipline every
    recrawl flow celebrates) cannot wedge the GC: before this fix,
    keep_last selected by name while the guard demanded the
    mtime-newest epoch, and a rewritten d1 made keep_last=2 raise."""
    import time as _time

    from flink_cep_task_spark.operators.dedup import (
        retire_label_epochs,
        write_cluster_label_store,
    )

    lab_path = str(tmp_path / "labels")
    labels = spark.createDataFrame([(2, 1)], "doc_id LONG, cluster_id LONG")
    for ep in ("d1", "d2", "d3"):
        write_cluster_label_store(labels, lab_path, epoch=ep, dynamic=True)
    _time.sleep(1.1)
    # the re-land: d1's partition is rewritten, making it newest
    write_cluster_label_store(labels, lab_path, epoch="d1", dynamic=True)

    stats = retire_label_epochs(spark, lab_path, keep_last=2)
    assert stats == {"retired": ["d2"], "kept": ["d1", "d3"]}


def test_empty_epoch_partitions_are_materialized_and_gc_visible(spark, tmp_path):
    """A duplicate-free clustering admits ZERO star edges; the writer
    still materializes the epoch's partition directory so 'epoch
    admitted' stays observable — the schema-pinned read returns an
    empty mapping (correct: every doc is its own cluster) and the GC
    can retain/retire the epoch like any other. Without the directory,
    cluster_label_maintenance's GC-down-to-the-rebuild would refuse to
    run on a corpus whose v2 graph has no clusters."""
    from flink_cep_task_spark.operators.dedup import (
        read_cluster_label_store,
        retire_label_epochs,
        write_cluster_label_store,
    )

    lab_path = str(tmp_path / "labels")
    full = spark.createDataFrame([(2, 1)], "doc_id LONG, cluster_id LONG")
    # only-singletons mapping: the star-edge filter drops every row
    singletons = spark.createDataFrame(
        [(1, 1), (2, 2)], "doc_id LONG, cluster_id LONG"
    )
    write_cluster_label_store(full, lab_path, epoch="base", dynamic=True)
    write_cluster_label_store(singletons, lab_path, epoch="rebuilt", dynamic=True)

    dirs = {os.path.basename(d) for d in glob.glob(os.path.join(lab_path, "epoch=*"))}
    assert dirs == {"epoch=base", "epoch=rebuilt"}
    assert read_cluster_label_store(spark, lab_path, "rebuilt").count() == 0

    stats = retire_label_epochs(spark, lab_path, keep=["rebuilt"])
    assert stats == {"retired": ["base"], "kept": ["rebuilt"]}
    # the surviving empty epoch still reads back as the empty mapping
    assert read_cluster_label_store(spark, lab_path, "rebuilt").count() == 0
