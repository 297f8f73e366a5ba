"""Streaming edition of the daily crawl cycle (VERDICT r10 task #5):
day-1 replayed as a multi-micro-batch file stream, the decision probe and
the admission row derivations running per batch in foreachBatch.

Pins: (1) the replay is genuinely multi-batch (4 bids); (2) the unioned
decisions equal daily_crawl_pipeline's day-1 slice bit-for-bit (the
batch-boundary-invariance claim); (3) the unioned bid=N admission rows
equal the whole-day derivations the batch store writers use — signature
and fingerprint rows as sets, NB counts after re-aggregation (counts are
additive across micro-batches).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from flink_cep_task_spark.operators import dedup as D
from flink_cep_task_spark.operators.text import nb_count_rows
from flink_cep_task_spark.sources.tables import load_table
from tests.conftest import SF_DIR

NUM_MH = 16


def _sig_key(rows):
    return {
        r["doc_id"]: (
            r["source"],
            r["k"],
            tuple(r[f"mh{i}"] for i in range(NUM_MH)),
            tuple(sorted(r["S"])) if r["S"] is not None else None,
        )
        for r in rows
    }


def test_daily_crawl_stream_multibatch_replay_and_admissions(spark):
    from flink_cep_task_spark.plans.datapipe import (
        daily_crawl_pipeline,
        daily_crawl_stream_run,
    )

    decisions, work, n_batches = daily_crawl_stream_run(spark, SF_DIR)
    assert n_batches == 4, "replay must span multiple micro-batches"
    got = sorted(tuple(str(x) for x in r) for r in decisions.collect())

    # decisions == the batch pipeline's day-1 slice (same stores, same
    # stages — batch boundaries cannot change a per-doc decision)
    batch = daily_crawl_pipeline(spark, SF_DIR).filter("day = 1").drop("day")
    exp = sorted(tuple(str(x) for x in r) for r in batch.collect())
    assert got and got == exp

    day1 = load_table(spark, SF_DIR, "documents").filter(
        F.col("source") == D.INCREMENTAL_INCOMING_SOURCE
    )

    # signature admission: union of the bid areas == the whole-day
    # derivation (same function the batch store writer calls)
    stream_sig = spark.read.parquet(os.path.join(work, "adm_sig")).drop("bid")
    assert _sig_key(stream_sig.collect()) == _sig_key(
        D.minhash_signature_rows(day1).collect()
    )

    # fingerprint admission: multiset equality
    stream_fp = sorted(
        (r["doc_id"], r["fp"], r["source"])
        for r in spark.read.parquet(os.path.join(work, "adm_fp")).drop("bid").collect()
    )
    whole_fp = sorted(
        (r["doc_id"], r["fp"], r["source"])
        for r in D.winnow_fingerprint_rows(day1).collect()
    )
    assert stream_fp == whole_fp and stream_fp

    # NB counts: bid-sharded counts re-aggregate to the day's exact
    # counts (additivity — the property nb_model_from_counts relies on)
    def _agg_counts(df):
        return {
            (r["kind"], r["tok"]): (r["c_pos"], r["c_neg"])
            for r in df.groupBy("kind", "tok")
            .agg(
                F.sum("c_pos").cast("long").alias("c_pos"),
                F.sum("c_neg").cast("long").alias("c_neg"),
            )
            .collect()
        }

    stream_nb = _agg_counts(
        spark.read.parquet(os.path.join(work, "adm_nb")).drop("bid")
    )
    whole_nb = _agg_counts(nb_count_rows(day1))
    assert stream_nb == whole_nb and len(stream_nb) > 1
    D.release_caches()


def test_stream_day2_consumes_compacted_admissions(spark):
    """VERDICT r11 task #4 crux: day 2 probed against stores the STREAM
    advanced. The compaction folds bid=N areas into the real day-1
    store partitions, the per-doc partitions land byte-equivalent rows
    to the batch writer's, and the day-2 decisions equal the batch
    pipeline's day-2 slice bit-for-bit."""
    from flink_cep_task_spark.plans.datapipe import (
        _rolling_sig_store,
        daily_crawl_pipeline,
        daily_crawl_stream_day2,
    )

    got = sorted(
        tuple(str(x) for x in r)
        for r in daily_crawl_stream_day2(spark, SF_DIR).collect()
    )
    exp = sorted(
        tuple(str(x) for x in r)
        for r in daily_crawl_pipeline(spark, SF_DIR)
        .filter("day = 2")
        .drop("day")
        .collect()
    )
    assert got and got == exp

    # the compacted day-1 signature partition IS the batch writer's
    # content (rows, not just answers)
    day1 = load_table(spark, SF_DIR, "documents").filter(
        F.col("source") == D.INCREMENTAL_INCOMING_SOURCE
    )
    stored = spark.read.parquet(_rolling_sig_store(spark, SF_DIR)).filter(
        F.col("source") == D.INCREMENTAL_INCOMING_SOURCE
    )
    assert _sig_key(stored.collect()) == _sig_key(
        D.minhash_signature_rows(day1).collect()
    )
    D.release_caches()


def test_stream_recrawl_readmission_replaces_not_merges(spark):
    """VERDICT r12 task #4 crux: a RECRAWL day through the streaming
    edition. The re-fetched docs replay as micro-batches; compaction
    must leave every store partition IDENTICAL to a from-scratch
    recount over the day's CURRENT text — per-doc stores via the
    surgical anti-join swap, the NB count store via delta (retraction)
    merge. A first-admission-style plain SUM would double-count: the
    'docs' class row alone would inflate by the re-fetched doc count,
    which this test measures explicitly so the invariant has teeth."""
    from flink_cep_task_spark.operators.text import nb_count_rows
    from flink_cep_task_spark.plans.datapipe import (
        RECRAWL_SUFFIX,
        _recrawl_pred,
        _recrawl_stores,
        daily_crawl_recrawl,
        daily_crawl_stream_recrawl,
    )

    got = sorted(
        tuple(str(x) for x in r)
        for r in daily_crawl_stream_recrawl(spark, SF_DIR).collect()
    )
    D.release_caches()

    docs = load_table(spark, SF_DIR, "documents")
    rp = _recrawl_pred()
    docs2_day1 = docs.filter(
        F.col("source") == D.INCREMENTAL_INCOMING_SOURCE
    ).withColumn(
        "text",
        F.when(rp, F.concat(F.col("text"), F.lit(RECRAWL_SUFFIX))).otherwise(
            F.col("text")
        ),
    )
    n_refetched = docs2_day1.filter(rp).count()
    assert n_refetched > 0, "fixture must re-fetch at least one doc"

    st = _recrawl_stores(spark, SF_DIR)

    # per-doc stores: the day-1 partition IS the v2 recount's rows
    stored_sig = spark.read.parquet(st["signatures"]).filter(
        F.col("source") == D.INCREMENTAL_INCOMING_SOURCE
    )
    assert _sig_key(stored_sig.collect()) == _sig_key(
        D.minhash_signature_rows(docs2_day1).collect()
    )
    stored_fp = sorted(
        (r["doc_id"], r["fp"], r["source"])
        for r in spark.read.parquet(st["fingerprints"])
        .filter(F.col("source") == D.INCREMENTAL_INCOMING_SOURCE)
        .collect()
    )
    assert stored_fp == sorted(
        (r["doc_id"], r["fp"], r["source"])
        for r in D.winnow_fingerprint_rows(docs2_day1).collect()
    )

    # NB: the replaced batch partition == from-scratch v2 recount …
    def _counts(df):
        return {
            (r["kind"], r["tok"]): (r["c_pos"], r["c_neg"])
            for r in df.groupBy("kind", "tok")
            .agg(
                F.sum("c_pos").cast("long").alias("c_pos"),
                F.sum("c_neg").cast("long").alias("c_neg"),
            )
            .collect()
        }

    stored_nb = _counts(
        spark.read.parquet(st["nb_counts"]).filter(
            F.col("batch") == D.INCREMENTAL_INCOMING_SOURCE
        )
    )
    recount = _counts(nb_count_rows(docs2_day1))
    assert stored_nb == recount and len(stored_nb) > 1
    # … and measurably NOT the no-retraction merge: the class doc-count
    # row sums to the day's doc count, where a plain SUM of stored-v1 +
    # streamed-v2 assertions would read n_day1 + n_refetched (> n_day1,
    # since n_refetched > 0 above)
    n_day1 = docs2_day1.count()
    assert sum(stored_nb[("docs", None)]) == n_day1

    # stream-close ≡ batch-close: the day-3 probe answers bit-for-bit
    # what the all-batch recrawl cycle answers for its day 3
    exp = sorted(
        tuple(str(x) for x in r)
        for r in daily_crawl_recrawl(spark, SF_DIR)
        .filter("day = 3")
        .drop("day")
        .collect()
    )
    assert got and got == exp
    D.release_caches()


def test_daily_cycle_probe_ctx_is_result_identical_and_leaf_planned(spark):
    """Round-14 optimization pin: the materialized store-side probe
    frames (_daily_cycle_probe_ctx) change the per-micro-batch probe's
    PLAN — every signature/fingerprint store subtree becomes a
    checkpointed leaf — but not one row of its RESULT. Also pins the
    optimization's claim itself: the ctx plan carries no store parquet
    scans (they were re-analyzed and re-executed once per micro-batch
    before)."""
    from flink_cep_task_spark.operators.cache import release_caches
    from flink_cep_task_spark.operators.text import (
        nb_model_from_counts,
    )
    from flink_cep_task_spark.plans.datapipe import (
        _daily_cycle,
        _daily_cycle_probe_ctx,
        _rolling_fp_store,
        _rolling_nb_count_store,
        _rolling_sig_store,
    )
    from flink_cep_task_spark.sources.tables import load_table, widen_small_scan

    release_caches()
    day1 = D.INCREMENTAL_INCOMING_SOURCE
    sig_path = _rolling_sig_store(spark, SF_DIR)
    fp_path = _rolling_fp_store(spark, SF_DIR)
    nb_path = _rolling_nb_count_store(spark, SF_DIR)
    model = nb_model_from_counts(
        spark.read.parquet(nb_path).filter(F.col("batch") == "base")
    )
    pred = ~F.col("source").isin(*D.ROLLING_DAYS)
    docs = widen_small_scan(load_table(spark, SF_DIR, "documents"))

    plain = _daily_cycle(spark, docs, day1, sig_path, pred, model, fp_path)
    ctx = _daily_cycle_probe_ctx(spark, day1, sig_path, pred, fp_path)
    assert set(ctx) == {
        "exact_keys", "near_banded", "near_sets", "sub_ok", "sub_counts",
    }
    with_ctx = _daily_cycle(
        spark, docs, day1, sig_path, pred, model, fp_path, probe_ctx=ctx
    )

    rows = lambda df: sorted(tuple(str(x) for x in r) for r in df.collect())
    got, exp = rows(with_ctx), rows(plain)
    assert got and got == exp

    # the optimization claim: no store FileScan survives in the ctx plan
    plan = with_ctx._jdf.queryExecution().executedPlan().toString()
    store_scans = [
        ln for ln in plan.splitlines()
        if "FileScan parquet" in ln
        and ("signatures" in ln or "fingerprints" in ln)
    ]
    assert not store_scans, store_scans
    assert "ExistingRDD" in plan
    release_caches()
