"""Streaming session windows + within-watermark dedup: the streaming
variants must agree with their batch twins on the same data."""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import functions as F

from flink_cep_task_spark.operators.dedup import dedup_exact
from flink_cep_task_spark.sources.jsonline import parse_metric_lines
from flink_cep_task_spark.streaming.ops import (
    dedup_exact_stream,
    session_window_agg_df,
    sessionize_stream,
)
from flink_cep_task_spark.streaming.pipeline import await_stream


def _write_ordered(dirpath, docs: list[str]) -> None:
    t0 = time.time() - 60
    for i, content in enumerate(docs):
        p = dirpath / f"{i:04d}.json"
        p.write_text(content)
        os.utime(p, (t0 + i, t0 + i))


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    base_ms = 1_700_000_000_000
    # u1: two sessions (gap 45 min between event 2 and 3); u2: one session
    events = [
        {"eventTime": base_ms, "t_user": "u1", "m": 0},
        {"eventTime": base_ms + 10 * 60_000, "t_user": "u1", "m": 0},
        {"eventTime": base_ms + 55 * 60_000, "t_user": "u1", "m": 0},
        {"eventTime": base_ms + 5 * 60_000, "t_user": "u2", "m": 0},
    ]
    flush = [
        {"eventTime": base_ms + 86_400_000, "t_user": "zz_flush", "m": 0},
        {"eventTime": base_ms + 86_460_000, "t_user": "zz_flush", "m": 0},
    ]
    src = tmp_path / "sess-src"
    src.mkdir()
    _write_ordered(src, [json.dumps(e) for e in events + flush])

    lines = spark.readStream.option("maxFilesPerTrigger", 1).text(str(src))
    metrics = parse_metric_lines(lines).select(
        "event_time", F.element_at("tags", "t_user").alias("user_id")
    )
    out = sessionize_stream(metrics, watermark="1 minute")
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True).start()
    )
    await_stream(q, 120)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table(name).collect()
        if r.user_id != "zz_flush"
    }

    batch_ev = spark.createDataFrame(
        [(e["t_user"], e["eventTime"] // 1000) for e in events],
        ["user_id", "ts_raw"],
    ).select("user_id", F.timestamp_seconds(F.col("ts_raw")).alias("ts_sec"))
    expected = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in session_window_agg_df(batch_ev).collect()
    }
    assert got == expected
    assert len(got) == 3  # u1 × 2 sessions + u2 × 1


def test_followed_by_stream_matches_batch(spark, tmp_path):
    """Stream-stream interval join == the batch range join on the same
    events (A=click followed by B=purchase within 30 min, per user)."""
    from flink_cep_task_spark.streaming.ops import followed_by_stream

    base_ms = 1_700_000_000_000
    mk = lambda off_min, u, et: {
        "eventTime": base_ms + off_min * 60_000, "t_user": u, "t_et": et, "m": 0,
    }
    events = [
        mk(0, "u1", "click"),
        mk(10, "u1", "purchase"),     # match (10 min)
        mk(20, "u1", "click"),
        mk(55, "u1", "purchase"),     # matches click@20 (35>30? no) — gap 35min: NO
        mk(70, "u1", "click"),
        mk(80, "u1", "purchase"),     # match (10 min); also click@20? gap 60: no
        mk(5, "u2", "click"),
        mk(30, "u2", "purchase"),     # match (25 min)
        mk(0, "u3", "purchase"),      # purchase before any click: no
    ]
    flush = [
        {"eventTime": base_ms + 86_400_000, "t_user": "zz", "t_et": "noop", "m": 0},
        {"eventTime": base_ms + 86_460_000, "t_user": "zz", "t_et": "noop", "m": 0},
    ]
    src = tmp_path / "fb-src"
    src.mkdir()
    _write_ordered(src, [json.dumps(e) for e in events + flush])

    lines = spark.readStream.option("maxFilesPerTrigger", 1).text(str(src))
    metrics = parse_metric_lines(lines).select(
        "event_time",
        F.element_at("tags", "t_user").alias("user_id"),
        F.element_at("tags", "t_et").alias("event_type"),
    )
    out = followed_by_stream(metrics)
    name = f"fb_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_fb"))
        .trigger(availableNow=True).start()
    )
    await_stream(q, 120)
    got = {
        (r.user_id, r.first_ts, r.then_ts)
        for r in spark.table(name).collect()
    }
    base_s = base_ms // 1000
    expected = {
        ("u1", base_s + 0 * 60, base_s + 10 * 60),
        ("u1", base_s + 70 * 60, base_s + 80 * 60),
        ("u2", base_s + 5 * 60, base_s + 30 * 60),
    }
    assert got == expected


def test_streaming_dedup_matches_batch(spark, tmp_path):
    base_ms = 1_700_000_000_000
    texts = {
        0: "the quick brown fox",
        1: "lazy dogs sleep",
        2: "The  quick brown fox!",   # dup of 0 after normalization
        3: "entirely different text",
        4: "lazy dogs sleep",          # dup of 1
    }
    docs = [
        {"eventTime": base_ms + i * 60_000, "doc_id": i, "text": t}
        for i, t in texts.items()
    ]
    src = tmp_path / "dedup-src"
    src.mkdir()
    _write_ordered(src, [json.dumps(d) for d in docs])

    stream = (
        spark.readStream.schema("eventTime long, doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .select(
            F.timestamp_millis(F.col("eventTime")).alias("event_time"),
            "doc_id",
            "text",
        )
    )
    out = dedup_exact_stream(stream, watermark="1 minute")
    name = f"dd_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .trigger(availableNow=True).start()
    )
    await_stream(q, 120)
    survivors = {r.doc_id for r in spark.table(name).collect()}

    # batch twin: survivors = canonical (lowest doc_id per normalized text)
    batch_docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )
    canonical = {
        r.canonical_id for r in dedup_exact(batch_docs).collect()
    }
    assert survivors == canonical == {0, 1, 3}


def test_kafka_records_to_metrics_shape(spark):
    """The kafka branch of metric_source minus the connector: a
    kafka-shaped batch (binary key/value + topic/partition/offset columns,
    exactly what format('kafka').load() yields) through the shared
    kafka_records_to_metrics decode — JSON payloads parse to Metric rows,
    junk payloads drop (P1/P2)."""
    import json

    from flink_cep_task_spark.streaming.pipeline import kafka_records_to_metrics

    docs = [
        {"eventTime": 1_700_000_000_000, "t_g": "g0", "cpu_usage": 55},
        {"eventTime": 1_700_000_060_000, "t_g": "g1", "cpu_usage": 70},
    ]
    payloads = [json.dumps(d).encode() for d in docs] + [b"junk {", None]
    rows = [
        (b"k", v, "metrics", 0, i, None, 0)
        for i, v in enumerate(payloads)
    ]
    records = spark.createDataFrame(
        rows,
        "key BINARY, value BINARY, topic STRING, partition INT, offset LONG, "
        "timestamp TIMESTAMP, timestampType INT",
    )
    got = kafka_records_to_metrics(records).collect()
    assert {
        (r.tags["t_g"], int(r.metrics["cpu_usage"]),
         int(r.event_time.timestamp() * 1000))
        for r in got
    } == {("g0", 55, 1_700_000_000_000), ("g1", 70, 1_700_000_060_000)}


def test_enrich_stream_matches_batch(spark, tmp_path):
    """Stream-static broadcast enrichment == the same join in batch, with
    dim-missing keys kept (left join)."""
    import uuid as _uuid

    from flink_cep_task_spark.streaming.ops import enrich_stream

    src = tmp_path / f"enrich-{_uuid.uuid4().hex[:8]}"
    src.mkdir()
    rows = [(i, 1_700_000_000 + i * 60, f"u{i % 5}") for i in range(40)]
    spark.createDataFrame(rows, "event_id LONG, ts_s LONG, user STRING").write.parquet(
        str(src / "data"), mode="overwrite"
    )
    dim = spark.createDataFrame(
        [(f"u{i}", f"seg{i % 2}") for i in range(3)],  # u3/u4 missing
        "user STRING, segment STRING",
    )
    stream = spark.readStream.schema("event_id LONG, ts_s LONG, user STRING").parquet(
        str(src / "data")
    )
    name = f"enr_{_uuid.uuid4().hex[:8]}"
    q = (
        enrich_stream(stream, dim, key="user")
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enr"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table(name)
    batch = spark.read.parquet(str(src / "data")).join(
        dim, on="user", how="left"
    )
    key = lambda r: (r.event_id, r.user, r.segment)
    assert sorted(map(key, got.collect())) == sorted(map(key, batch.collect()))
    assert got.filter(F.col("segment").isNull()).count() > 0  # left-join kept


def test_rocksdb_state_store_matches_default_provider(spark):
    """Scale story for streaming state: the default HDFS-backed state
    store holds every key in executor heap — at 100 TB key cardinalities
    the store must spill, which Spark's built-in RocksDB provider does
    natively. This proves the engine's streaming path runs unmodified on
    RocksDB state and produces bit-identical results, so the provider is
    a pure deployment conf (set spark.sql.streaming.stateStore.
    providerClass on the cluster), not a code change."""
    from flink_cep_task_spark.plans.cep_queries import q_streaming_windows
    from tests.conftest import SF_DIR

    key = "spark.sql.streaming.stateStore.providerClass"
    default = spark.conf.get(key)
    baseline = sorted(map(tuple, q_streaming_windows(spark, SF_DIR).collect()))
    assert baseline, "empty baseline makes the comparison vacuous"
    try:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        rocks = sorted(map(tuple, q_streaming_windows(spark, SF_DIR).collect()))
    finally:
        spark.conf.set(key, default)
    assert rocks == baseline


def test_followed_by_timeout_stream_emits_unmatched(spark, tmp_path):
    """LEFT OUTER stream-stream interval join: matched clicks carry their
    purchase; clicks with NO purchase within 30 min emit with NULL
    then_ts once the watermark passes their horizon (the CEP negation /
    abandoned-cart pattern — inexpressible in the reference, whose only
    trigger is an arriving event)."""
    from flink_cep_task_spark.streaming.ops import followed_by_timeout_stream

    base_ms = 1_700_000_000_000
    mk = lambda off_min, u, et: {
        "eventTime": base_ms + off_min * 60_000, "t_user": u, "t_et": et, "m": 0,
    }
    events = [
        mk(0, "u1", "click"),
        mk(10, "u1", "purchase"),     # matched (10 min)
        mk(20, "u1", "click"),        # next purchase is 35 min away: TIMEOUT
        mk(55, "u1", "purchase"),
        mk(5, "u2", "click"),         # no purchase at all: TIMEOUT
    ]
    # watermarks sit BELOW the per-side type filters, so the pushers must
    # pass those filters: one future click advances the A-side watermark,
    # purchases advance B; the final purchase runs one more micro-batch so
    # the just-advanced watermark actually evicts + emits unmatched state.
    # (The zz click itself stays unmatched in state — its own horizon is
    # never passed — and zz rows are excluded from the assertion.)
    flush = [
        {"eventTime": base_ms + 86_400_000, "t_user": "zz", "t_et": "click", "m": 0},
        {"eventTime": base_ms + 86_400_000, "t_user": "zz", "t_et": "purchase", "m": 0},
        {"eventTime": base_ms + 86_460_000, "t_user": "zz", "t_et": "purchase", "m": 0},
    ]
    src = tmp_path / "fbt-src"
    src.mkdir()
    _write_ordered(src, [json.dumps(e) for e in events + flush])

    lines = spark.readStream.option("maxFilesPerTrigger", 1).text(str(src))
    metrics = parse_metric_lines(lines).select(
        "event_time",
        F.element_at("tags", "t_user").alias("user_id"),
        F.element_at("tags", "t_et").alias("event_type"),
    )
    out = followed_by_timeout_stream(metrics)
    name = f"fbt_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_fbt"))
        .trigger(availableNow=True).start()
    )
    await_stream(q, 120)
    got = {
        (r.user_id, r.first_ts, r.then_ts)
        for r in spark.table(name).collect()
        if r.user_id != "zz"
    }
    base_s = base_ms // 1000
    expected = {
        ("u1", base_s + 0 * 60, base_s + 10 * 60),   # matched
        ("u1", base_s + 20 * 60, None),              # timed out
        ("u2", base_s + 5 * 60, None),               # timed out
    }
    assert got == expected
