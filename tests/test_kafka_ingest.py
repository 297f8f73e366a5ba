"""Kafka ingest topology end-to-end — without a broker.

The reference ingests metrics on one channel and rules on another
(CEPTaskRunner.java:31,37); our production metric channel for that
topology is `metric_source(kind="kafka")`. No kafka connector jar or
broker exists in this container, so the connector READ is substituted
with a file-backed stream shaped to the exact kafka record wire schema
(kafka_shaped_file_records) injected through metric_source's `records`
seam — everything downstream of the connector (binary value decode, JSON
parse, bad-line drop, fan-out, windowed aggregation, threshold) runs
unmodified and is asserted equal to the batch engine on the same lines."""

from __future__ import annotations

import json
import uuid

from pyspark.sql import functions as F

from flink_cep_task_spark.plans.cep import evaluate_rules
from flink_cep_task_spark.rules import Rule
from flink_cep_task_spark.sources.jsonline import parse_metric_lines
from flink_cep_task_spark.streaming.pipeline import (
    build_streaming_cep,
    kafka_shaped_file_records,
    metric_source,
    run_to_memory,
)
from tests.test_streaming import FLUSH_TAG, RULES, _events, _write_chunks


def test_kafka_record_stream_schema_matches_connector_wire(spark, tmp_path):
    """The fake must present the connector's exact column set/types —
    otherwise the test exercises a different decode than production."""
    rec = kafka_shaped_file_records(spark, str(tmp_path))
    assert [(f.name, f.dataType.simpleString()) for f in rec.schema.fields] == [
        ("key", "binary"),
        ("value", "binary"),
        ("topic", "string"),
        ("partition", "int"),
        ("offset", "bigint"),
        ("timestamp", "timestamp"),
        ("timestampType", "int"),
    ]


def test_kafka_ingest_end_to_end_matches_batch(spark, tmp_path):
    """metric_source(kind="kafka") over kafka-shaped records, through the
    full windowed CEP pipeline, equals the batch engine — including the
    drop of a malformed payload and a bad-measure line injected into the
    stream (the connector value is UNTRUSTED bytes)."""
    events = _events(120)
    lines = [json.dumps(e) for e in events]
    # corrupt payloads the decode must drop, not crash on (ANSI-mode
    # try_cast contract): non-JSON bytes and a non-numeric measure
    lines.insert(7, "this is not json {")
    lines.insert(23, json.dumps({"eventTime": events[0]["eventTime"], "t_g": "g0", "m": "NaNope"}))
    src = _write_chunks(
        tmp_path,
        events,  # only for pusher files + mtime ladder; data rewritten below
    )
    # rewrite the chunk files with the corrupted line set, preserving each
    # file's mtime (Spark's file source orders by modification time — a
    # fresh mtime would deliver data AFTER the watermark pushers and the
    # whole stream would drop as late)
    import os

    data_files = sorted(
        f for f in os.listdir(src) if not f.startswith("zz_flush")
    )
    chunk = max(1, len(lines) // len(data_files))
    for i, fname in enumerate(data_files):
        path = os.path.join(src, fname)
        stat = os.stat(path)
        part = lines[i * chunk :] if i == len(data_files) - 1 else lines[i * chunk : (i + 1) * chunk]
        with open(path, "w") as fh:
            fh.write("\n".join(part))
        os.utime(path, (stat.st_atime, stat.st_mtime))

    records = kafka_shaped_file_records(spark, src, max_files_per_trigger=1)
    metrics = metric_source(spark, "kafka", records=records)
    windowed, global_s = build_streaming_cep(metrics, spark, RULES, watermark="1 minute")
    assert global_s is None
    name = f"kafka_{uuid.uuid4().hex[:8]}"
    run_to_memory(windowed, name, "append", str(tmp_path / "ckpt_kafka"))
    got = (
        spark.table(name).filter(~F.col("group_id").contains(FLUSH_TAG)).collect()
    )

    batch_metrics = parse_metric_lines(
        spark.createDataFrame([(ln,) for ln in lines], ["value"])
    )
    expected = evaluate_rules(spark, batch_metrics, RULES).collect()

    key = lambda r: (
        r.rule_id, r.group_id, r.window_start, r.window_end, r.agg_type, r.agg_value
    )
    assert sorted(map(key, got)) == sorted(map(key, expected))
    assert len(got) > 0
