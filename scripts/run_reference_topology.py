"""Run the reference's exact two-socket topology on this engine.

The reference job (CEPTaskRunner.java:31,37) reads metric JSON lines from
localhost:9999 and rule JSON lines from localhost:8888, evaluates the
live rule set, and prints threshold hits. This script is the drop-in
equivalent: metric socket → live dynamic-window CEP (rule CRUD takes
effect at the next micro-batch, fixing reference quirk Q6) → console
sink; the rule socket feeds the engine's rule changelog through the
socket→store bridge.

Usage (three terminals):

    nc -lk 9999           # metric channel
    nc -lk 8888           # rule channel
    python scripts/run_reference_topology.py [--metric-port 9999] \
        [--rule-port 8888] [--watermark "10 minutes"]

then paste rule lines (reference wire format, e.g.
{"ruleId": 1, "windowType": "tumbling", "windowMinutes": 2,
 "groupingKeyNames": ["t_g"], "aggregatorFunctionType": "SUM",
 "aggregateFieldName": "m", "limitOperatorType": ">", "limit": 10})
into 8888 and metric lines ({"eventTime": 1700000000000, "t_g": "a",
"m": 7}) into 9999. Matches print to the console as windows close
(event-time watermark — results are never lost to wall-clock, fixing
quirk Q4). Ctrl-C stops both queries.

The same wiring is exercised hermetically by tests/test_live_rules.py::
test_dual_socket_rules_and_metrics; this script exists so a human can
run the reference's demo workflow unchanged.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--metric-port", type=int, default=9999)
    ap.add_argument("--rule-port", type=int, default=8888)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--watermark", default="10 minutes")
    args = ap.parse_args()

    from flink_cep_task_spark.session import get_spark
    from flink_cep_task_spark.streaming.live import RuleFileStore, build_live_cep
    from flink_cep_task_spark.streaming.pipeline import (
        metrics_stream_from_socket,
        rules_socket_to_store,
    )

    spark = get_spark(app_name="reference_topology")
    work = tempfile.mkdtemp(prefix="ref_topo_")
    store = RuleFileStore(os.path.join(work, "rules.json"))

    bridge = rules_socket_to_store(
        spark, store, host=args.host, port=args.rule_port
    )
    metrics = metrics_stream_from_socket(spark, args.host, args.metric_port)
    out = build_live_cep(metrics, spark, store.path, watermark=args.watermark)
    q = (
        out.writeStream.format("console")
        .outputMode("append")
        .option("truncate", "false")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .start()
    )
    print(
        f"listening: metrics on {args.host}:{args.metric_port}, "
        f"rules on {args.host}:{args.rule_port} — Ctrl-C to stop",
        flush=True,
    )
    try:
        q.awaitTermination()
    except KeyboardInterrupt:
        pass
    finally:
        q.stop()
        bridge.stop()
        spark.stop()


if __name__ == "__main__":
    main()
