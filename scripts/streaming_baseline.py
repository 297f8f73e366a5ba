"""Fill BASELINE.md's streaming placeholders (VERDICT r8 task #2):
rows/s ingest and state-store footprint for the two streaming engine
paths, measured from StreamingQueryProgress on the same replay scaffold
the correctness gate runs.

  * cep_live_streaming  — the LIVE rule engine (applyInPandasWithState
    dynamic-window operator, per-micro-batch rule refresh)
  * cep_streaming_windows — the NATIVE windowed pipeline (built-in
    F.window aggs on the JVM state store; one tumbling + one SLIDING
    rule, so the sliding-window state row counts are in stateOperators)

Method: run each registry query at $SPARK_GRAFT_SF_DIR (default sf0.1,
events=100k rows) on local[$SPARK_GRAFT_CPUS]; streaming/pipeline.
await_stream captures the drained query's recentProgress; ingest rows/s
= total numInputRows / total triggerExecution seconds across all
micro-batches (availableNow replay: one data trigger + the no-data
watermark batch), state = the peak across batches of the summed
stateOperators numRowsTotal / memoryUsedBytes. Writes
STREAMING_BASELINE.json at the repo root (bench.py folds it into
BENCH_DETAIL) — paste the table into BASELINE.md when re-measuring.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# numInputRows counts rows per OPERATOR consumption of the source: the
# native windowed path unions TWO stateful aggregations (one per distinct
# window spec) over the same stream, so its progress reports 2 rows per
# source event. Divide back to per-EVENT ingest so the two paths'
# rows_per_s are comparable; the raw operator-level number is kept too.
SOURCE_CONSUMERS = {"cep_live_streaming": 1, "cep_streaming_windows": 2}


def _progress_metrics(progress: list[dict], consumers: int = 1) -> dict:
    rows = sum(p.get("numInputRows", 0) for p in progress)
    ms = sum(p.get("durationMs", {}).get("triggerExecution", 0) for p in progress)
    state_rows = max(
        (
            sum(so.get("numRowsTotal", 0) for so in p.get("stateOperators", []))
            for p in progress
        ),
        default=0,
    )
    state_bytes = max(
        (
            sum(so.get("memoryUsedBytes", 0) for so in p.get("stateOperators", []))
            for p in progress
        ),
        default=0,
    )
    return {
        "n_micro_batches": len(progress),
        "operator_input_rows": rows,
        "source_consumers": consumers,
        "event_rows": rows // consumers,
        "trigger_exec_s": round(ms / 1000.0, 3),
        "operator_rows_per_s": round(rows / (ms / 1000.0), 1) if ms else None,
        "event_rows_per_s": (
            round(rows / consumers / (ms / 1000.0), 1) if ms else None
        ),
        "peak_state_rows": state_rows,
        "peak_state_bytes": state_bytes,
    }


def main() -> None:
    from flink_cep_task_spark.registry import all_queries
    from flink_cep_task_spark.session import get_spark
    from flink_cep_task_spark.streaming import pipeline as P

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="streaming_baseline",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    queries = all_queries()
    out: dict = {"sf_dir": sf_dir, "cpus": int(cpus), "queries": {}}
    for name in ("cep_live_streaming", "cep_streaming_windows"):
        fn, _sql = queries[name]
        n_out = fn(spark, sf_dir).count()  # drain the replay end-to-end
        m = _progress_metrics(P.LAST_PROGRESS, SOURCE_CONSUMERS[name])
        m["output_rows"] = n_out
        out["queries"][name] = m
        print(name, json.dumps(m))
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STREAMING_BASELINE.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
