"""Regenerate PLANS.md: the formatted physical plan of each flagship
query with the scale-relevant features called out. The assertions behind
these claims live in tests/test_plans.py — this artifact exists so a
reviewer can see the actual plans without running Spark.

Run: python scripts/plan_report.py   (rewrites PLANS.md in the repo root)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOWCASE = {
    "q6_forecast_revenue": (
        "Selective filters reach the parquet reader (PushedFilters) and the "
        "scan schema is pruned to the 4 touched columns — at 100 TB this is "
        "the difference between scanning a partition and scanning a table."
    ),
    "cep_multi_rule": (
        "Rules are DATA on the build side of one BroadcastNestedLoopJoin "
        "(tag-containment is a non-equi predicate; the rule table is KBs), "
        "then exactly ONE hash exchange on (rule, group, window) — the "
        "reference's keyBy — carries the whole multi-rule evaluation."
    ),
    "q3_shipping_priority": (
        "Dimension joins broadcast (BroadcastHashJoin); the lineitem fact "
        "scan never shuffles for the join, only for the final aggregate."
    ),
    "dedup_minhash_lsh": (
        "Banded equi-join on (band, signature): candidates come only from "
        "genuinely-colliding buckets; signatures are one Arrow-batched "
        "numpy pass (single ArrowEvalPython) and every exchange moves "
        "8-byte hashes, never document text."
    ),
    "zscore_outliers": (
        "Per-type moments partial-aggregate map-side, come back as a "
        "broadcast, and the enrichment pass is shuffle-free."
    ),
    "rag_retrieve": (
        "The |Q|x k neighbor set is the broadcast build side against the "
        "documents scan — document bodies never enter an exchange."
    ),
    "salted_hot_user_join": (
        "The skew leg AQE cannot cover: the hot side shards by a "
        "deterministic salt (Generate of the 0..n-1 sequence on the "
        "replicated side), the join keys on (user_id, shard), and a hot "
        "user's rows spread across n reducers."
    ),
    "curation_funnel": (
        "Pipeline-stage composition: gate, dedup and split flags collapse "
        "to doc_id-keyed rows before the per-source rollup — document "
        "text appears in no exchange, only inside dedup's md5 key "
        "projection."
    ),
    "dedup_substring": (
        "Winnowing substring dedup: k-gram hashing + window-min selection "
        "run IN-ROW (transform/slice/array_min below the explode), so the "
        "only exchange keys are the 32-byte fingerprint and doc ids — the "
        "document text never shuffles; the persisted fingerprint frame "
        "feeds the frequency cull, both self-join sides, and the per-doc "
        "counts from one InMemoryTableScan."
    ),
    "incremental_rollup": (
        "Incremental aggregate maintenance: the corpus side is a FileScan "
        "of the day-partitioned partial store (rows = |days| x "
        "|event_types| at any SF) and the single raw events scan carries "
        "the pushed GreaterThanOrEqual time cutoff — a daily run reads "
        "one day of events, never the corpus."
    ),
    "dedup_bloom_prune": (
        "Scan-side bloom pruning: the incoming batch reduces to a 16 KiB "
        "bitmap (bit_or aggregate bounded by the bitmap, not the batch) "
        "broadcast into the corpus scan as the BroadcastNestedLoopJoin "
        "condition, so non-matching corpus rows die before any exchange; "
        "only survivors reach the exact verify join."
    ),
    "heavy_hitters_report": (
        "Exact heavy hitters without a vocabulary shuffle: pass 1 is the "
        "MapInPandas Misra-Gries candidate sketch (bounded output per "
        "partition), pass 2 recounts ONLY candidates behind a "
        "BroadcastHashJoin — the keyed exchange moves partial counts of "
        "a bounded candidate set over a second linear token scan."
    ),
    "funnel_single_pass": (
        "The 3-stage sequential funnel in ONE scan and ONE user_id "
        "exchange: two cascaded running-min Window passes share the same "
        "sort, and the final per-user aggregate reuses the window's hash "
        "partitioning — no second exchange, no joins (the join-cascade "
        "formulation pays three scans and two shuffled joins)."
    ),
    "bucketed_user_join": (
        "Co-located storage layout: both sides are bucketed+sorted by "
        "user_id (one file per bucket), so the SortMergeJoin and the "
        "per-user aggregate above it run with ZERO Exchange nodes in the "
        "entire plan — the only sorts are partition-local."
    ),
}


def main() -> None:
    import __spark_entry__ as entrymod
    from flink_cep_task_spark.registry import all_queries
    from flink_cep_task_spark.session import get_spark

    spark = entrymod._configure(
        get_spark(app_name="plan_report", extra_conf={"spark.ui.showConsoleProgress": "false"})
    )
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    queries = all_queries()
    sf_dir = "/root/testdata/sf0.001"

    out = [
        "# PLANS — flagship physical plans\n",
        "Generated by `scripts/plan_report.py` at sf0.001 (plan shapes are",
        "scale-invariant; sizes differ). The properties described here are",
        "ASSERTED by `tests/test_plans.py` — this file is the human-readable",
        "copy.\n",
    ]
    for name, blurb in SHOWCASE.items():
        fn, _sql = queries[name]
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        # keep the operator tree, drop the (long) codegen subtree dumps
        lines = [ln.rstrip() for ln in plan.splitlines()]
        out.append(f"\n## {name}\n")
        out.append(blurb + "\n")
        out.append("```")
        out.extend(lines[:60])
        if len(lines) > 60:
            out.append(f"... ({len(lines) - 60} more lines)")
        out.append("```")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write("\n".join(out) + "\n")
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
