"""Scaling audit: measure headline operators at 1x / 4x / 16x the sf0.1
row counts and record the slope — the empirical side of the "would this
plan survive a 100x scale-up" question the plan audits (tests/test_plans
.py) answer structurally.

Method
------
Scaled inputs are derived from /root/testdata/sf0.1 (the driver's own
fixtures — the audit never invents distributions for the BASE data):

* events / lineitem: k shifted copies (event_id/user_id, l_orderkey
  offsets) — same value distributions, k x the rows and k x the user
  cardinality.
* documents: k copies with every token suffixed by the copy index, so
  copies are mutually DISSIMILAR (cross-copy Jaccard ~ 0) and the
  per-copy duplicate structure matches the base corpus. Without this the
  near-dup operators would legitimately produce quadratically growing
  OUTPUT (16-member clusters of identical docs), which measures cluster
  growth, not engine scaling.
* embeddings: k-1 additional pseudo-random corpora (md5-derived
  components, deterministic) — fresh vectors, so LSH buckets / IVF cells
  grow in COUNT, not in per-bucket occupancy.

Each (query, scale) runs twice; the MIN is recorded (the second run
strips the one-time plan-compile/codegen constant, which is fixed cost
at any scale and would otherwise flatten the measured slope at these
small absolute sizes).

Output: one JSON line per query to stdout plus SCALING.md-ready rows —
t1/t4/t16 seconds and the 16x/1x ratio. A ratio near 1 means constant
overhead still dominates at 1.6M events; materially BELOW 16 means the
plan scales sub-linearly in wall-clock on 32 cores; near or above 16
would flag a super-linear operator (none expected: the plan audits forbid
cartesians and unbounded candidate joins).

Run: python scripts/scaling_audit.py  (writes nothing to the repo).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SCALES = (1, 4, 16)
QUERIES = [
    "cep_multi_rule",
    "cep_many_rules",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "token_counts",
    "corpus_quality_report",
    "q1_pricing_summary",
    "sessionize_events",
    "zscore_outliers",
    "knn_bruteforce",
    "ann_lsh",
    "range_join_clicks",
    "semantic_dedup",
    # round-5 additions
    "salted_hot_user_join",
    "resample_ffill",
    "curation_funnel",
    "approx_distinct_report",
    # round-6 additions
    "cogroup_nearest_click",
    "dedup_incremental",
    "dedup_incremental_minhash",
    "dedup_incremental_minhash_stored",
    "cep_first_event_null_groups",
    "embedding_corr_pairs",
    "scd2_user_history",
    "state_asof_snapshot",
    "ann_pq",
    "ann_ivf_pq",
    # round-7 additions
    "dedup_substring",
    "incremental_rollup",
    "dedup_substring_stored",
    "dedup_bloom_prune",
    "heavy_hitters_report",
    "snapshot_diff",
    "funnel_single_pass",
    "event_transitions",
    "pii_redact_report",
    "bucketed_user_join",
    "cep_followed_by_stream",
    "cep_not_followed_by_stream",
    "ann_ivf_stored",
    "dedup_clusters_stored",
    "bpe_merges_report",
    # round-8 additions
    "bpe_apply_report",
    "quality_nb_classifier",
    "media_dedup_report",
    "quality_nb_stored",
    "quality_nb_stream",
    "bpe_apply_stored",
    # round-9 additions
    "dedup_incremental_minhash_rolling",
    "incremental_rollup_rolling",
    "ann_ivf_rolling",
    "dedup_substring_rolling",
    "quality_nb_rolling",
    # round-10 additions
    "dedup_clusters_rolling",
    "daily_crawl_pipeline",
    # round-11 additions
    "daily_crawl_stream",
    # round-12 additions
    "daily_crawl_stream_day2",
    "daily_crawl_recrawl",
    # round-13 additions
    "cluster_label_maintenance",
    "daily_crawl_stream_recrawl",
]
BASE = "/root/testdata/sf0.1"

# SPARK_GRAFT_SCALES=1,64 overrides for deeper audits (e.g. the 64x
# check of the round-6 batch, VERDICT r6 task #5) without paying the
# full roster at every scale.
if os.environ.get("SPARK_GRAFT_SCALES"):
    SCALES = tuple(int(x) for x in os.environ["SPARK_GRAFT_SCALES"].split(","))


def build_scaled_tpch(spark, k: int) -> str:
    """Referentially-consistent k× copies of the TPC-H-ish tables: every
    copy shifts its own keys AND the foreign keys into other copied
    tables by the same per-table stride, so join selectivities match the
    base corpus exactly; region/nation stay single-copy shared dims
    (their keys are not shifted anywhere)."""
    out = tempfile.mkdtemp(prefix=f"scale_tpch_{k}x_")
    strides = {}
    for t, keycols in (
        ("customer", ["c_custkey"]),
        ("supplier", ["s_suppkey"]),
        ("part", ["p_partkey"]),
        ("orders", ["o_orderkey", "o_custkey"]),
        (
            "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey"],
        ),
    ):
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        # stride for THIS table's primary key = its own row count; foreign
        # keys use the referenced table's stride (recorded earlier —
        # ordering above guarantees referenced tables come first)
        strides[t] = df.count()
        col_table = {
            "c_custkey": "customer",
            "s_suppkey": "supplier",
            "p_partkey": "part",
            "o_orderkey": "orders",
            "o_custkey": "customer",
            "l_orderkey": "orders",
            "l_partkey": "part",
            "l_suppkey": "supplier",
        }
        copies = []
        for i in range(k):
            c = df
            for col in keycols:
                c = c.withColumn(col, F.col(col) + F.lit(i * strides[col_table[col]]))
            copies.append(c)
        u = copies[0]
        for c in copies[1:]:
            u = u.unionByName(c)
        u.repartition(32).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    for t in ("region", "nation"):
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    return out


def write_scaled_documents(spark, k: int, out: str) -> None:
    """The documents leg of build_scaled, importable on its own (the
    substring stage probe scales ONLY documents): copy i suffixes every
    token with _i so copies share no k-grams — fingerprint/vocab bucket
    occupancy stays flat while bytes grow linearly."""
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n_docs = docs.count()
    dcopies = []
    for i in range(k):
        tagged = F.array_join(
            F.transform(
                F.split(F.col("text"), r"\s+"), lambda x: F.concat(x, F.lit(f"_{i}"))
            ),
            " ",
        )
        dcopies.append(
            docs.select(
                (F.col("doc_id") + i * n_docs).alias("doc_id"),
                (tagged if i else F.col("text")).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    ud = dcopies[0]
    for c in dcopies[1:]:
        ud = ud.unionByName(c)
    ud.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")


def build_scaled(spark, k: int) -> str:
    out = tempfile.mkdtemp(prefix=f"scale_{k}x_")

    ev = spark.read.parquet(f"{BASE}/events.parquet")
    n_ev = ev.count()
    copies = []
    for i in range(k):
        copies.append(
            ev.select(
                (F.col("event_id") + i * n_ev).alias("event_id"),
                "ts",
                (F.col("user_id") + i * 1_000_000).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    u.repartition(32).write.mode("overwrite").parquet(f"{out}/events.parquet")

    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    lcopies = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000))
        for i in range(k)
    ]
    ul = lcopies[0]
    for c in lcopies[1:]:
        ul = ul.unionByName(c)
    ul.repartition(32).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    write_scaled_documents(spark, k, out)

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n_emb = emb.count()
    ecopies = [emb]
    for i in range(1, k):
        # deterministic pseudo-random components in [-1, 1): fresh vectors
        # per copy so bucket/cell OCCUPANCY stays flat while counts grow
        def _comp(j, _i=i):
            h = F.md5(
                F.concat(
                    F.col("vec_id").cast("string"), F.lit(f"_{_i}_"), j.cast("string")
                )
            )
            raw = F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % 2000
            return (raw.cast("double") / 1000.0 - 1.0).cast("float")

        ecopies.append(
            emb.select(
                (F.col("vec_id") + i * n_emb).alias("vec_id"),
                F.transform(F.sequence(F.lit(0), F.lit(63)), _comp).alias("embedding"),
                "label",
            )
        )
    ue = ecopies[0]
    for c in ecopies[1:]:
        ue = ue.unionByName(c)
    ue.repartition(8).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


def main_tpch() -> None:
    """`python scripts/scaling_audit.py tpch` — the TPC-H variant behind
    SCALING.md's q-family tables: referentially-consistent 16× copies,
    every q-query timed min-of-2."""
    import __spark_entry__ as entrymod
    from flink_cep_task_spark.session import get_spark

    spark = entrymod._configure(
        get_spark(app_name="scaling_audit_tpch", extra_conf={"spark.ui.showConsoleProgress": "false"})
    )
    qs = entrymod.queries()
    t = time.perf_counter()
    d = build_scaled_tpch(spark, 16)
    print(f"# built tpch 16x in {time.perf_counter()-t:.1f}s -> {d}", flush=True)
    for name in sorted(n for n in qs if n.startswith("q")):
        best = float("inf")
        for _rep in range(2):
            t = time.perf_counter()
            qs[name](spark, d).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t)
        print(json.dumps({"query": name, "t16": round(best, 2)}), flush=True)
    spark.stop()


def main() -> None:
    import __spark_entry__ as entrymod
    from flink_cep_task_spark.session import get_spark

    spark = entrymod._configure(
        get_spark(app_name="scaling_audit", extra_conf={"spark.ui.showConsoleProgress": "false"})
    )
    qs = entrymod.queries()

    dirs = {}
    for k in SCALES:
        t = time.perf_counter()
        dirs[k] = build_scaled(spark, k)
        print(f"# built {k}x in {time.perf_counter()-t:.1f}s -> {dirs[k]}", flush=True)

    # per-cell CPU attribution via benchutil's meter (VERDICT r12 task
    # #3): ext_cpu_s = host CPU minus this process tree's over the
    # cell's interval — the mechanical tenant-pressure signal that
    # makes a scaling cell adjudicable the way bench numbers are
    from flink_cep_task_spark.benchutil import QueryMeter

    meter = QueryMeter()
    results = {}
    for name in QUERIES:
        row = {}
        loads = {}
        for k in SCALES:
            best = None
            for _rep in range(2):
                rec = meter.measure(
                    lambda: qs[name](spark, dirs[k])
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
                if best is None or rec["wall"] < best["wall"]:
                    best = rec
            row[k] = round(best["wall"], 2)
            loads[k] = {
                c: best[c]
                for c in ("cpu_total_s", "ext_cpu_s", "load_pre", "load_post")
                if c in best
            }
        hi, lo = max(SCALES), min(SCALES)
        ratio_key = f"ratio_{hi}x"
        row[ratio_key] = round(row[hi] / row[lo], 1) if row[lo] else None
        results[name] = row
        print(json.dumps({"query": name, **{f"t{k}": row[k] for k in SCALES},
                          ratio_key: row[ratio_key],
                          "loads": loads}), flush=True)

    hi, lo = max(SCALES), min(SCALES)
    print("\n| query | " + " | ".join(f"{k}x (s)" for k in SCALES)
          + f" | {hi}x/{lo}x |")
    print("|---" * (len(SCALES) + 2) + "|")
    for name, row in results.items():
        cells = " | ".join(str(row[k]) for k in SCALES)
        print(f"| {name} | {cells} | {row[f'ratio_{hi}x']} |")
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "tpch":
        main_tpch()
    else:
        # optional filter: `python scripts/scaling_audit.py only a,b,c`
        # re-audits a subset (new operators) without re-running the roster
        if len(sys.argv) > 2 and sys.argv[1] == "only":
            wanted = set(sys.argv[2].split(","))
            QUERIES[:] = [q for q in QUERIES if q in wanted]
        main()
