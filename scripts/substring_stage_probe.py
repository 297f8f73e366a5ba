"""Stage-isolation probe for dedup_substring (VERDICT r7 task #7).

dedup_substring is the costliest non-streaming operator per byte of text
(64x audit: 12.7x on 32 fixed cores). This probe decomposes its wall
into the two stages so a future regression in the fingerprint JOIN is
distinguishable from the (expected, bytes-proportional) in-row
extraction scan:

  stage A — extraction: _winnow_fps(documents) alone (k-gram hashing +
            window-min selection via higher-order functions, in-row,
            one scan) forced with a noop write;
  stage B — full query: extraction (persisted) + fp-key self-join +
            per-doc count joins.

join_overhead = full - extraction; if the extraction share stops
tracking ~bytes-scanned or join_overhead starts growing superlinearly,
the fp join (or the over-common cull) regressed. Results go into
SCALING.md. Builds ONLY scaled documents (the other tables aren't
touched by this operator). Usage: python scripts/substring_stage_probe.py
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

SCALES = (16, 64)


def build_scaled_docs(spark, k: int) -> str:
    # the EXACT corpus-scaling recipe the main audit uses — imported, so
    # the probe's numbers stay comparable with SCALING.md audit rows
    from scaling_audit import write_scaled_documents

    out = tempfile.mkdtemp(prefix=f"substr_stage_{k}x_")
    write_scaled_documents(spark, k, out)
    return out


def main() -> None:
    import __spark_entry__ as entrymod
    from flink_cep_task_spark.operators.dedup import _winnow_fps, dedup_substring
    from flink_cep_task_spark.session import get_spark
    from flink_cep_task_spark.sources.tables import load_table, widen_small_scan

    spark = entrymod._configure(
        get_spark(
            app_name="substr_stage_probe",
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
    )
    for k in SCALES:
        t = time.perf_counter()
        d = build_scaled_docs(spark, k)
        print(f"# built {k}x docs in {time.perf_counter()-t:.1f}s", flush=True)
        docs = widen_small_scan(load_table(spark, d, "documents"))
        row = {"scale": k}
        from flink_cep_task_spark.operators.dedup import release_caches

        for stage, frame in (
            ("extraction_s", lambda: _winnow_fps(docs)),
            ("full_s", lambda: dedup_substring(docs)),
        ):
            best = float("inf")
            for _rep in range(2):
                # drop the shared persisted-fingerprint cache so every rep
                # is COLD — otherwise full_s's second rep reads the cached
                # fps frame and measures the probe, not the query
                release_caches()
                t = time.perf_counter()
                frame().write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t)
            row[stage] = round(best, 2)
        row["join_overhead_s"] = round(row["full_s"] - row["extraction_s"], 2)
        row["extraction_share"] = round(row["extraction_s"] / row["full_s"], 2)
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
