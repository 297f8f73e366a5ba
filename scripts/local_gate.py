"""Local replica of the driver's correctness gate, over the WHOLE registry.

The driver's CORRECTNESS_r*.json caps at the first 50 registered queries
(registry.DRIVER_GATE_CAP); everything in registry.OVERFLOW_LAST is only
checked locally. This script runs the full queries()/oracle_sql() contract
at sf0.01 — same comparison as the driver: row count + sorted-column set +
value hash over stringified sorted rows — and writes the result to
CORRECTNESS_LOCAL_r{N}.json, committed per round so the overflow half of
the gate is auditable without a full pytest run.

Usage:  python scripts/local_gate.py <round>   (e.g. 5)
Env:    SPARK_GRAFT_SF_DIR overrides the default /root/testdata/sf0.01.
Exits non-zero if any query mismatches or errors.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _value_hash(df) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(tuple(str(x) for x in r) for r in df.itertuples(index=False))
    return hashlib.md5(str(rows).encode()).hexdigest()


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    import duckdb

    import __spark_entry__ as entrymod
    from flink_cep_task_spark.session import get_spark

    spark = entrymod._configure(
        get_spark(
            app_name="local_gate",
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    results: dict[str, dict] = {}
    bad = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            if name not in osql:
                results[name] = {
                    "mode": "rows_only", "spark_rows": len(sdf),
                    "ok": True, "err": None,
                }
                print(f"{name}: rows-only ({time.time() - t0:.1f}s)", flush=True)
                continue
            odf = con.execute(osql[name]).df()
            rows_match = len(sdf) == len(odf)
            schema_match = sorted(sdf.columns) == sorted(odf.columns)
            hash_match = (
                rows_match and schema_match
                and _value_hash(sdf) == _value_hash(odf)
            )
            ok = rows_match and schema_match and hash_match
            bad += 0 if ok else 1
            results[name] = {
                "rows_match": rows_match,
                "schema_match": schema_match,
                "hash_match": hash_match,
                "spark_rows": len(sdf),
                "oracle_rows": len(odf),
                "err": None,
            }
        except Exception as exc:  # noqa: BLE001 — recorded per query
            bad += 1
            results[name] = {"err": f"{type(exc).__name__}: {exc}"[:400]}
        r = results[name]
        ok = r.get("err") is None and r.get("hash_match", r.get("ok", False))
        print(f"{name}: {'ok' if ok else 'FAIL'} ({time.time() - t0:.1f}s)", flush=True)

    out = {
        "round": rnd,
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_failed": bad,
        "results": results,
    }
    dest = os.path.join(REPO, f"CORRECTNESS_LOCAL_r{rnd:02d}.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"wrote {dest}: {len(results)} queries, {bad} failed", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
