"""The composed cluster-label lifecycle (VERDICT r12 task #1):
plans/datapipe.cluster_label_maintenance runs day-1 advance → recrawl
re-admission → rebuild_label_epoch (split) → retire_label_epochs (GC)
→ day-2 probe consuming the rebuilt store, as ONE registered query.

This file pins the SPLIT CRUX with a crafted near-dup graph (the gated
oracle at sf0.01 pins the end-to-end wiring, but the testdata recrawl
may not place a re-fetched doc inside a cluster, so the split itself
needs a fixture built for it):

  * X (doc 60, src0 — doc_id % RECRAWL_MOD == 0, so the cycle
    re-fetches it) shares exactly 15 of 29 union 3-shingles with corpus
    doc A2 — Jaccard 0.517 >= tau(0.5): a near-dup on day 1;
  * the recrawl appends RECRAWL_SUFFIX (3 words → 3 new shingles):
    15/32 = 0.469 < tau — the X~A2 edge is DEAD in the v2 graph;
  * day 1 must therefore cluster X into A's component (via the base
    epoch + batch edges), and day 2 — probing from the REBUILT epoch
    after GC — must show X split back out, which only happens if the
    re-admission genuinely overwrote X's signatures AND the rebuild
    genuinely recomputed from the current store AND the GC kept the
    right epoch.

The DuckDB oracle (CLUSTER_LABEL_MAINTENANCE_SQL) is replayed over the
same fixture, so the crafted case is hash-checked end-to-end too.
"""

from __future__ import annotations

import hashlib
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from tests.test_store_compaction import _cw_txt

A1 = _cw_txt(1, 24)
A2 = _cw_txt(6, 29)
# words 13..36: 17-word overlap with A2 → 15 shared 3-shingles;
# J(v1) = 15/(22+22-15) = 0.517 >= 0.5; with the 3-word recrawl suffix
# J(v2) = 15/(22+25-15) = 0.469 < 0.5
X = _cw_txt(13, 36)
U = " ".join(f"uu{i:02d}" for i in range(1, 25))  # non-refetched src0 doc
Y = " ".join(f"qq{i:02d}" for i in range(1, 25))  # day-2 doc, unrelated
Z = " ".join(f"rr{i:02d}" for i in range(1, 25))  # day-3 doc, never in scope

ROWS = [
    (1, A1, "en", "base"),
    (2, A2, "de", "base"),
    (60, X, "en", "src0"),   # 60 % RECRAWL_MOD == 0 → re-fetched
    (61, U, "en", "src0"),
    (40, Y, "en", "src1"),
    (41, Z, "en", "src2"),
]


def _write_fixture(tmp_path) -> str:
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    ids, texts, langs, sources = zip(*ROWS)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(sources, pa.string()),
            }
        ),
        os.path.join(sf_dir, "documents.parquet"),
    )
    return sf_dir


def _vhash(df) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(tuple(str(x) for x in r) for r in df.itertuples(index=False))
    return hashlib.md5(str(rows).encode()).hexdigest()


def test_lifecycle_splits_refetched_doc_and_survives_gc(spark, tmp_path):
    from flink_cep_task_spark.operators.dedup import release_caches
    from flink_cep_task_spark.plans.datapipe import (
        CLUSTER_LABEL_MAINTENANCE_SQL,
        cluster_label_maintenance,
    )

    sf_dir = _write_fixture(tmp_path)
    out = cluster_label_maintenance(spark, sf_dir).toPandas()
    release_caches()

    d1 = {
        int(r.doc_id): int(r.cluster_id)
        for r in out[out.day == 1].itertuples()
    }
    d2 = {
        int(r.doc_id): int(r.cluster_id)
        for r in out[out.day == 2].itertuples()
    }
    # day 1 (v1 text): X merges into A's component via the incremental
    # advance from the base epoch
    assert d1 == {1: 1, 2: 1, 60: 1, 61: 61}
    # day 2 (post-recrawl, post-rebuild, post-GC): the dead X~A2 edge is
    # split out — provable only through rebuild; an incremental advance
    # can never split (tests/test_recrawl.py) — while the untouched
    # corpus cluster and the non-refetched src0 doc are undisturbed
    assert d2 == {1: 1, 2: 1, 60: 60, 61: 61, 40: 40}

    # the retention rollup consumes the rebuilt clusters: src0 keeps
    # both docs on day 2 (X is canonical again), only one on day 1
    ret = {
        (int(r.day), r.source): (int(r.src_n_kept), int(r.src_n_docs))
        for r in out.itertuples()
    }
    assert ret[(1, "src0")] == (1, 2)
    assert ret[(2, "src0")] == (2, 2)
    assert ret[(2, "base")] == (1, 2)

    # and the crafted case hash-matches the registered DuckDB oracle
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    odf = con.execute(CLUSTER_LABEL_MAINTENANCE_SQL).df()
    assert len(out) == len(odf)
    assert _vhash(out) == _vhash(odf)
