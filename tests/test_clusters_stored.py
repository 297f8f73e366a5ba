"""Merge semantics of the incremental clustering.

The gate already hash-matches dedup_clusters_stored against the
full-recompute recursive-CTE oracle on the fixtures; this file pins the
MERGE cases on a synthetic corpus/batch split where the expectations
are known by construction: an incoming near-duplicate must JOIN its
corpus cluster (store label + new incoming↔corpus edge), two incoming
near-duplicates must form a NEW cluster (incoming↔incoming edges never
touch the store), untouched corpus clusters must survive verbatim, and
a dissimilar incoming doc stays a singleton. Also asserts the identity
claim directly: stored-merge output == dedup_clusters over the full
table."""

from __future__ import annotations

import pytest

import flink_cep_task_spark.operators.dedup as D

BASE = "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
OTHER = "kilo lima mike november oscar papa quebec romeo sierra tango "

DOCS = [
    # corpus cluster {1, 2}: near-identical long docs
    (1, BASE * 6 + "one", "src1"),
    (2, BASE * 6 + "two", "src1"),
    # corpus singleton
    (3, OTHER * 6, "src2"),
    # incoming near-dup of the {1,2} cluster -> must merge into it
    (10, BASE * 6 + "ten", "src0"),
    # incoming pair -> new cluster {11, 12} (vocabulary disjoint from
    # BOTH corpus docs — shingle SETS dedupe repeats, so any shared
    # cycle words would overlap doc 3 heavily)
    (11, "red orange yellow green blue indigo violet cyan magenta teal " * 6 + "x", "src0"),
    (12, "red orange yellow green blue indigo violet cyan magenta teal " * 6 + "y", "src0"),
    # incoming singleton (shares nothing)
    (13, "whiskey xray yankee zulu " * 12, "src0"),
]


@pytest.fixture(scope="module")
def stores(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cl_inc")
    docs = spark.createDataFrame(DOCS, "doc_id LONG, text STRING, source STRING")
    corpus = docs.filter(docs.source != D.INCREMENTAL_INCOMING_SOURCE)
    cl_path = str(d / "clusters")
    D.dedup_clusters(corpus).write.mode("overwrite").parquet(cl_path)
    sig_path = str(d / "signatures")
    D.write_minhash_signature_store(docs, sig_path)
    D.release_caches()
    return docs, cl_path, sig_path


def test_incremental_merge_cases(spark, stores):
    docs, cl_path, sig_path = stores
    cl = spark.read.parquet(cl_path).select("doc_id", "cluster_id")
    sig = spark.read.parquet(sig_path)
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in D.dedup_clusters_from_store(docs, cl, sig).collect()
    }
    assert got[1] == (1, True) and got[2] == (1, False)  # corpus cluster intact
    assert got[10] == (1, False)  # incoming joined the corpus cluster
    assert got[3] == (3, True)  # untouched corpus singleton
    assert got[11] == (11, True) and got[12] == (11, False)  # new batch cluster
    assert got[13] == (13, True)  # dissimilar incoming stays a singleton


def test_incremental_equals_full_recompute(spark, stores):
    docs, cl_path, sig_path = stores
    cl = spark.read.parquet(cl_path).select("doc_id", "cluster_id")
    sig = spark.read.parquet(sig_path)
    inc = {
        r["doc_id"]: r["cluster_id"]
        for r in D.dedup_clusters_from_store(docs, cl, sig).collect()
    }
    full = {
        r["doc_id"]: r["cluster_id"] for r in D.dedup_clusters(docs).collect()
    }
    D.release_caches()
    assert inc == full
