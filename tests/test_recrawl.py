"""Recrawl semantics (VERDICT r10 task #2): a day-2 re-crawl of a day-1
doc with CHANGED text.

What must hold, and what this file pins:
  * per-doc stores OVERWRITE the doc's rows (the re-crawled source
    partition is dynamically overwritten by the one shared writer —
    no duplicate signature rows, new content);
  * additive COUNT stores don't double-count (the NB count store's
    batch partition is replaced, so count-merge ≡ refit over the
    CURRENT text);
  * the cluster-label store is STALE-BUT-SUPERSET: incremental label
    advances are CC merges and provably CANNOT split a cluster whose
    edge disappeared — the documented split mechanism is a full epoch
    rebuild from the current signature store (rebuild_label_epoch),
    after which retire_label_epochs GCs the superseded epochs.

Graph construction (sliding word windows, as tests/test_store_compaction
CHAIN3): corpus A1~A2 share 17/27 shingles; day-1 doc X_OLD ~ A2 only.
The recrawl replaces X's text with a disjoint vocabulary — the X~A2
edge disappears from the CURRENT near-dup graph.
"""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F
import pytest

from flink_cep_task_spark.operators.dedup import (
    CLUSTER_BASE_EPOCH,
    _cluster_from_pairs,
    append_minhash_signatures,
    dedup_clusters,
    dedup_clusters_from_store,
    minhash_pairs_from_store,
    read_cluster_label_store,
    rebuild_label_epoch,
    release_caches,
    retire_label_epochs,
    write_cluster_label_store,
    write_minhash_signature_store,
)

# the band-collision-verified sliding-window vocabulary from
# tests/test_store_compaction (collision is vocabulary-dependent — a
# fresh word list with the same overlap ratios need not collide)
from tests.test_store_compaction import _cw_txt as _txt

A1 = _txt(1, 24)
A2 = _txt(6, 29)
X_OLD = _txt(11, 34)  # ~ A2 only (17/27 shared 3-shingles >= tau)
X_NEW = " ".join(f"zz{i:02d}" for i in range(1, 25))  # disjoint vocabulary
Y = " ".join(f"qq{i:02d}" for i in range(1, 25))  # unrelated day-2 doc

SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING"
# doc 2 is non-'en' so the NB class prior (pos = lang='en') has both
# classes populated; lang plays no role in the dedup/clustering paths
CORPUS = [(1, A1, "en", "base"), (2, A2, "de", "base")]
DOCS_V1 = CORPUS + [(10, X_OLD, "en", "d1")]
DOCS_V2 = CORPUS + [(10, X_NEW, "en", "d1"), (40, Y, "en", "d2")]


def test_recrawl_overwrites_per_doc_rows_and_only_rebuild_splits(spark, tmp_path):
    docs_v1 = spark.createDataFrame(DOCS_V1, SCHEMA)
    docs_v2 = spark.createDataFrame(DOCS_V2, SCHEMA)
    sig_path = str(tmp_path / "signatures")
    lab_path = str(tmp_path / "labels")

    # corpus store + base label epoch (store-derived, as production)
    write_minhash_signature_store(docs_v1.filter(F.col("source") == "base"), sig_path)
    sig = spark.read.parquet(sig_path)
    write_cluster_label_store(
        _cluster_from_pairs(sig.select("doc_id"), minhash_pairs_from_store(sig)),
        lab_path,
        epoch=CLUSTER_BASE_EPOCH,
    )
    release_caches()

    # --- day 1: X_OLD merges into A's cluster; admit signatures + labels
    lab0 = read_cluster_label_store(spark, lab_path, CLUSTER_BASE_EPOCH)
    r1 = dedup_clusters_from_store(
        docs_v1, lab0, spark.read.parquet(sig_path), "d1"
    )
    assert {x["doc_id"]: x["cluster_id"] for x in r1.collect()} == {1: 1, 2: 1, 10: 1}
    append_minhash_signatures(docs_v1.filter(F.col("source") == "d1"), sig_path)
    write_cluster_label_store(r1, lab_path, epoch="d1", dynamic=True)
    old_sig = spark.read.parquet(sig_path).filter("doc_id = 10").collect()
    assert len(old_sig) == 1
    release_caches()

    # --- the RECRAWL: X re-fetched with changed text; its source
    # partition is re-admitted through the one shared writer
    append_minhash_signatures(docs_v2.filter(F.col("source") == "d1"), sig_path)
    rows = spark.read.parquet(sig_path).filter("doc_id = 10").collect()
    # overwritten, not duplicated — and genuinely the NEW content
    assert len(rows) == 1
    assert sorted(rows[0]["S"]) != sorted(old_sig[0]["S"])
    release_caches()

    # --- incremental advance CANNOT split: day-2 merge from the stale
    # d1 epoch keeps X in A's cluster even though the CURRENT graph has
    # no X~A2 edge (stored star edge 10→1 is itself fed back as an edge)
    lab1 = read_cluster_label_store(spark, lab_path, "d1")
    append_minhash_signatures(docs_v2.filter(F.col("source") == "d2"), sig_path)
    r2 = dedup_clusters_from_store(
        docs_v2, lab1, spark.read.parquet(sig_path), "d2"
    )
    inc = {x["doc_id"]: x["cluster_id"] for x in r2.collect()}
    assert inc[10] == 1, "incremental merge must retain the stale membership"
    assert inc[40] == 40
    write_cluster_label_store(r2, lab_path, epoch="d2", dynamic=True)
    release_caches()

    # stale-but-SUPERSET: every true cluster pair is inside an
    # incremental cluster (merges only ever union components)
    truth = {x["doc_id"]: x["cluster_id"] for x in dedup_clusters(docs_v2).collect()}
    assert truth == {1: 1, 2: 1, 10: 10, 40: 40}
    for a in truth:
        for b in truth:
            if truth[a] == truth[b]:
                assert inc[a] == inc[b], "incremental lost a true pair"
    release_caches()

    # --- the SPLIT mechanism: full epoch rebuild from the CURRENT
    # signature store (corpus text never re-shingled)
    rebuild_label_epoch(spark, sig_path, lab_path, epoch="rebuilt")
    lab_rb = read_cluster_label_store(spark, lab_path, "rebuilt")
    stars = {(r["doc_id"], r["cluster_id"]) for r in lab_rb.collect()}
    assert stars == {(2, 1)}, "rebuild must split X out (no star edge for 10)"
    # and a probe from the rebuilt epoch equals the from-scratch truth
    rb = dedup_clusters_from_store(
        docs_v2, lab_rb, spark.read.parquet(sig_path), "d2"
    )
    assert {x["doc_id"]: x["cluster_id"] for x in rb.collect()} == truth
    release_caches()

    # --- retention closes the loop: GC everything the rebuild superseded
    stats = retire_label_epochs(spark, lab_path, keep=["rebuilt"])
    assert stats["retired"] == [CLUSTER_BASE_EPOCH, "d1", "d2"]
    dirs = {os.path.basename(d) for d in glob.glob(os.path.join(lab_path, "epoch=*"))}
    assert dirs == {"epoch=rebuilt"}


def test_recrawl_nb_counts_do_not_double_count(spark, tmp_path):
    """The NB count store's admission batch is a dynamic partition
    overwrite: re-admitting a re-crawled day replaces that day's counts,
    so count-merge over (base ∪ d1) equals a from-scratch count over the
    CURRENT text — never base + old-d1 + new-d1."""
    from flink_cep_task_spark.operators.text import (
        nb_model_from_counts,
        write_nb_count_store,
    )

    docs_v1 = spark.createDataFrame(DOCS_V1, SCHEMA)
    docs_v2 = spark.createDataFrame([r for r in DOCS_V2 if r[3] != "d2"], SCHEMA)
    path = str(tmp_path / "nb_counts")
    write_nb_count_store(docs_v1.filter(F.col("source") == "base"), path, batch="base")
    write_nb_count_store(
        docs_v1.filter(F.col("source") == "d1"), path, batch="d1", dynamic=True
    )
    # recrawl: same batch key, changed text — REPLACES the d1 partition
    write_nb_count_store(
        docs_v2.filter(F.col("source") == "d1"), path, batch="d1", dynamic=True
    )
    merged = nb_model_from_counts(spark.read.parquet(path))

    scratch = str(tmp_path / "nb_scratch")
    write_nb_count_store(docs_v2, scratch, batch="all")
    refit = nb_model_from_counts(spark.read.parquet(scratch))

    def key(df):
        return sorted((r["kind"], r["tok"], r["w"]) for r in df.collect())

    assert key(merged) == key(refit)
    # and the replaced partition's content is genuinely the NEW text:
    # X_OLD-only vocabulary gone, X_NEW vocabulary present
    toks = {r["tok"] for r in spark.read.parquet(path).filter("kind = 'tok'").collect()}
    assert not toks & {"te30", "te31", "te32", "te33", "te34"}
    assert "zz01" in toks
    release_caches()


def test_composed_recrawl_pipeline_store_states(spark):
    """VERDICT r11 task #5: the recrawl exercised INSIDE the composed
    pipeline (daily_crawl_recrawl), not just at operator level. Pins the
    three store-state claims on the query's own forked stores: the
    re-fetched docs appear in day 2's composite batch, the signature
    store holds exactly ONE row per day-1 doc with the NEW content
    (overwrite, not append), and the NB count batch equals a recount
    over the CURRENT text (replace, never v1 + v2)."""
    from flink_cep_task_spark.operators.dedup import minhash_signature_rows
    from flink_cep_task_spark.operators.text import nb_count_rows
    from flink_cep_task_spark.plans.datapipe import (
        RECRAWL_SUFFIX,
        _recrawl_pred,
        _recrawl_stores,
        daily_crawl_recrawl,
    )
    from flink_cep_task_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    res = daily_crawl_recrawl(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    rp_ids = {r["doc_id"] for r in docs.filter(_recrawl_pred()).collect()}
    assert rp_ids, "fixture must contain recrawled docs"
    day2_ids = {r["doc_id"] for r in res if r["day"] == 2}
    assert rp_ids <= day2_ids, "re-fetched docs must ride day 2's batch"

    st = _recrawl_stores(spark, SF_DIR)  # per-process cache: same fork
    stored = (
        spark.read.parquet(st["signatures"]).filter("source = 'src0'").collect()
    )
    per_doc = {}
    for r in stored:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert all(len(v) == 1 for v in per_doc.values()), "overwrite, not append"
    docs2 = docs.withColumn(
        "text",
        F.when(
            _recrawl_pred(), F.concat(F.col("text"), F.lit(RECRAWL_SUFFIX))
        ).otherwise(F.col("text")),
    )
    b1v2 = docs2.filter("source = 'src0'")
    exp = {r["doc_id"]: r["k"] for r in minhash_signature_rows(b1v2).collect()}
    got = {d: rows[0]["k"] for d, rows in per_doc.items()}
    assert got == exp, "stored exact keys must be the NEW content's"
    v1k = {
        r["doc_id"]: r["k"]
        for r in minhash_signature_rows(docs.filter("source = 'src0'")).collect()
    }
    assert all(got[d] != v1k[d] for d in rp_ids), "recrawl must change the key"

    # NB replace: the src0 batch partition equals a recount over v2
    nb = spark.read.parquet(st["nb_counts"]).filter("batch = 'src0'")
    def counts(df):
        return {
            (r["kind"], r["tok"]): (r["c_pos"], r["c_neg"]) for r in df.collect()
        }
    assert counts(nb.drop("batch")) == counts(nb_count_rows(b1v2))
    release_caches()
