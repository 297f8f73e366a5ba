"""The session-shared cache tier must key on the INPUT DATASET, not just
the plan shape: Spark's canonicalized plan prints file relations with no
path (`Relation [none#…] parquet`), so two structurally-identical queries
over different datasets would collide — the scaling audit caught
knn/ann/minhash returning 1× results for 16× inputs. cache.persisted_shared
now folds source-file provenance into the key; this pins it."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_shared_cache_distinguishes_datasets(spark, tmp_path):
    from flink_cep_task_spark.operators.similarity import knn_bruteforce

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    r1 = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in knn_bruteforce(emb).collect()
    }

    # same schema, same row count, same plan SHAPE — different data: every
    # non-query vector flipped, so each query's neighbor ranking inverts
    alt_path = str(tmp_path / "alt_embeddings.parquet")
    emb.select(
        "vec_id",
        F.when(
            F.col("vec_id") >= 10, F.transform("embedding", lambda x: -x)
        ).otherwise(F.col("embedding")).alias("embedding"),
        "label",
    ).write.parquet(alt_path)
    alt = spark.read.parquet(alt_path)
    r2 = {
        (r["query_id"], r["rnk"]): r["neighbor_id"]
        for r in knn_bruteforce(alt).collect()
    }

    assert r1, "baseline knn returned nothing"
    assert r2, "alt knn returned nothing"
    assert r1 != r2, (
        "knn over a different dataset returned the cached neighbors of the "
        "first dataset — persisted_shared key is missing input provenance"
    )


def test_shared_tier_no_collision_for_in_memory_inputs(spark):
    """createDataFrame inputs have no file provenance — the shared-tier key
    must still distinguish two different in-memory datasets with the same
    plan shape (semanticHash fallback covers the LocalRelation rows)."""
    from flink_cep_task_spark.operators import dedup as D
    from flink_cep_task_spark.operators.cache import release_shared

    release_shared()
    try:
        near_dup = spark.createDataFrame(
            [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(8)],
            ["doc_id", "text"],
        )
        all_unique = spark.createDataFrame(
            [(i, " ".join(f"w{i}_{j}" for j in range(8))) for i in range(8)],
            ["doc_id", "text"],
        )
        dup_pairs = D.dedup_minhash_lsh(near_dup).count()
        uniq_pairs = D.dedup_minhash_lsh(all_unique).count()
        assert dup_pairs > 0, "identical docs produced no near-dup pairs"
        assert uniq_pairs == 0, (
            "distinct-doc dataset returned the near-dup dataset's cached "
            "pairs — shared-tier key collided on in-memory inputs"
        )
    finally:
        release_shared()


def test_curation_funnel_counts_null_text_docs_in_raw(spark, tmp_path):
    """A null-text doc emits no repetition_stats row (token explode yields
    nothing), but it IS a raw document: n_raw must count it on both
    engines (the Spark side used an inner gate join that silently dropped
    it — latent on the fixtures, which have no null texts)."""
    import duckdb

    from flink_cep_task_spark.plans.datapipe import (
        CURATION_FUNNEL_SQL,
        curation_funnel,
    )
    from tests.conftest import SF_DIR

    d = str(tmp_path / "docs_with_null")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    extra = spark.createDataFrame(
        [(999_999, None, "en", "src0", 0)],
        schema=base.schema,
    )
    base.unionByName(extra).write.parquet(d)
    sf_dir = str(tmp_path)
    import os, shutil

    os.rename(d, str(tmp_path / "documents.parquet"))

    got = {
        r["source"]: (r["n_raw"], r["n_quality"], r["n_unique"])
        for r in curation_funnel(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    exp = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(CURATION_FUNNEL_SQL).fetchall()
    }
    assert got == exp
    # and the null-text doc is in src0's raw count, not kept
    base_src0 = base.filter("source = 'src0'").count()
    assert got["src0"][0] == base_src0 + 1


def test_cc_checkpoint_freed_by_release_caches(spark):
    """The CC fixpoint's converged mapping is an eager localCheckpoint;
    unpersist() on the frame frees nothing (the blocks belong to the
    LogicalRDD's RDD), so before round 11 each clustering call leaked a
    pinned RDD until JVM ContextCleaner GC (ADVICE r10). Pin: after
    release_caches() the persistent-RDD registry is back to its
    pre-clustering size."""
    from flink_cep_task_spark.operators.cache import release_caches
    from flink_cep_task_spark.operators.dedup import _cluster_from_pairs

    def n_persistent() -> int:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    release_caches()
    n0 = n_persistent()
    docs = spark.createDataFrame([(1,), (2,), (3,)], "doc_id LONG")
    pairs = spark.createDataFrame([(1, 2)], "doc_a LONG, doc_b LONG")
    out = _cluster_from_pairs(docs, pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 3}
    assert n_persistent() > n0  # operator persists + the checkpoint live
    release_caches()
    assert n_persistent() == n0  # checkpoint included — nothing pinned


def test_cluster_label_store_debug_containment(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_DEBUG_STORES=1 makes write_cluster_label_store verify
    the threaded CC mapping's universe is contained in the passed labels
    frame (the precondition under which the star-edge fast path equals
    the full frame — ADVICE r10). A pair set referencing a doc outside
    the documents universe must raise instead of silently persisting a
    star edge the full frame would have dropped."""
    import pytest as _pytest

    from flink_cep_task_spark.operators.cache import release_caches
    from flink_cep_task_spark.operators.dedup import (
        _cluster_from_pairs,
        write_cluster_label_store,
    )

    monkeypatch.setenv("SPARK_GRAFT_DEBUG_STORES", "1")
    docs = spark.createDataFrame([(1,), (2,)], "doc_id LONG")
    ok = _cluster_from_pairs(docs, spark.createDataFrame([(1, 2)], "doc_a LONG, doc_b LONG"))
    write_cluster_label_store(ok, str(tmp_path / "ok"), epoch="base")
    rows = spark.read.parquet(str(tmp_path / "ok")).collect()
    assert {(r["doc_id"], r["cluster_id"]) for r in rows} == {(2, 1)}

    # poisoned: edge endpoint 3 is not in the documents universe — the
    # mapping carries it, the corpus-joined frame drops it
    bad = _cluster_from_pairs(docs, spark.createDataFrame([(1, 3)], "doc_a LONG, doc_b LONG"))
    with _pytest.raises(ValueError, match="outside"):
        write_cluster_label_store(bad, str(tmp_path / "bad"), epoch="base")
    release_caches()
