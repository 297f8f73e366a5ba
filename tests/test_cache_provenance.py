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
