"""Empty-input robustness: every operator family must return an EMPTY,
correctly-typed result — never crash — when its input tables have zero
rows. At 100 TB this is not a corner case: date-partition filters, new
tenants, and backfill gaps all produce empty scans, and an operator that
throws on them takes down the whole job."""

from __future__ import annotations

import pytest

from flink_cep_task_spark.sources.tables import load_table
from tests.conftest import SF_DIR

# representative member of each operator family (full registry would
# cost minutes; each of these exercises the family's code path end-to-end)
FAMILIES = [
    "cep_multi_rule",            # rule fan-out + windows + threshold
    "q1_pricing_summary",        # TPC-H scan + wide agg
    "q3_shipping_priority",      # TPC-H multi-join + top-k
    "dedup_minhash_lsh",         # shingle → signature → banded join
    "dedup_ngram_jaccard",       # PPJoin prefix filter
    "knn_bruteforce",            # embedding top-k
    "ann_ivf",                   # k-means fit + probe (fit on empty!)
    "text_stats",                # token pipeline
    "sessionize_events",         # gaps-and-islands
    "salted_hot_user_join",      # salted join
    "approx_distinct_report",    # sketch aggregate
    "pack_sequences",            # window cumsum packing
    "media_feature_stats",       # mapInPandas
    "split_train_eval",          # salted-hash holdout
    "dedup_substring",           # winnowing fingerprints (round 7)
    "incremental_rollup",        # partial-store + batch merge (round 7)
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """Every test table with its real schema and ZERO rows."""
    d = tmp_path_factory.mktemp("empty_sf")
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        load_table(spark, SF_DIR, t).limit(0).write.mode("overwrite").parquet(
            str(d / f"{t}.parquet")
        )
    return str(d)


@pytest.mark.parametrize("name", FAMILIES)
def test_operator_survives_empty_inputs(spark, empty_sf_dir, name):
    from flink_cep_task_spark.registry import all_queries

    fn, _sql = all_queries()[name]
    rows = fn(spark, empty_sf_dir).collect()
    assert rows == [], f"{name} fabricated {len(rows)} rows from empty inputs"
