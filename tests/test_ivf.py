"""IVF fit properties: the deterministic k-means fit must produce
data-balanced, non-degenerate cells — the property that bounds the probe
join's per-cell fan-out at scale (a fat cell would make ann_ivf scan it for
every probing query)."""

from __future__ import annotations

import os
import statistics

from pyspark.sql import functions as F

from flink_cep_task_spark.operators.similarity import (
    IVF_CENTROID_IDS,
    _assign_cells,
    _fit_centroids,
    _with_norm,
)
from flink_cep_task_spark.sources.tables import load_table

BALANCE_SF_DIR = os.environ.get("SPARK_GRAFT_BALANCE_SF_DIR", "/root/testdata/sf0.1")


def test_fitted_cells_are_balanced(spark):
    base = _with_norm(load_table(spark, BALANCE_SF_DIR, "embeddings"))
    cents = _fit_centroids(base)
    assert len(cents) == len(IVF_CENTROID_IDS), "fit lost cells on this data"
    inv = _assign_cells(base, cents, 1).filter(F.col("rank") == 0)
    sizes = [
        r["c"] for r in inv.groupBy("cell").agg(F.count(F.lit(1)).alias("c")).collect()
    ]
    assert len(sizes) == len(cents)
    mean = statistics.mean(sizes)
    assert max(sizes) <= 2 * mean, f"fat cell: sizes={sorted(sizes)}"
    assert min(sizes) > 0


def test_fit_is_deterministic(spark):
    base = _with_norm(load_table(spark, "/root/testdata/sf0.001", "embeddings"))
    assert _fit_centroids(base) == _fit_centroids(base)
