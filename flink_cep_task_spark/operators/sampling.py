"""Deterministic corpus sampling — the training-data pipeline's subsetting
primitive. No RNG state: keep/drop is a pure function of the document id
(portable md5-60bit, functions/hashing.py), so the sample is reproducible
across engines, runs, partitionings and retries — exactly what a 100 TB
pipeline needs (a rand()-based sample changes under task retry, and a
per-partition RNG changes under repartitioning).

The hash is salted ("samp:" prefix) so the sampling decision is independent
of every other h64 use of doc_id."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_cep_task_spark.functions.hashing import h64, h64_sql

SAMPLE_PCT = 20  # keep ~20 docs per 100 per stratum
_SALT = "samp:"


def _bucket(doc_id: Column) -> Column:
    return h64(F.concat(F.lit(_SALT), doc_id.cast("string"))) % 100


_BUCKET_SQL = f"{h64_sql(f'{_SALT!r} || CAST(doc_id AS VARCHAR)')} % 100"


def sample_stratified(documents: DataFrame, pct: int = SAMPLE_PCT) -> DataFrame:
    """The kept subset: doc survives iff its hash bucket < pct. Works per
    row — embarrassingly parallel, no shuffle, filter runs at the scan."""
    return documents.filter(_bucket(F.col("doc_id")) < pct).select(
        "doc_id", "source", "lang"
    )


SAMPLE_STRATIFIED_SQL = f"""
SELECT doc_id, source, lang
FROM documents
WHERE {_BUCKET_SQL} < {SAMPLE_PCT}
"""


def sample_report(documents: DataFrame, pct: int = SAMPLE_PCT) -> DataFrame:
    """Per-(source, lang) stratum audit of the same sample: total docs,
    kept docs, observed rate — the check that hash sampling stays unbiased
    within every stratum (one aggregation pass, no second scan)."""
    kept = (_bucket(F.col("doc_id")) < pct).cast("int")
    return (
        documents.select("source", "lang", kept.alias("k"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("k").cast("long").alias("n_kept"),
            F.round(F.sum("k").cast("double") / F.count(F.lit(1)), 6).alias("kept_rate"),
        )
    )


SAMPLE_REPORT_SQL = f"""
SELECT source, lang,
       count(*) AS n_total,
       CAST(sum(k) AS BIGINT) AS n_kept,
       round(CAST(sum(k) AS DOUBLE) / count(*), 6) AS kept_rate
FROM (SELECT source, lang,
             CASE WHEN {_BUCKET_SQL} < {SAMPLE_PCT} THEN 1 ELSE 0 END AS k
      FROM documents)
GROUP BY source, lang
"""
