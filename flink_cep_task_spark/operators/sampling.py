"""Deterministic corpus sampling — the training-data pipeline's subsetting
primitive. No RNG state: keep/drop is a pure function of the document id
(portable md5-60bit, functions/hashing.py), so the sample is reproducible
across engines, runs, partitionings and retries — exactly what a 100 TB
pipeline needs (a rand()-based sample changes under task retry, and a
per-partition RNG changes under repartitioning).

The hash is salted ("samp:" prefix) so the sampling decision is independent
of every other h64 use of doc_id."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


# --- fixed-context sequence packing ---------------------------------------

PACK_CTX_TOKENS = 512  # context-window capacity in whitespace tokens


def pack_sequences(documents: DataFrame, ctx: int = PACK_CTX_TOKENS) -> DataFrame:
    """Pretraining-style sequence packing report: token streams are
    concatenated PER SOURCE in doc_id order and cut at fixed ctx-token
    boundaries (documents may span a cut — the GPT-style "packed
    sequences with splitting" layout). Emits one row per source: bins
    used, docs that straddle a boundary, and mean fill.

    Scale design: the running offset is a window cumsum PARTITIONED BY
    source — each source packs independently and in parallel; no global
    ordering or single-task sort exists anywhere in the plan. (Packing
    the whole corpus as ONE stream would serialize at the window; per-
    shard packing is also what a real tokenizer-sharded pipeline does.)
    """
    from flink_cep_task_spark.operators.text import tokens

    # explicit ROWS frame: the orderBy default is RANGE, which includes
    # peer rows — it only agrees with the oracle's ROWS UNBOUNDED
    # PRECEDING because doc_id happens to be unique per source. ROWS makes
    # the cumsum correct even with duplicate doc_ids.
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_toks = F.size(tokens(F.col("text"))).cast("long")
    d = documents.select("source", "doc_id", n_toks.alias("n"))
    d = d.withColumn("cum_after", F.sum("n").over(w)).withColumn(
        "cum_before", F.col("cum_after") - F.col("n")
    )
    first_bin = F.floor(F.col("cum_before") / ctx)
    last_bin = F.floor((F.col("cum_after") - 1) / ctx)
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").cast("long").alias("total_tokens"),
            (F.floor((F.max("cum_after") - 1) / ctx) + 1).cast("long").alias("n_bins"),
            F.sum((first_bin != last_bin).cast("int")).cast("long").alias("n_split_docs"),
            F.round(
                F.sum("n").cast("double") / ((F.floor((F.max("cum_after") - 1) / ctx) + 1) * ctx),
                6,
            ).alias("fill_frac"),
        )
    )


PACK_SEQUENCES_SQL = f"""
WITH d AS (
  SELECT source, doc_id,
         CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS n
  FROM documents
), c AS (
  SELECT source, n,
         sum(n) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) AS cum_after
  FROM d
)
SELECT source, count(*) AS n_docs,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       CAST(floor((max(cum_after) - 1) / {PACK_CTX_TOKENS}) + 1 AS BIGINT) AS n_bins,
       CAST(sum(CASE WHEN floor((cum_after - n) / {PACK_CTX_TOKENS})
                       <> floor((cum_after - 1) / {PACK_CTX_TOKENS}) THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
       round(CAST(sum(n) AS DOUBLE)
             / ((floor((max(cum_after) - 1) / {PACK_CTX_TOKENS}) + 1) * {PACK_CTX_TOKENS}), 6) AS fill_frac
FROM c
GROUP BY source
"""


# --- temperature-scaled source mixing -------------------------------------

MIX_TEMPERATURE = 2.0  # weight ∝ share^(1/T): T>1 upsamples small sources


def mix_temperature(documents: DataFrame, temperature: float = MIX_TEMPERATURE) -> DataFrame:
    """Data-mixture weights: each source's natural token share is
    temperature-flattened (w ∝ share^(1/T), renormalized) — the standard
    multi-source sampling scheme that keeps small sources from vanishing.
    Two tiny aggregates (per-source sums, then a broadcast scalar join);
    the heavy token counting is map-side-combined with the first."""
    from flink_cep_task_spark.operators.text import tokens

    alpha = 1.0 / temperature
    per_src = documents.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text"))).cast("long")).alias("n_tokens")
    )
    # the normalizer sums IRRATIONAL doubles — rounded per-term to 6 dp and
    # summed as exact decimal so the total is partitioning-order-immune
    # (a raw double sum can differ in the last ulp between partitionings
    # and engines); magnitudes are n_tokens^(1/T) ≤ ~1e6 at any corpus.
    zterm = F.round(F.pow(F.col("n_tokens").cast("double"), alpha), 6).cast(
        "decimal(28,6)"
    )
    totals = per_src.agg(
        F.sum("n_tokens").alias("__total"),
        F.sum(zterm).alias("__z"),
    )
    share = F.col("n_tokens").cast("double") / F.col("__total")
    weight = F.pow(F.col("n_tokens").cast("double"), alpha) / F.col("__z").cast("double")
    return per_src.join(F.broadcast(totals)).select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(share, 6).alias("natural_share"),
        F.round(weight, 6).alias("mix_weight"),
        F.round(weight / share, 6).alias("boost"),
    )


MIX_TEMPERATURE_SQL = f"""
WITH per_src AS (
  SELECT source,
         CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(n_tokens) AS DOUBLE) AS total,
         CAST(sum(CAST(round(pow(CAST(n_tokens AS DOUBLE), {1.0 / MIX_TEMPERATURE}), 6) AS DECIMAL(28,6))) AS DOUBLE) AS z
  FROM per_src
)
SELECT source, n_tokens,
       round(CAST(n_tokens AS DOUBLE) / total, 6) AS natural_share,
       round(pow(CAST(n_tokens AS DOUBLE), {1.0 / MIX_TEMPERATURE}) / z, 6) AS mix_weight,
       round((pow(CAST(n_tokens AS DOUBLE), {1.0 / MIX_TEMPERATURE}) / z)
             / (CAST(n_tokens AS DOUBLE) / total), 6) AS boost
FROM per_src, tot
"""


# --- deterministic train/eval split ---------------------------------------

EVAL_PCT = 5  # hold out ~5 docs per 100
_SPLIT_SALT = "split:"


def split_train_eval(documents: DataFrame, eval_pct: int = EVAL_PCT) -> DataFrame:
    """Reproducible train/eval holdout assignment plus the per-source
    audit a pipeline records next to the split: each doc is labeled by a
    pure function of its id (salted portable hash, independent of the
    sampling decision above), so the split survives retries,
    repartitioning, engine changes, and incremental corpus growth
    (existing docs never flip sides when new docs arrive — the property
    rand()-based splits lack). Output is the per-(source, split) rollup:
    doc count, token mass, observed eval share."""
    from flink_cep_task_spark.operators.text import tokens

    split = F.when(
        h64(F.concat(F.lit(_SPLIT_SALT), F.col("doc_id").cast("string"))) % 100
        < eval_pct,
        F.lit("eval"),
    ).otherwise(F.lit("train"))
    n_tok = F.size(tokens(F.col("text")))
    per = (
        documents.select("source", split.alias("split"), n_tok.alias("n_tok"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )
    w = Window.partitionBy("source")
    return per.select(
        "source",
        "split",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 6).alias(
            "doc_share"
        ),
    )


_SPLIT_BUCKET_SQL = f"{h64_sql(f'{_SPLIT_SALT!r} || CAST(doc_id AS VARCHAR)')} % 100"

SPLIT_TRAIN_EVAL_SQL = f"""
WITH labeled AS (
  SELECT source,
         CASE WHEN {_SPLIT_BUCKET_SQL} < {EVAL_PCT} THEN 'eval' ELSE 'train' END AS split,
         len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok
  FROM documents
), per AS (
  SELECT source, split, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
  FROM labeled GROUP BY source, split
)
SELECT source, split, n_docs, n_tokens,
       round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (PARTITION BY source), 6)
         AS doc_share
FROM per
"""


# --- quality-weighted source mixing ---------------------------------------

def quality_mix_report(documents: DataFrame, temperature: float = MIX_TEMPERATURE) -> DataFrame:
    """Pipeline composition: temperature-flattened mixing weights
    (mix_temperature) scaled by each source's mean quality score
    (corpus_quality_report's metric) and renormalized — the static form of
    quality-aware mixture reweighting (small sources are upsampled by
    temperature, low-quality sources are damped by their measured quality).

    Determinism across engines: both factors are rounded to 6 dp first, so
    their product is an exact ≤12-significant-digit value (exact in a
    double); it is then CAST to DECIMAL(28,12) — which both engines
    recover exactly from the double — so the renormalization SUM is exact
    decimal arithmetic, immune to partitioning order. Only the final
    division is floating point, with identical operands. Scale shape: one
    corpus aggregate (map-side combined), then arithmetic over the
    |sources|-row table with broadcast scalar joins."""
    from flink_cep_task_spark.operators.text import _quality_score, tokens

    alpha = 1.0 / temperature
    per_src = documents.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text"))).cast("long")).alias("n_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(_quality_score().cast("decimal(9,6)")).alias("__qsum"),
    )
    totals = per_src.agg(
        F.sum(
            F.round(F.pow(F.col("n_tokens").cast("double"), alpha), 6).cast(
                "decimal(28,6)"
            )
        ).alias("__zd")
    ).select(F.col("__zd").cast("double").alias("__z"))
    avg_q = F.round(F.col("__qsum").cast("double") / F.col("n_docs"), 6)
    w_t = F.round(F.pow(F.col("n_tokens").cast("double"), alpha) / F.col("__z"), 6)
    staged = (
        per_src.join(F.broadcast(totals))
        .withColumn("avg_quality", avg_q)
        .withColumn("mix_weight", w_t)
        .withColumn(
            "__wq", (F.col("mix_weight") * F.col("avg_quality")).cast("decimal(28,12)")
        )
    )
    norm = staged.agg(F.sum("__wq").alias("__norm"))
    return staged.join(F.broadcast(norm)).select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "avg_quality",
        "mix_weight",
        F.round(
            F.col("__wq").cast("double") / F.col("__norm").cast("double"), 6
        ).alias("final_weight"),
    )


from flink_cep_task_spark.operators.text import STOPWORDS as _STOP
_STOP_SQL = ", ".join("'" + w + "'" for w in _STOP)

QUALITY_MIX_SQL = f"""
WITH per_src AS (
  SELECT source,
         CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS BIGINT) AS n_tokens,
         count(*) AS n_docs,
         sum(CAST(round(least(1.0, CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS DOUBLE) / 100.0)
               * (1.0 - CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x IN ({_STOP_SQL}))) AS DOUBLE)
                        / len(regexp_split_to_array(lower(trim(text)), '\\s+'))), 6) AS DECIMAL(9,6))) AS qsum
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(CAST(round(pow(CAST(n_tokens AS DOUBLE), {1.0 / MIX_TEMPERATURE}), 6) AS DECIMAL(28,6))) AS DOUBLE) AS z FROM per_src
), staged AS (
  SELECT source, n_tokens,
         round(CAST(qsum AS DOUBLE) / n_docs, 6) AS avg_quality,
         round(pow(CAST(n_tokens AS DOUBLE), {1.0 / MIX_TEMPERATURE}) / z, 6) AS mix_weight,
         CAST(round(pow(CAST(n_tokens AS DOUBLE), {1.0 / MIX_TEMPERATURE}) / z, 6)
              * round(CAST(qsum AS DOUBLE) / n_docs, 6) AS DECIMAL(28,12)) AS wq
  FROM per_src, tot
), norm AS (SELECT sum(wq) AS nz FROM staged)
SELECT source, n_tokens, avg_quality, mix_weight,
       round(CAST(wq AS DOUBLE) / CAST(nz AS DOUBLE), 6) AS final_weight
FROM staged, norm
"""
