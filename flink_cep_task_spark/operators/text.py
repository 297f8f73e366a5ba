"""Text-analysis operators over the `documents` table: tokenization stats,
quality scoring, language-ID heuristic, document fingerprinting.

All hot-path expressions are built-in Catalyst functions (split/transform/
filter/aggregate higher-order functions) — zero Python UDFs, so the whole
stage stays in whole-stage codegen and scales linearly with document count.
Shared normalization/tokenization lives here and is reused by dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

import pandas as pd

from flink_cep_task_spark.functions.hashing import gram_hash_sql

STOPWORDS = ("the", "a")

# deterministic marker vocabularies for the language-ID heuristic; scoring
# is marker-token counting (the real-world analog is char-n-gram profiles —
# same plan shape, richer tables).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("stream", "window", "gross"),
    "en": ("the", "a", "fast"),
    "es": ("batch", "scan", "rapido"),
    "fr": ("table", "join", "vite"),
    "zh": ("spark", "row", "kuai"),
}


def norm_text(c: Column) -> Column:
    """Canonical text form shared by all text/dedup operators."""
    return F.lower(F.trim(c))


def tokens(c: Column) -> Column:
    return F.split(norm_text(c), r"\s+")


def _quality_score() -> "Column":
    """The rounded quality expression shared by text_stats (per-doc
    report) and corpus_quality_report (one-pass rollup) — keeping the two
    bit-identical so the rollup needs no join back to the per-doc query.

    quality = min(1, n_tokens/100) * (1 - stopword_ratio): a stand-in for
    the usual length/stopword gating used to filter LLM training text."""
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    stop_ratio = n_stop.cast("double") / n_tokens
    quality = F.least(F.lit(1.0), n_tokens.cast("double") / 100.0) * (
        F.lit(1.0) - stop_ratio
    )
    return F.round(quality, 6)


def text_stats(documents: DataFrame) -> DataFrame:
    """Per-document token/char statistics + a deterministic quality score
    (see _quality_score)."""
    t = norm_text(F.col("text"))
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    alpha_len = F.length(F.regexp_replace(t, r"\s", ""))
    punct_len = F.length(F.regexp_replace(t, r"[a-z0-9\s]", ""))
    stop_ratio = n_stop.cast("double") / n_tokens
    return documents.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_stop.cast("long").alias("n_stopwords"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_len.cast("double") / n_tokens, 6).alias("avg_token_len"),
        F.round(punct_len.cast("double") / F.length(t), 6).alias("punct_ratio"),
        _quality_score().alias("quality_score"),
    )


TEXT_STATS_SQL = f"""
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_filter(toks, x -> x IN ({", ".join("'" + s + "'" for s in STOPWORDS)}))) AS BIGINT) AS n_stopwords,
  round(CAST(len(list_filter(toks, x -> x IN ({", ".join("'" + s + "'" for s in STOPWORDS)}))) AS DOUBLE) / len(toks), 6) AS stopword_ratio,
  round(CAST(length(regexp_replace(t, '\\s', '', 'g')) AS DOUBLE) / len(toks), 6) AS avg_token_len,
  round(CAST(length(regexp_replace(t, '[a-z0-9\\s]', '', 'g')) AS DOUBLE) / length(t), 6) AS punct_ratio,
  round(least(1.0, CAST(len(toks) AS DOUBLE) / 100.0)
        * (1.0 - CAST(len(list_filter(toks, x -> x IN ({", ".join("'" + s + "'" for s in STOPWORDS)}))) AS DOUBLE) / len(toks)), 6) AS quality_score
FROM (SELECT doc_id, lower(trim(text)) AS t,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents)
"""


QUALITY_GATE = 0.5


def corpus_quality_report(documents: DataFrame) -> DataFrame:
    """Pipeline composition: per (source, lang) corpus rollup of the
    text_stats quality score — document count, share passing the quality
    gate, mean quality. Quality is cast to DECIMAL(9,6) before summing so
    the mean is exact and order-independent (a double sum would make the
    two engines disagree in the last ulp under different partitionings)."""
    # one pass: the quality expression projects next to source/lang on the
    # same scan (it shares _quality_score with text_stats bit-for-bit), so
    # no join back to the per-doc query and no second scan of documents
    joined = documents.select(
        "source", "lang", _quality_score().alias("quality_score")
    )
    q = F.col("quality_score").cast("decimal(9,6)")
    return (
        joined.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("quality_score") >= QUALITY_GATE, 1).otherwise(0))
            .cast("long")
            .alias("n_pass"),
            F.round(F.sum(q).cast("double") / F.count(F.lit(1)), 6).alias("avg_quality"),
        )
    )


CORPUS_QUALITY_SQL = f"""
SELECT d.source, d.lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN s.quality_score >= {QUALITY_GATE} THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       round(CAST(sum(CAST(s.quality_score AS DECIMAL(9,6))) AS DOUBLE) / count(*), 6) AS avg_quality
FROM documents d
JOIN ({TEXT_STATS_SQL.strip()}) s ON s.doc_id = d.doc_id
GROUP BY d.source, d.lang
"""


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-token language scoring; argmax with alphabetical tie-break."""
    toks = tokens(F.col("text"))

    def marker_count(markers: tuple[str, ...]):
        # NB a default-arg lambda (lambda x, m=...) would be mis-read by
        # PySpark as a two-argument HOF lambda — close over markers instead.
        return F.size(F.filter(toks, lambda x: x.isin(*markers)))

    scores = {lang: marker_count(markers) for lang, markers in sorted(LANG_MARKERS.items())}
    best = F.greatest(*scores.values())
    pred = F.lit(None).cast("string")
    # first (alphabetical) language reaching the max wins — build the CASE
    # in reverse so earlier langs take precedence.
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    out = documents.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("pred_lang"),
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in sorted(LANG_MARKERS)],
    )
    return out


def _lang_score_sql(markers: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(toks, x -> x IN ({inlist})))"


LANG_ID_SQL = (
    "SELECT doc_id, lang AS labeled_lang,\n  CASE "
    + " ".join(
        f"WHEN {_lang_score_sql(LANG_MARKERS[lang])} = "
        + "greatest("
        + ", ".join(_lang_score_sql(LANG_MARKERS[lg]) for lg in sorted(LANG_MARKERS))
        + f") THEN '{lang}'"
        for lang in sorted(LANG_MARKERS)
    )
    + " END AS pred_lang,\n  "
    + ",\n  ".join(
        f"CAST({_lang_score_sql(LANG_MARKERS[lang])} AS BIGINT) AS score_{lang}"
        for lang in sorted(LANG_MARKERS)
    )
    + "\nFROM (SELECT doc_id, lang, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents)"
)


def lang_id_confusion(documents: DataFrame) -> DataFrame:
    """Classifier-vs-gold audit over the lang-id heuristic: the
    (labeled, predicted) confusion matrix with each cell's share of its
    labeled row — the shape of every model-quality audit at corpus scale.
    One pass over the corpus collapses to |langs|² rows; the share is a
    window over that tiny aggregate, so nothing heavy shuffles twice."""
    from pyspark.sql.window import Window

    per_doc = lang_id(documents).select("labeled_lang", "pred_lang")
    conf = per_doc.groupBy("labeled_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    label_total = F.sum("n_docs").over(Window.partitionBy("labeled_lang"))
    return conf.select(
        "labeled_lang",
        "pred_lang",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / label_total.cast("double"), 6
        ).alias("label_share"),
    )


LANG_CONFUSION_SQL = (
    "WITH per AS (" + LANG_ID_SQL + ")\n"
    "SELECT labeled_lang, pred_lang, count(*) AS n_docs,\n"
    "  round(CAST(count(*) AS DOUBLE) /\n"
    "        CAST(sum(count(*)) OVER (PARTITION BY labeled_lang) AS DOUBLE), 6)"
    " AS label_share\n"
    "FROM per GROUP BY labeled_lang, pred_lang"
)


BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def token_counts(documents: DataFrame) -> DataFrame:
    """Token counting two ways (LLM-pipeline budget estimation):
    whitespace tokens and a BPE-ish regex segmentation (letter runs, digit
    runs, single punctuation — the pre-tokenization split GPT-style BPE
    vocabularies assume). Pure Catalyst regexp_extract_all, linear scan."""
    t = norm_text(F.col("text"))
    ws = F.size(tokens(F.col("text")))
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_RE), 0))
    return documents.select(
        "doc_id",
        ws.cast("long").alias("n_ws_tokens"),
        bpe.cast("long").alias("n_bpe_tokens"),
        F.length(t).cast("long").alias("n_chars"),
        F.round(bpe.cast("double") / ws, 6).alias("bpe_per_ws_token"),
    )


TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
  CAST(len(regexp_split_to_array(t, '\\s+')) AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(t, '{BPE_TOKEN_RE}')) AS BIGINT) AS n_bpe_tokens,
  CAST(length(t) AS BIGINT) AS n_chars,
  round(CAST(len(regexp_extract_all(t, '{BPE_TOKEN_RE}')) AS DOUBLE)
        / len(regexp_split_to_array(t, '\\s+')), 6) AS bpe_per_ws_token
FROM (SELECT doc_id, lower(trim(text)) AS t FROM documents)
"""


def tokenizer_fertility_report(documents: DataFrame) -> DataFrame:
    """Per-LANGUAGE tokenizer fertility: BPE-ish pieces per whitespace
    word, the number that drives context-budget planning per language in
    a multilingual corpus. Exact integer token sums aggregate map-side
    (one shuffle of |langs| partial rows); the division happens once per
    language on the aggregated sums, so the ratio is bit-stable across
    engines."""
    t = F.lower(F.trim(F.col("text")))
    ws = F.size(F.split(t, r"\s+"))
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_RE), 0))
    return (
        documents.select("lang", ws.alias("__ws"), bpe.alias("__bpe"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__ws").cast("long").alias("n_ws_tokens"),
            F.sum("__bpe").cast("long").alias("n_bpe_tokens"),
            F.round(
                F.sum("__bpe").cast("double") / F.sum("__ws").cast("double"), 6
            ).alias("fertility"),
        )
    )


TOKENIZER_FERTILITY_SQL = f"""
SELECT lang, count(*) AS n_docs,
       CAST(sum(len(regexp_split_to_array(t, '\\s+'))) AS BIGINT) AS n_ws_tokens,
       CAST(sum(len(regexp_extract_all(t, '{BPE_TOKEN_RE}'))) AS BIGINT) AS n_bpe_tokens,
       round(CAST(sum(len(regexp_extract_all(t, '{BPE_TOKEN_RE}'))) AS DOUBLE)
             / CAST(sum(len(regexp_split_to_array(t, '\\s+'))) AS DOUBLE), 6) AS fertility
FROM (SELECT lang, lower(trim(text)) AS t FROM documents)
GROUP BY lang
"""


def doc_length_histogram(documents: DataFrame) -> DataFrame:
    """Per-source log2-bucketed document-length distribution — the
    curation audit that exposes truncation spikes and boilerplate combs a
    mean/percentile summary hides. Buckets are floor(log2(n_chars)), so
    the histogram has O(log max_len) rows per source regardless of corpus
    size; the bucket's lower bound rides along for readability. log2 is
    exact at every power of two in both engines, so bucket edges can't
    disagree."""
    bucket = F.floor(F.log2(F.greatest(F.col("n_chars"), F.lit(1)))).cast("long")
    return (
        documents.select("source", bucket.alias("len_bucket"))
        .groupBy("source", "len_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "source",
            "len_bucket",
            F.pow(F.lit(2.0), F.col("len_bucket")).cast("long").alias("min_chars"),
            "n_docs",
        )
    )


DOC_LENGTH_HIST_SQL = """
SELECT source, len_bucket,
       CAST(pow(2.0, len_bucket) AS BIGINT) AS min_chars,
       count(*) AS n_docs
FROM (SELECT source,
             CAST(floor(log2(greatest(n_chars, 1))) AS BIGINT) AS len_bucket
      FROM documents)
GROUP BY source, len_bucket
"""


CURATE_TOP_K = 10


def curate_top_quality(documents: DataFrame, k: int = CURATE_TOP_K) -> DataFrame:
    """Quality-based curation: keep the top-k documents per (source, lang)
    stratum by text_stats quality score (doc_id tie-break) — the selection
    step that turns quality scoring into an actual training subset. One
    scoring pass + one ranking window partitioned by stratum; no global
    sort."""
    from pyspark.sql.window import Window as W

    scored = documents.select("doc_id", "source", "lang").join(
        text_stats(documents).select("doc_id", "quality_score"), "doc_id"
    )
    ranked = scored.withColumn(
        "rnk",
        F.row_number().over(
            W.partitionBy("source", "lang").orderBy(
                F.col("quality_score").desc(), F.col("doc_id")
            )
        ),
    )
    return ranked.filter(F.col("rnk") <= k).select(
        "source", "lang", "doc_id", "quality_score", "rnk"
    )


CURATE_SQL = f"""
SELECT source, lang, doc_id, quality_score, rnk FROM (
  SELECT d.source, d.lang, d.doc_id, s.quality_score,
         CAST(row_number() OVER (
           PARTITION BY d.source, d.lang
           ORDER BY s.quality_score DESC, d.doc_id
         ) AS INTEGER) AS rnk
  FROM documents d
  JOIN ({TEXT_STATS_SQL.strip()}) s ON s.doc_id = d.doc_id
) WHERE rnk <= {CURATE_TOP_K}
"""


TFIDF_TOP_K = 5


def tfidf_top_terms(documents: DataFrame, k: int = TFIDF_TOP_K) -> DataFrame:
    """Top-k terms per document by tf·idf — the classic sparse feature
    extraction over a corpus. Two aggregations (term counts per doc,
    document frequency per term) and one ranking window; the corpus size
    joins in as a broadcast scalar. idf = ln(N/df) with no smoothing;
    score rounded to 6 so both engines rank the identical value, ties
    broken by term."""
    from pyspark.sql.window import Window as W

    from flink_cep_task_spark.operators.cache import persisted

    toks = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    # tf feeds BOTH branches: df (document frequency) is just the row
    # count per term over tf — (doc_id, tok) rows are already distinct —
    # so the corpus-wide tokenize+explode and its shuffle run ONCE
    # (separate tf/df aggregations over `toks` executed the explode twice:
    # different shuffle keys, no exchange reuse).
    tf = persisted(
        toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = documents.select(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(df_, "tok")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6
            ),
        )
    )
    ranked = scored.withColumn(
        "rnk",
        F.row_number().over(
            W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok"))
        ),
    )
    return ranked.filter(F.col("rnk") <= k).select(
        "doc_id", F.col("tok").alias("term"), "tf", "df", "tfidf", "rnk"
    )


TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
  FROM documents
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
n AS (SELECT count(*) AS n FROM documents)
SELECT doc_id, tok AS term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       tfidf, rnk
FROM (
  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf,
         CAST(row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) DESC, tf.tok
         ) AS INTEGER) AS rnk
  FROM tf JOIN df USING (tok) CROSS JOIN n
) WHERE rnk <= {TFIDF_TOP_K}
"""


BIGRAM_TOP_N = 20


def bigram_counts(documents: DataFrame, top_n: int = BIGRAM_TOP_N) -> DataFrame:
    """Corpus-level word-bigram counts, top N by frequency (bigram
    tie-break) — the language-statistics pass behind n-gram LMs and
    contamination checks. One explode + one aggregation; the final top-N
    is a TakeOrdered, not a full sort."""
    toks = tokens(F.col("text"))
    grams = F.expr(
        "transform(sequence(1, size(__t) - 1), i -> concat(__t[i-1], ' ', __t[i]))"
    )
    exploded = (
        documents.select(toks.alias("__t"))
        .filter(F.size("__t") >= 2)
        .select(F.explode(grams).alias("bigram"))
    )
    return (
        exploded.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(top_n)
    )


BIGRAM_SQL = f"""
SELECT w[i] || ' ' || w[i+1] AS bigram, CAST(count(*) AS BIGINT) AS n
FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents),
     LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) s
GROUP BY 1
ORDER BY n DESC, bigram
LIMIT {BIGRAM_TOP_N}
"""


BOILERPLATE_GRAM = 5
BOILERPLATE_MIN_DF = 3


def boilerplate_ngrams(documents: DataFrame, gram: int = BOILERPLATE_GRAM,
                       min_df: int = BOILERPLATE_MIN_DF) -> DataFrame:
    """Corpus boilerplate detector: word-5-grams appearing in ≥ min_df
    DISTINCT documents, with their document frequency and total occurrence
    count — the pass that finds shared headers/footers/navigation text
    before a line-removal step (C4-style boilerplate stripping; no
    reference analog — training-pipeline extension).

    Scale shape: one corpus scan; grams collapse to (gram, doc_id, count)
    per document first — a doc that repeats its own header 1000× sends one
    row per gram to the corpus exchange — then the doc-frequency rollup is
    a plain count (never count(distinct), which would defeat map-side
    combining). Both aggregates partial-combine before their shuffles."""
    toks = tokens(F.col("text"))
    grams = F.expr(
        f"transform(sequence(1, size(__t) - {gram - 1}),"
        f" i -> concat_ws(' ', slice(__t, i, {gram})))"
    )
    per_doc = (
        documents.select("doc_id", toks.alias("__t"))
        .filter(F.size("__t") >= gram)
        .select("doc_id", F.explode(grams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    return (
        per_doc.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.sum("occ").alias("n_occurrences"),
        )
        .filter(F.col("doc_freq") >= min_df)
        .select(F.col("g").alias("gram"), "doc_freq", "n_occurrences")
    )


BOILERPLATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
  FROM documents
),
per_doc AS (
  SELECT doc_id,
         array_to_string(list_slice(w, i, i + {BOILERPLATE_GRAM - 1}), ' ') AS g,
         count(*) AS occ
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w) - {BOILERPLATE_GRAM - 1})) AS i) s
  WHERE len(w) >= {BOILERPLATE_GRAM}
  GROUP BY doc_id, g
)
SELECT g AS gram,
       count(*) AS doc_freq,
       CAST(sum(occ) AS BIGINT) AS n_occurrences
FROM per_doc
GROUP BY g
HAVING count(*) >= {BOILERPLATE_MIN_DF}
"""


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style within-document repetition signals: token diversity
    (distinct/total), the most-frequent token and its mass fraction, and
    the duplicate-bigram fraction — the signals used to drop boilerplate
    and degenerate (looping) text from training corpora.

    Plan shape: token frequencies come from one explode + hash aggregate
    (map-side partial absorbs repeats before the shuffle on doc_id); the
    argmax token is a per-doc ranking window over the ALREADY-aggregated
    (doc, token, count) rows — never over raw tokens; bigram distinctness
    never leaves the row (array_distinct HOF on the token array), so it
    adds zero shuffle."""
    from pyspark.sql.window import Window as W

    toks = documents.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    tc = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    agg = tc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct_tokens"),
    )
    top = (
        tc.withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy(F.col("c").desc(), F.col("tok"))
            ),
        )
        .filter(F.col("rnk") == 1)
        .select("doc_id", F.col("tok").alias("top_token"), F.col("c").alias("top_token_cnt"))
    )
    w = tokens(F.col("text"))
    grams = F.expr(
        "transform(sequence(1, size(__w) - 1), i -> concat(__w[i-1], ' ', __w[i]))"
    )
    big = (
        documents.select("doc_id", w.alias("__w"))
        .filter(F.size("__w") >= 2)
        .select(
            "doc_id",
            (F.size("__w") - 1).cast("long").alias("n_bigrams"),
            F.size(F.array_distinct(grams)).cast("long").alias("n_distinct_bigrams"),
        )
    )
    joined = agg.join(top, "doc_id").join(big, "doc_id", "left")
    nb = F.coalesce(F.col("n_bigrams"), F.lit(0))
    ndb = F.coalesce(F.col("n_distinct_bigrams"), F.lit(0))
    return joined.select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        F.round(F.col("n_distinct_tokens").cast("double") / F.col("n_tokens"), 6).alias(
            "distinct_ratio"
        ),
        "top_token",
        F.col("top_token_cnt").cast("long").alias("top_token_cnt"),
        F.round(F.col("top_token_cnt").cast("double") / F.col("n_tokens"), 6).alias(
            "top_token_frac"
        ),
        nb.cast("long").alias("n_bigrams"),
        ndb.cast("long").alias("n_distinct_bigrams"),
        F.when(
            nb > 0, F.round(F.lit(1.0) - ndb.cast("double") / nb.cast("double"), 6)
        ).alias("dup_bigram_frac"),
    )


REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
  FROM documents
),
tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
               count(*) AS n_distinct_tokens
        FROM tc GROUP BY doc_id),
top AS (SELECT doc_id, tok AS top_token, CAST(c AS BIGINT) AS top_token_cnt
        FROM (SELECT doc_id, tok, c,
                     row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, tok) AS rnk
              FROM tc)
        WHERE rnk = 1),
big AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(count(DISTINCT w[i] || ' ' || w[i+1]) AS BIGINT) AS n_distinct_bigrams
        FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents),
             LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) s
        GROUP BY doc_id)
SELECT a.doc_id, a.n_tokens, a.n_distinct_tokens,
       round(CAST(a.n_distinct_tokens AS DOUBLE) / a.n_tokens, 6) AS distinct_ratio,
       t.top_token, t.top_token_cnt,
       round(CAST(t.top_token_cnt AS DOUBLE) / a.n_tokens, 6) AS top_token_frac,
       CAST(coalesce(b.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(b.n_distinct_bigrams, 0) AS BIGINT) AS n_distinct_bigrams,
       CASE WHEN coalesce(b.n_bigrams, 0) > 0
            THEN round(1.0 - CAST(b.n_distinct_bigrams AS DOUBLE) / b.n_bigrams, 6)
       END AS dup_bigram_frac
FROM agg a JOIN top t ON t.doc_id = a.doc_id
LEFT JOIN big b ON b.doc_id = a.doc_id
"""


def source_mix_report(documents: DataFrame) -> DataFrame:
    """Per-source data-mixture report (docs, language spread, token budget,
    char-length profile) — the rollup a training-data curator reads before
    setting sampling weights across sources. One map-side-combinable
    aggregation; token counting stays inside the row (size of the split
    array), so the shuffle moves one partial row per (partition, source)."""
    n_toks = F.size(tokens(F.col("text")))
    return documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.sum(n_toks).cast("long").alias("total_tokens"),
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6).alias("avg_chars"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


SOURCE_MIX_SQL = """
SELECT source, count(*) AS n_docs,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS BIGINT) AS total_tokens,
       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY source
"""


GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOP_FRAC = 0.12
GOPHER_MIN_DISTINCT = 0.4


def filter_gopher(documents: DataFrame) -> DataFrame:
    """Gopher-rule quality gate over repetition_stats: keep a document iff
    it is long enough, no single token dominates, and token diversity is
    healthy. Emits the kept flag plus a deterministic semicolon-joined
    reason string ('ok' when kept) — the curation decision log a pipeline
    audits after filtering. Thresholds compare the ROUNDED fractions so
    both engines gate on the identical value."""
    r = repetition_stats(documents)
    too_short = F.col("n_tokens") < GOPHER_MIN_TOKENS
    top_heavy = F.col("top_token_frac") > GOPHER_MAX_TOP_FRAC
    low_div = F.col("distinct_ratio") < GOPHER_MIN_DISTINCT
    kept = ~too_short & ~top_heavy & ~low_div
    reasons = F.concat_ws(
        ";",
        F.when(too_short, F.lit("too_short")),
        F.when(top_heavy, F.lit("top_token_frac")),
        F.when(low_div, F.lit("low_diversity")),
    )
    return r.select(
        "doc_id",
        "n_tokens",
        "top_token_frac",
        "distinct_ratio",
        kept.alias("kept"),
        F.when(kept, F.lit("ok")).otherwise(reasons).alias("reasons"),
    )


FILTER_GOPHER_SQL = f"""
SELECT doc_id, n_tokens, top_token_frac, distinct_ratio,
       (NOT (n_tokens < {GOPHER_MIN_TOKENS})
        AND NOT (top_token_frac > {GOPHER_MAX_TOP_FRAC})
        AND NOT (distinct_ratio < {GOPHER_MIN_DISTINCT})) AS kept,
       CASE WHEN (NOT (n_tokens < {GOPHER_MIN_TOKENS})
                  AND NOT (top_token_frac > {GOPHER_MAX_TOP_FRAC})
                  AND NOT (distinct_ratio < {GOPHER_MIN_DISTINCT})) THEN 'ok'
            ELSE concat_ws(';',
              CASE WHEN n_tokens < {GOPHER_MIN_TOKENS} THEN 'too_short' END,
              CASE WHEN top_token_frac > {GOPHER_MAX_TOP_FRAC} THEN 'top_token_frac' END,
              CASE WHEN distinct_ratio < {GOPHER_MIN_DISTINCT} THEN 'low_diversity' END)
       END AS reasons
FROM ({REPETITION_SQL.strip()})
"""


def doc_fingerprint(documents: DataFrame, gram: int = 5, stride: int = 4) -> DataFrame:
    """Rolling-hash fingerprint: min polynomial hash over DISTINCT
    character n-grams sampled at every `stride`-th position (winnowing-
    style subsampling — gram count and hash work drop ~stride× while the
    min-hash stays a stable document sketch), plus the distinct sampled-
    gram count. Docs shorter than the gram size emit no grams and are
    dropped (the oracle's stepped generate_series does the same).

    Fully vectorized in one Arrow batch per partition: the gram grid is a
    numpy stride view over the text's code points (utf-32 decode ⇒ true
    code points, matching ascii()/substr semantics in both engines),
    distinctness is row-uniqueness of the gram matrix, and the hash is the
    same coefficient fold as functions/hashing.gram_hash_sql — the Catalyst
    transform/array_distinct chain was interpreted per character and
    dominated the stage."""
    import numpy as np

    from flink_cep_task_spark.functions.hashing import PERM_MOD, gram_coeffs

    coeffs = np.array(gram_coeffs(gram), dtype=np.int64)

    @F.pandas_udf("struct<fingerprint:long,n_distinct_grams:long>")
    def fp(texts: pd.Series) -> pd.DataFrame:
        fps: list = []
        counts: list = []
        for t in texts:
            # strip(' ') mirrors SQL trim() (spaces only, not all whitespace)
            s = t.strip(" ").lower() if t is not None else ""
            if len(s) < gram:
                fps.append(None)
                counts.append(0)
                continue
            codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
            grid = np.lib.stride_tricks.sliding_window_view(codes, gram)[::stride]
            uniq = np.unique(grid, axis=0)
            # same pairwise-mod fold as gram_hash/gram_hash_sql: every
            # intermediate stays < 2^62, exact in int64
            acc = np.zeros(len(uniq), dtype=np.int64)
            for i in range(gram):
                acc = (acc + (coeffs[i] * uniq[:, i]) % PERM_MOD) % PERM_MOD
            fps.append(int(acc.min()))
            counts.append(len(uniq))
        return pd.DataFrame({"fingerprint": fps, "n_distinct_grams": counts})

    # short-doc DROP as a Generate, not a Filter: a Filter on the UDF
    # output gets predicate-pushed below the widening exchange, planting a
    # SECOND ArrowEvalPython that re-runs the whole UDF single-threaded on
    # the narrow pre-exchange segment (measured: 2× UDF cost, half of it
    # on one task). Pushdown cannot cross the explode.
    d = documents.select("doc_id", fp(F.col("text")).alias("__r"))
    kept = F.filter(
        F.array(F.col("__r")), lambda r: r.getField("n_distinct_grams") > 0
    )
    return d.select("doc_id", F.explode(kept).alias("__k")).select(
        "doc_id",
        F.col("__k.fingerprint").alias("fingerprint"),
        F.col("__k.n_distinct_grams").alias("n_distinct_grams"),
    )


# --- corpus-LM surprisal scoring ------------------------------------------

def unigram_logprob_score(documents: DataFrame) -> DataFrame:
    """Perplexity-proxy quality score from a corpus-fit unigram LM (the
    KenLM-filter stand-in): p(tok) = corpus_count/total, per-document mean
    surprisal −ln p averaged over tokens. Low = stereotypical text, high =
    rare-token-heavy.

    Plan: one explode→count aggregate fits the "model" (vocab-sized, so
    the token→count table broadcasts back to the exploded stream — at
    real-corpus vocab sizes this is tens of MB, still broadcast range,
    and past the size gate the hint drops and the scoring join degrades
    to a shuffled join, same lever as the NB weights); the per-doc fold
    is a second aggregate on doc_id. Total: two shuffles (vocab fit, doc
    fold), both map-side combined. ln() runs on the same IEEE doubles in
    both engines; the 6dp round absorbs libm ulps."""
    from flink_cep_task_spark.operators.broadcast_gate import gated_broadcast
    from flink_cep_task_spark.operators.cache import persisted

    # three consumers (vocab fit, total, scoring join) — persist the
    # exploded stream so the corpus tokenization runs once per query, and
    # derive the total from the vocab counts instead of a third pass
    toks = persisted(
        documents.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    )
    # vocab persisted for the same reason: total + the gate count + the
    # scoring join are three consumers of the fit
    vocab = persisted(toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")))
    n_vocab = vocab.count()
    total = vocab.agg(F.sum("c").cast("double").alias("__total"))
    # each term is rounded to 9 dp and summed as EXACT decimal: a raw
    # double sum is order-dependent under repartitioning (associativity),
    # which is exactly the class of latent cross-engine divergence the
    # decimal-sum convention exists to rule out; 9 dp per-term precision
    # sits three digits under the 6 dp output rounding.
    nll = F.round(-F.log(F.col("c") / F.col("__total")), 9).cast("decimal(18,9)")
    scored = (
        toks.join(gated_broadcast(vocab, n_vocab), "tok")
        .join(F.broadcast(total))
        .select("doc_id", nll.alias("nll"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.sum("nll").cast("double") / F.count(F.lit(1)), 6).alias("avg_neg_logprob"),
    )


UNIGRAM_LOGPROB_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
  FROM documents
), vocab AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS total FROM toks
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(CAST(sum(CAST(round(-ln(CAST(c AS DOUBLE) / total), 9) AS DECIMAL(18,9))) AS DOUBLE)
             / count(*), 6) AS avg_neg_logprob
FROM toks JOIN vocab USING (tok), tot
GROUP BY doc_id
"""


# --- NB quality-classifier scoring ----------------------------------------

# stand-in training label for the classifier-based quality filter: English
# documents play the "curated reference corpus" (C4/GPT-3 style: train a
# classifier to tell reference text from the crawl, keep what scores
# reference-like). Any in-corpus binary label slots in here.
NB_POS_LABEL_SQL = "lang = 'en'"


def quality_nb_classifier(documents: DataFrame) -> DataFrame:
    """Classifier-based quality scoring (the C4/GPT-3 curation stage):
    a multinomial Naive Bayes with Laplace smoothing is trained on an
    in-corpus binary label (lang='en' as the reference-corpus stand-in),
    every document is scored with its NB log-odds, and the report gives
    the per-source score distribution plus the keep/drop gate
    (log_odds > 0) a curation pipeline composes downstream.

    NB is exact-count-replayable: the model is two token-count columns
    plus five scalar totals, and the score is a sum of per-token weights
    w(t) = ln((c_pos+1)/(T_pos+V)) - ln((c_neg+1)/(T_neg+V)) — so the
    oracle is a real hash match, unlike any gradient-trained stand-in.
    Cross-engine float determinism rides the repo's decimal-sum
    convention (see unigram_logprob_score): each w(t) and the prior are
    rounded to 9 dp and summed as exact DECIMALs, the output rounds to
    6 dp.

    Scale shape: ONE corpus scan feeds a persisted exploded token stream
    (two consumers: model fit, scoring join); the fit is a vocab-bounded
    aggregate with both class counts as conditional sums (no second
    pass); the weight table is vocab-sized and broadcasts back onto the
    token stream (tens of MB at real vocab — same broadcast range as
    unigram_logprob_score); the doc fold and source rollup are map-side
    combinable aggregates. Exchanges: vocab fit + doc fold + source
    rollup, all key-bounded; the scalar totals ride single-row
    cross-joins."""
    doc_scores = nb_doc_scores(documents)
    return doc_scores.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("log_odds") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_keep"),
        F.round(
            F.sum(F.when(F.col("log_odds") > 0, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("keep_rate"),
        F.round(
            F.sum("log_odds").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_log_odds"),
        F.round(F.min("log_odds").cast("double"), 6).alias("min_log_odds"),
        F.round(F.max("log_odds").cast("double"), 6).alias("max_log_odds"),
    )


def nb_doc_scores(documents: DataFrame) -> DataFrame:
    """Per-document NB log-odds (doc_id, source, log_odds DECIMAL) —
    the fit+score core shared by quality_nb_classifier (per-source
    report) and curation_funnel (keep/drop gate stage). Documents whose
    text yields no token row (null text) emit no score row; consumers
    LEFT-join and treat a missing score as drop."""
    from flink_cep_task_spark.operators.cache import persisted

    pos = F.expr(NB_POS_LABEL_SQL)
    toks = persisted(
        documents.select(
            "doc_id",
            "source",
            pos.alias("is_pos"),
            F.explode(tokens(F.col("text"))).alias("tok"),
        )
    )
    stats = persisted(
        toks.groupBy("tok").agg(
            F.sum(F.when(F.col("is_pos"), 1).otherwise(0)).alias("c_pos"),
            F.sum(F.when(F.col("is_pos"), 0).otherwise(1)).alias("c_neg"),
        )
    )
    totals = stats.agg(
        F.sum("c_pos").cast("double").alias("__t_pos"),
        F.sum("c_neg").cast("double").alias("__t_neg"),
        F.count(F.lit(1)).cast("double").alias("__v"),
    )
    w = F.round(
        F.log((F.col("c_pos") + 1.0) / (F.col("__t_pos") + F.col("__v")))
        - F.log((F.col("c_neg") + 1.0) / (F.col("__t_neg") + F.col("__v"))),
        9,
    ).cast("decimal(18,9)")
    weights = stats.join(F.broadcast(totals)).select("tok", w.alias("w"))
    # vocab-size gate on the weight broadcast (SCALING.md r8: copy-
    # inflated corpora grow the vocab with the data): stats is persisted
    # and feeds the totals/weights anyway, so this count materializes
    # work the plan was about to do — past the gate the scoring join
    # falls back to a shuffled join on the uniform token hash
    from flink_cep_task_spark.operators.broadcast_gate import gated_broadcast

    n_vocab = stats.count()
    priors = documents.agg(
        F.round(
            F.log(
                F.sum(F.when(pos, 1).otherwise(0)).cast("double")
                / F.sum(F.when(pos, 0).otherwise(1)).cast("double")
            ),
            9,
        )
        .cast("decimal(18,9)")
        .alias("__prior")
    )
    doc_scores = (
        toks.join(gated_broadcast(weights, n_vocab), "tok")
        .groupBy("doc_id", "source")
        .agg(F.sum("w").alias("__sum_w"))
        .join(F.broadcast(priors))
        .select(
            "doc_id",
            "source",
            (F.col("__prior") + F.col("__sum_w")).alias("log_odds"),
        )
    )
    return doc_scores


def write_nb_model_store(documents: DataFrame, path: str) -> None:
    """Materialize the NB classifier model — the curation-stage analog
    of the signature/fingerprint/IVF stores, completing the incremental
    family's classifier stage: a daily pipeline fits the quality
    classifier on the curated CORPUS once, stores it, and scores each
    incoming crawl batch against the stored model without ever touching
    corpus text again.

    The model is exact and tiny: per-token log-odds weights (kind='w'),
    the class log-prior (kind='prior'), and the constant weight every
    OUT-OF-VOCABULARY token receives (kind='unseen' — under Laplace
    smoothing an unseen token's weight is ln(1/(T_pos+V)) −
    ln(1/(T_neg+V)), the same for all of them). All three are the
    9-dp-rounded DECIMALs of the in-process classifier, so a probe's
    scores are bit-identical to fitting in place; DECIMAL(18,9) round-
    trips parquet exactly."""
    from flink_cep_task_spark.operators.cache import persisted

    pos = F.expr(NB_POS_LABEL_SQL)
    # persisted like nb_doc_scores' stats: three plan branches consume
    # it (the weights join side + both totals aggregates) and would each
    # re-run the vocab groupBy otherwise
    stats = persisted(_nb_token_stats(documents))
    class_docs = documents.agg(
        F.sum(F.when(pos, 1).otherwise(0)).cast("long").alias("n_pos"),
        F.sum(F.when(pos, 0).otherwise(1)).cast("long").alias("n_neg"),
    )
    _nb_model_frame(stats, class_docs).write.mode("overwrite").parquet(path)
    stats.unpersist()


def _nb_token_stats(documents: DataFrame) -> DataFrame:
    """(tok, c_pos, c_neg) class counts over the exploded token stream —
    the ONE tokenize+label+count derivation shared by the weight-store
    and count-store writers, so a tokenization or label change can never
    silently break the count-merge ≡ refit invariant."""
    pos = F.expr(NB_POS_LABEL_SQL)
    toks = documents.select(
        pos.alias("is_pos"), F.explode(tokens(F.col("text"))).alias("tok")
    )
    return toks.groupBy("tok").agg(
        F.sum(F.when(F.col("is_pos"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(F.col("is_pos"), 0).otherwise(1)).alias("c_neg"),
    )


def _nb_model_frame(stats: DataFrame, class_docs: DataFrame) -> DataFrame:
    """The ONE derivation of the model frame (kind ∈ {'w','unseen',
    'prior'}, 9-dp DECIMAL convention) from token class counts
    (tok, c_pos, c_neg) + a 1-row class doc-count frame (n_pos, n_neg) —
    shared by the weight store writer and the count-store model
    derivation, so a refit and a count-merge can never drift."""
    totals = stats.agg(
        F.sum("c_pos").cast("double").alias("__t_pos"),
        F.sum("c_neg").cast("double").alias("__t_neg"),
        F.count(F.lit(1)).cast("double").alias("__v"),
    )
    w = F.round(
        F.log((F.col("c_pos") + 1.0) / (F.col("__t_pos") + F.col("__v")))
        - F.log((F.col("c_neg") + 1.0) / (F.col("__t_neg") + F.col("__v"))),
        9,
    ).cast("decimal(18,9)")
    weights = (
        stats.join(F.broadcast(totals))
        .select("tok", w.alias("w"), F.lit("w").alias("kind"))
    )
    unseen = totals.select(
        F.lit(None).cast("string").alias("tok"),
        F.round(
            F.log(F.lit(1.0) / (F.col("__t_pos") + F.col("__v")))
            - F.log(F.lit(1.0) / (F.col("__t_neg") + F.col("__v"))),
            9,
        )
        .cast("decimal(18,9)")
        .alias("w"),
        F.lit("unseen").alias("kind"),
    )
    prior = class_docs.select(
        F.lit(None).cast("string").alias("tok"),
        F.round(
            F.log(F.col("n_pos").cast("double") / F.col("n_neg")), 9
        )
        .cast("decimal(18,9)")
        .alias("w"),
        F.lit("prior").alias("kind"),
    )
    return weights.unionByName(unseen).unionByName(prior)


def write_nb_count_store(
    documents: DataFrame, path: str, batch: str = "base", dynamic: bool = False
) -> None:
    """The MERGEABLE edition of the NB model store — the classifier's
    maintenance-loop artifact: raw per-token class counts (kind='tok')
    plus one per-class document-count row (kind='docs'), partitioned by
    ADMISSION batch. Counts are additive, so a daily run lands its own
    batch partition (dynamic overwrite — idempotent per batch, existing
    partitions untouched) and the exact model is re-derived from SUMMED
    counts (nb_model_from_counts) without re-tokenizing a single corpus
    document. The weight store (write_nb_model_store) is the frozen
    deployment artifact; this is the one the training loop advances."""
    w = (
        nb_count_rows(documents)
        .withColumn("batch", F.lit(batch))
        .write.mode("overwrite")
        .partitionBy("batch")
    )
    if dynamic:
        w = w.option("partitionOverwriteMode", "dynamic")
    w.parquet(path)


def nb_count_rows(documents: DataFrame) -> DataFrame:
    """The count store's ROW derivation (kind='tok' per-token class
    counts + the kind='docs' class doc-count row), shared by the batch
    writer and the streaming admission path — counts are additive, so a
    day's counts equal the SUM of its micro-batches' count rows
    (plans/datapipe.daily_crawl_stream lands one bid=N set per batch;
    nb_model_from_counts re-aggregates by token across them)."""
    pos = F.expr(NB_POS_LABEL_SQL)
    stats = _nb_token_stats(documents).withColumn("kind", F.lit("tok"))
    docs_row = documents.agg(
        F.sum(F.when(pos, 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(pos, 0).otherwise(1)).alias("c_neg"),
    ).select(
        F.lit(None).cast("string").alias("tok"),
        "c_pos",
        "c_neg",
        F.lit("docs").alias("kind"),
    )
    return stats.unionByName(docs_row)


def nb_model_from_counts(counts: DataFrame) -> DataFrame:
    """Derive the exact model frame from a (filtered) count store: sum
    the token counts across the selected batch partitions, sum the
    class doc counts, and run the SAME model derivation as the weight
    store writer — count-merge ≡ refit, bit-for-bit (pinned by
    tests/test_rolling_store.py)."""
    stats = (
        counts.filter(F.col("kind") == "tok")
        .groupBy("tok")
        .agg(F.sum("c_pos").alias("c_pos"), F.sum("c_neg").alias("c_neg"))
    )
    class_docs = counts.filter(F.col("kind") == "docs").agg(
        F.sum("c_pos").cast("long").alias("n_pos"),
        F.sum("c_neg").cast("long").alias("n_neg"),
    )
    return _nb_model_frame(stats, class_docs)


def quality_nb_rolling(
    spark,
    documents: DataFrame,
    store_path: str,
    day1: str | None = None,
    day2: str | None = None,
    days: list[str] | None = None,
) -> DataFrame:
    """Day-over-day CLASSIFIER maintenance — the NB member of the
    maintenance-loop family (minhash signatures, rollup partials, IVF
    inverted file, winnowing fingerprints):

      day 1: score the day-1 batch against the model derived from the
             stored CORPUS counts (batch=base only), then ADMIT day-1's
             token/doc counts as its own batch partition
             (write_nb_count_store dynamic mode — idempotent);
      day 2: score the day-2 batch against the model derived from the
             SUMMED base ∪ d1 counts — the classifier learned from
             day-1's labeled documents without re-tokenizing them;
             count-merge ≡ refit exactly (shared _nb_model_frame).

    Day-1's model read is pinned to batch=base (rerun-safe after its own
    admission), and the admission lands under batch=DAY1'S OWN NAME —
    consecutive days accumulate their own partitions instead of
    clobbering one 'latest' slot, exactly like the source-partitioned
    sibling stores. Both models are persisted: the scorer consumes each
    model frame three ways (consts collect, vocab-gate count, scoring
    join), which would otherwise re-run the count-store aggregation per
    consumer. Oracle = the from-scratch fit+score of every day.

    Generalized to the N-day cadence (VERDICT r11 task #3): day i is
    scored against the model summed from base ∪ days 1..i-1 — each
    day's model read pins exactly the batches admitted BEFORE it, so a
    rerun after later admissions still answers as day i. The registered
    query runs days=ROLLING_DAYS (N=3: the day-3 score depends on two
    consecutive count admissions); the 2-day day1=/day2= form remains
    for the pytest fixtures."""
    from flink_cep_task_spark.operators.cache import persisted

    if days is None:
        days = [day1, day2]
    if any(d is None for d in days):
        # a silent None would filter source == NULL and return an empty
        # frame with no error
        raise ValueError("pass day1/day2 or days=[...]")
    parts = []
    admitted = ["base"]
    for i, day in enumerate(days):
        m = persisted(
            nb_model_from_counts(
                spark.read.parquet(store_path).filter(
                    F.col("batch").isin(*admitted)
                )
            )
        )
        r = quality_nb_score_from_store(
            documents.filter(F.col("source") == day), m
        )
        parts.append(r)
        write_nb_count_store(
            documents.filter(F.col("source") == day),
            store_path,
            batch=day,
            dynamic=True,
        )
        admitted.append(day)
    from flink_cep_task_spark.functions.rolling import day_union

    return day_union(parts)


def quality_nb_rolling_sql(
    day1: str | None = None,
    day2: str | None = None,
    days: list[str] | None = None,
) -> str:
    """Full-recompute oracle for the NB rolling loop: day i fit on the
    corpus minus days i..N (the days not yet crawled as of day i)."""
    from flink_cep_task_spark.functions.rolling import day_union_sql

    if days is None:
        days = [day1, day2]
    if any(d is None for d in days):
        raise ValueError("pass day1/day2 or days=[...]")
    blocks = []
    for i, day in enumerate(days):
        not_in = ", ".join(f"'{d}'" for d in days[i:])
        blocks.append(
            quality_nb_stored_sql(
                day,
                score_where=f"source = '{day}'",
                corpus_where=f"source NOT IN ({not_in})",
            )
        )
    return day_union_sql(blocks)


def nb_model_consts(model: DataFrame) -> dict:
    """Collect the 2 scalar model parameters ('prior', 'unseen') from a
    stored NB model frame, validating the store's schema contract: a
    partial or future writer that omits either row fails HERE with the
    contract named, not later with an opaque KeyError at plan build."""
    consts = {
        r["kind"]: r["w"]
        for r in model.filter(F.col("kind") != "w").select("kind", "w").collect()
    }
    missing = {"prior", "unseen"} - consts.keys()
    if missing:
        raise ValueError(
            "NB model store is missing required const rows "
            f"{sorted(missing)}: expected rows with kind in "
            "('prior', 'unseen', 'w'), got non-weight kinds "
            f"{sorted(consts)}"
        )
    return consts


def quality_nb_score_from_store(
    incoming: DataFrame,
    model: DataFrame,
    consts: dict | None = None,
    weights: DataFrame | None = None,
    n_weights: int | None = None,
) -> DataFrame:
    """Score an incoming batch against the STORED classifier: per-doc
    NB log-odds + the keep gate, corpus never read. The vocab-bounded
    weight table broadcasts onto the batch's token stream; out-of-
    vocabulary tokens coalesce to the stored unseen constant; the prior
    and unseen scalars ride a bounded 2-row collect (model parameters).
    The keep flag compares the EXACT decimal sum, so it can't flip on a
    float ulp.

    A repeated caller (the streaming scorer runs this per micro-batch)
    passes pre-collected `consts` / pre-filtered `weights` so the 2-row
    driver collect happens once per stream, not once per batch.

    The weight broadcast is vocab-size GATED (operators/broadcast_gate):
    the model store grows with vocabulary, and past the gate the scoring
    join must degrade to a shuffled join instead of force-broadcasting —
    the count is a metadata-cheap scan of the bounded store."""
    from flink_cep_task_spark.operators.broadcast_gate import gated_broadcast

    if consts is None:
        consts = nb_model_consts(model)
    if weights is None:
        weights = model.filter(F.col("kind") == "w").select("tok", "w")
    if n_weights is None:
        n_weights = weights.count()
    toks = incoming.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    scored = toks.join(gated_broadcast(weights, n_weights), "tok", "left").select(
        "doc_id",
        F.coalesce(F.col("w"), F.lit(consts["unseen"]).cast("decimal(18,9)")).alias(
            "w"
        ),
    )
    log_odds = F.lit(consts["prior"]).cast("decimal(18,9)") + F.col("__sum_w")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("w").alias("__sum_w"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(log_odds.cast("double"), 6).alias("log_odds"),
            (log_odds > 0).alias("keep"),
        )
    )


# the fit+score CTE prefix shared verbatim by QUALITY_NB_SQL and the
# curation-funnel oracle (which composes the gate stage)
NB_DOC_SCORES_CTES = f"""toks AS (
  SELECT doc_id, source, {NB_POS_LABEL_SQL} AS is_pos,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
  FROM documents
), stats AS (
  SELECT tok,
         sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS c_pos,
         sum(CASE WHEN is_pos THEN 0 ELSE 1 END) AS c_neg
  FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(sum(c_pos) AS DOUBLE) AS t_pos,
         CAST(sum(c_neg) AS DOUBLE) AS t_neg,
         CAST(count(*) AS DOUBLE) AS v
  FROM stats
), weights AS (
  SELECT tok,
         CAST(round(ln((c_pos + 1.0) / (t_pos + v))
                    - ln((c_neg + 1.0) / (t_neg + v)), 9)
              AS DECIMAL(18,9)) AS w
  FROM stats, tot
), prior AS (
  SELECT CAST(round(ln(
           CAST(sum(CASE WHEN {NB_POS_LABEL_SQL} THEN 1 ELSE 0 END) AS DOUBLE)
           / sum(CASE WHEN {NB_POS_LABEL_SQL} THEN 0 ELSE 1 END)), 9)
         AS DECIMAL(18,9)) AS p
  FROM documents
), doc_scores AS (
  SELECT doc_id, source, p + sum(w) AS log_odds
  FROM toks JOIN weights USING (tok), prior
  GROUP BY doc_id, source, p
)"""


QUALITY_NB_SQL = f"""
WITH {NB_DOC_SCORES_CTES}
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN log_odds > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       round(CAST(sum(CASE WHEN log_odds > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS keep_rate,
       round(CAST(sum(log_odds) AS DOUBLE) / count(*), 6) AS avg_log_odds,
       round(CAST(min(log_odds) AS DOUBLE), 6) AS min_log_odds,
       round(CAST(max(log_odds) AS DOUBLE), 6) AS max_log_odds
FROM doc_scores
GROUP BY source
"""


def write_bpe_merges_store(documents: DataFrame, path: str) -> None:
    """Materialize the learned BPE merge table — the tokenizer store the
    apply docstring keeps referring to, now a real artifact: a daily
    pipeline trains the vocabulary once, persists (rank, lft, rgt,
    merged, pair_count), and every tokenization job reads the store
    instead of re-running the induction. Merges are plain strings +
    longs, so the parquet round trip is exact and rank order fully
    reconstructs the greedy application sequence."""
    import pyarrow as pa

    from flink_cep_task_spark.sources.sink import write_model_parquet

    merges = _learn_bpe_merges(documents)
    # bounded model artifact: direct pyarrow write (see
    # sink.write_model_parquet — a tiny createDataFrame().write costs
    # whole seconds of Spark job overhead per call)
    write_model_parquet(
        path,
        pa.table(
            {
                "rank": pa.array([int(m[0]) for m in merges], pa.int32()),
                "lft": pa.array([m[1] for m in merges], pa.string()),
                "rgt": pa.array([m[2] for m in merges], pa.string()),
                "merged": pa.array([m[3] for m in merges], pa.string()),
                "pair_count": pa.array([int(m[4]) for m in merges], pa.int64()),
            }
        ),
    )


def bpe_apply_from_store(documents: DataFrame, store: DataFrame) -> DataFrame:
    """Tokenize the corpus with merges read from the materialized
    tokenizer store: the merge table is a bounded model artifact
    (BPE_N_MERGES rows — production: tens of thousands), collected in
    rank order and folded into the same map-only literal replace chain
    as bpe_apply_report. The induction never runs; the corpus is
    scanned exactly once."""
    merges = [
        (r["rank"], r["lft"], r["rgt"], r["merged"], r["pair_count"])
        for r in store.orderBy("rank").collect()
    ]
    return bpe_apply_report(documents, merges=merges)


def quality_nb_stored_sql(
    incoming_source: str,
    score_where: str | None = None,
    corpus_where: str | None = None,
) -> str:
    """Oracle for the stored-model probe: the full from-scratch SQL
    replay with the FIT restricted to corpus documents
    (source <> incoming) and scoring restricted to the incoming batch —
    the store changes the cost, never the answer. Out-of-vocabulary
    tokens take the Laplace unseen constant; the keep gate compares the
    exact decimal sum. `score_where` overrides WHICH documents are
    scored (default: the incoming batch; the streaming twin scores the
    whole replayed corpus); `corpus_where` overrides which documents the
    model is FIT on (the rolling loop's day-1 corpus excludes both
    days)."""
    if score_where is None:
        score_where = f"source = '{incoming_source}'"
    if corpus_where is None:
        corpus_where = f"source <> '{incoming_source}'"
    return f"""
WITH ctoks AS (
  SELECT {NB_POS_LABEL_SQL} AS is_pos,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
  FROM documents WHERE {corpus_where}
), stats AS (
  SELECT tok,
         sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS c_pos,
         sum(CASE WHEN is_pos THEN 0 ELSE 1 END) AS c_neg
  FROM ctoks GROUP BY tok
), tot AS MATERIALIZED (
  SELECT CAST(sum(c_pos) AS DOUBLE) AS t_pos,
         CAST(sum(c_neg) AS DOUBLE) AS t_neg,
         CAST(count(*) AS DOUBLE) AS v
  FROM stats
), weights AS (
  SELECT tok,
         CAST(round(ln((c_pos + 1.0) / (t_pos + v))
                    - ln((c_neg + 1.0) / (t_neg + v)), 9)
              AS DECIMAL(18,9)) AS w
  FROM stats, tot
), consts AS MATERIALIZED (
  SELECT CAST(round(ln(1.0 / (t_pos + v)) - ln(1.0 / (t_neg + v)), 9)
              AS DECIMAL(18,9)) AS unseen
  FROM tot
), prior AS MATERIALIZED (
  SELECT CAST(round(ln(
           CAST(sum(CASE WHEN {NB_POS_LABEL_SQL} THEN 1 ELSE 0 END) AS DOUBLE)
           / sum(CASE WHEN {NB_POS_LABEL_SQL} THEN 0 ELSE 1 END)), 9)
         AS DECIMAL(18,9)) AS p
  FROM documents WHERE {corpus_where}
), itoks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
  FROM documents WHERE {score_where}
), scored AS (
  SELECT doc_id,
         coalesce(w.w, (SELECT unseen FROM consts)) AS w
  FROM itoks LEFT JOIN weights w USING (tok)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(CAST(p + sum(w) AS DOUBLE), 6) AS log_odds,
       p + sum(w) > 0 AS keep
FROM scored, prior
GROUP BY doc_id, p
"""


DOC_FINGERPRINT_SQL = f"""
SELECT doc_id,
  min({gram_hash_sql("g", 5)}) AS fingerprint,
  CAST(count(DISTINCT g) AS BIGINT) AS n_distinct_grams
FROM (
  SELECT doc_id, substr(t, i, 5) AS g
  FROM (SELECT doc_id, lower(trim(text)) AS t FROM documents),
       LATERAL (SELECT unnest(generate_series(1, greatest(length(t) - 4, 0), 4)) AS i) s
)
GROUP BY doc_id
"""


# --- RAG / embedding chunking ---------------------------------------------

CHUNK_WORDS = 64    # chunk length (words)
CHUNK_STRIDE = 48   # stride (words) — 16-word overlap between neighbors
CHUNK_MIN_WORDS = 8  # a trailing fragment shorter than this is dropped


def chunk_documents(
    documents: DataFrame,
    size: int = CHUNK_WORDS,
    stride: int = CHUNK_STRIDE,
    min_words: int = CHUNK_MIN_WORDS,
) -> DataFrame:
    """Overlapping fixed-word-window chunking — the document→chunk
    primitive of an embedding/RAG pipeline (each chunk later becomes an
    embedding row; the overlap keeps boundary context). Complements
    pack_sequences (which PACKS docs into contexts) and dedup_passages
    (which hashes disjoint passages for dedup).

    Emits (doc_id, chunk_idx, start_word, n_words, chunk_md5) — the md5
    is the chunk's content key for downstream chunk-level dedup. Chunk
    count is closed-form (floor((n-min)/stride)+1 for docs with n ≥ min
    words), so the explode is a bounded Generate with no post-filter; all
    per-chunk work is JVM-side array slicing on the already-split token
    array (one split per doc, never per chunk)."""
    w = tokens(F.col("text"))
    base = (
        documents.select("doc_id", w.alias("__w"))
        .withColumn("__n", F.size("__w"))
        .filter(F.col("__n") >= min_words)
    )
    last_i = F.floor((F.col("__n") - F.lit(min_words)) / F.lit(stride)).cast("int")
    chunks = base.select(
        "doc_id",
        "__w",
        "__n",
        F.explode(F.sequence(F.lit(0), last_i)).alias("i"),
    )
    start = F.col("i").cast("long") * stride
    return chunks.select(
        "doc_id",
        F.col("i").cast("long").alias("chunk_idx"),
        start.alias("start_word"),
        F.least(F.col("__n").cast("long") - start, F.lit(size).cast("long")).alias(
            "n_words"
        ),
        F.md5(
            F.concat_ws(" ", F.slice("__w", F.col("i") * stride + 1, size))
        ).alias("chunk_md5"),
    )


CHUNK_DOCUMENTS_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w,
         len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n
  FROM documents
)
SELECT doc_id,
       i AS chunk_idx,
       i * {CHUNK_STRIDE} AS start_word,
       least(n - i * {CHUNK_STRIDE}, {CHUNK_WORDS}) AS n_words,
       md5(array_to_string(
         w[(i * {CHUNK_STRIDE} + 1):(i * {CHUNK_STRIDE} + {CHUNK_WORDS})], ' '))
         AS chunk_md5
FROM t,
     LATERAL (SELECT unnest(range(
       CAST(floor((n - {CHUNK_MIN_WORDS}) / CAST({CHUNK_STRIDE} AS DOUBLE)) AS BIGINT) + 1
     )) AS i) s
WHERE n >= {CHUNK_MIN_WORDS}
"""


# --- exact heavy hitters via mergeable Misra-Gries candidates ------------

# Counters per partition for the candidate pass. The survival guarantee
# is: any token with global frequency > N / HH_COUNTERS appears in at
# least one partition's candidate set (see heavy_hitters_report), so the
# exact second pass plus the `count * HH_COUNTERS > N` filter yields the
# EXACT heavy-hitter set — the sketch only bounds the candidate volume,
# never the answer.
HH_COUNTERS = 256


def _mg_candidates(batches):
    """Mergeable Misra-Gries over one partition's Arrow batches.

    Each batch's exact value_counts is merged into the running summary;
    when the summary exceeds HH_COUNTERS entries it is reduced by
    subtracting the (HH_COUNTERS+1)-th largest count from every entry and
    dropping the non-positives (Agarwal et al., "Mergeable Summaries" —
    the reduction removes >= (HH_COUNTERS+1) * t total mass for a
    subtraction of t, so the sum of subtractions over the partition is
    <= n_p / (HH_COUNTERS + 1) < n_p / HH_COUNTERS). Hence every token
    with partition frequency > n_p / HH_COUNTERS survives; by averaging,
    a token with GLOBAL frequency > N / HH_COUNTERS is above that
    threshold in at least one partition. Vectorized: per-token Python
    loops would defeat the Arrow batching.

    Emits candidate rows (is_total=false) plus one partition-total row
    (is_total=true) so the driver-side plan can compute N without a
    third pass over the tokens."""
    import pandas as pd

    acc = None
    n_part = 0
    for pdf in batches:
        n_part += len(pdf)
        vc = pdf["token"].value_counts()
        acc = vc if acc is None else acc.add(vc, fill_value=0)
        if len(acc) > HH_COUNTERS:
            t = acc.nlargest(HH_COUNTERS + 1).iloc[-1]
            # every counter is decremented by t (entries <= t flush to 0
            # and drop); the HH_COUNTERS+1 counters that were >= t each
            # lose a full t, so >= (HH_COUNTERS+1)*t mass is removed
            acc = acc - t
            acc = acc[acc > 0]
    toks = [] if acc is None else list(acc.index)
    yield pd.DataFrame(
        {
            "token": toks + [None],
            "n": [0] * len(toks) + [n_part],
            "is_total": [False] * len(toks) + [True],
        }
    )


def heavy_hitters_report(documents: DataFrame) -> DataFrame:
    """EXACT heavy-hitter tokens (frequency > N / HH_COUNTERS) via the
    two-pass candidate/recount pattern — the way exact frequent-item
    queries run at 100 TB, where `GROUP BY token` over a trillion-key
    Zipfian vocabulary would shuffle the entire keyspace to find the few
    hundred heavy keys.

    Pass 1 (no keyspace shuffle): per-partition mergeable Misra-Gries
    keeps HH_COUNTERS candidates per partition, so at most
    HH_COUNTERS x n_partitions candidate rows leave the scan — the
    completeness guarantee is in _mg_candidates. Pass 2: the candidate
    set (bounded, broadcast) semi-joins the token stream and only
    candidate occurrences are counted — the shuffle moves partial counts
    of <= HH_COUNTERS x n_partitions distinct keys. The final
    `count x HH_COUNTERS > N` filter makes the output exact and
    sketch-independent (any false candidate is filtered by its exact
    count), which is what lets a plain GROUP BY oracle check it.

    The token stream is re-derived for pass 2 rather than cached: at
    target scale the exploded token column is ~10x the corpus and a
    second linear scan is cheaper than materializing it.

    Broadcast scale: the candidate set is at most
    HH_COUNTERS x n_scan_partitions rows — a few million short strings
    at ~10^4 partitions, comfortable; a 100 TB scan at 10^5-10^6
    partitions breaks that. The recount join is therefore SIZE-GATED
    (operators/broadcast_gate.gated_broadcast, using the static
    HH_COUNTERS x partition-bound product — scan_partition_bound is a
    planning-only read of the raw scan's split count, so the gate costs
    no job): under the gate it broadcasts; past it the hint is dropped
    and the recount degrades to a shuffled semi-join (candidate keys
    are uniform-hashed, so the fallback shuffle is skew-free). Both
    paths are result-identity tested and the fallback is plan-pinned in
    tests/test_plans.py."""
    from flink_cep_task_spark.operators.broadcast_gate import (
        gated_broadcast,
        scan_partition_bound,
    )
    from flink_cep_task_spark.operators.cache import persisted

    tok = documents.select(F.explode(tokens(F.col("text"))).alias("token"))
    cand_bound = (HH_COUNTERS + 1) * scan_partition_bound(documents)
    # persist the sketch output (bounded: <= (HH_COUNTERS+1) x partitions
    # rows) — the cand and total branches are separate broadcast subplans
    # and would otherwise each re-run the tokenize + MG pass, silently
    # turning the documented 2 linear scans into 3 scans + 2 sketch passes
    mg = persisted(
        tok.mapInPandas(_mg_candidates, "token string, n long, is_total boolean")
    )
    cand = mg.filter(~F.col("is_total")).select("token").distinct()
    total = mg.filter(F.col("is_total")).groupBy().agg(F.sum("n").alias("n_total"))
    counts = (
        tok.join(gated_broadcast(cand, cand_bound), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    out = (
        counts.join(F.broadcast(total))
        .filter(F.col("n_occurrences") * HH_COUNTERS > F.col("n_total"))
        .select(
            "token",
            "n_occurrences",
            F.round(F.col("n_occurrences").cast("double") / F.col("n_total"), 6).alias(
                "share"
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return out.withColumn("rank", F.row_number().over(w).cast("long"))


HEAVY_HITTERS_SQL = f"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
  FROM documents
),
tot AS (SELECT count(*) AS n_total FROM tok),
cnt AS (SELECT token, count(*) AS n_occurrences FROM tok GROUP BY token)
SELECT token,
       n_occurrences,
       round(CAST(n_occurrences AS DOUBLE) / n_total, 6) AS share,
       row_number() OVER (ORDER BY n_occurrences DESC, token) AS rank
FROM cnt, tot
WHERE n_occurrences * {HH_COUNTERS} > n_total
"""


# --- PII detection / redaction -------------------------------------------

# One pattern per PII class, written in the common subset of Java regex
# (Spark's regexp_count/regexp_replace) and RE2 (DuckDB) so both engines
# match identically: character classes, bounded repetition, \b, \d only —
# no lookaround, no backreferences (RE2 has neither).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}
# redaction applies in this fixed order; the three patterns are mutually
# non-overlapping on well-formed text (an IPv4 has four dot-separated
# octets, a phone has a 4-digit tail, an email needs the @), and counts
# are taken on the ORIGINAL text so order cannot shift them anyway
PII_ORDER = ("email", "ipv4", "phone")


def pii_redact_report(documents: DataFrame) -> DataFrame:
    """Per-document PII detection + redaction fingerprint — the pipeline
    stage every public training corpus runs before release (C4 and Dolma
    both ship regex-based email/phone/IP scrubbers).

    Scale shape: strictly map-only — regexp_count / regexp_replace are
    JVM whole-stage-codegen expressions evaluated inside the scan; the
    plan has NO exchange, no Python, and emits one narrow row per doc
    (counts + the md5 of the redacted text, so the transform itself is
    hash-checked cross-engine without shipping redacted bodies around).

    The synthetic fixtures contain no PII, so the gate row checks the
    no-op path (counts 0, redacted_md5 == md5(text)) across engines;
    the match/replace semantics on PII-bearing text are parity-tested
    against DuckDB on a synthetic corpus in tests/test_pii.py."""
    counts = [
        F.regexp_count(F.col("text"), F.lit(PII_PATTERNS[k])).cast("long").alias(
            f"n_{k}"
        )
        for k in PII_ORDER
    ]
    red = F.col("text")
    for k in PII_ORDER:
        red = F.regexp_replace(red, PII_PATTERNS[k], f"<{k.upper()}>")
    total = None
    for k in PII_ORDER:
        c = F.col(f"n_{k}")
        total = c if total is None else total + c
    return (
        documents.select("doc_id", "text")
        .select("doc_id", *counts, F.md5(red).alias("redacted_md5"))
        .select(
            "doc_id",
            *[f"n_{k}" for k in PII_ORDER],
            total.alias("n_pii_total"),
            "redacted_md5",
        )
    )


def _pii_sql() -> str:
    cnt = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, '{PII_PATTERNS[k]}')) AS BIGINT)"
        f" AS n_{k}"
        for k in PII_ORDER
    )
    red = "text"
    for k in PII_ORDER:
        red = f"regexp_replace({red}, '{PII_PATTERNS[k]}', '<{k.upper()}>', 'g')"
    tot = " + ".join(f"n_{k}" for k in PII_ORDER)
    return f"""
WITH c AS (
  SELECT doc_id,
       {cnt},
       md5({red}) AS redacted_md5
  FROM documents
)
SELECT doc_id, n_email, n_ipv4, n_phone, {tot} AS n_pii_total, redacted_md5
FROM c
"""


PII_REDACT_SQL = _pii_sql()


# --- BPE merge induction (tokenizer-vocabulary learning) ------------------

BPE_N_MERGES = 5
# symbols are rendered ' sym|' (space-prefixed, pipe-terminated): the
# space anchors the LEFT boundary and the pipe the RIGHT, so the literal
# pattern ' a| b|' matches the symbol pair (a, b) and nothing else —
# ' xa| b|' (left-extended) and ' a| bc|' (right-extended) don't match —
# while the replacement ' ab|' preserves the following symbol's leading
# space, so left-to-right non-overlapping replace() applies the merge
# greedily across runs ('abab' -> 'ab','ab'), exactly BPE's application
# order, identically in Spark and DuckDB (prototyped both).
_BPE_WORD_RE = "^[a-z0-9]+$"


def _learn_bpe_merges(documents: DataFrame) -> list[tuple[int, str, str, str, int]]:
    """Induction loop shared by bpe_merges_report (which reports the
    merges themselves) and bpe_apply_report (which encodes the corpus
    with them). Returns [(rank, lft, rgt, merged, pair_count), ...] —
    a bounded model parameter, like fitted k-means centroids."""
    from flink_cep_task_spark.operators.cache import persisted

    words = (
        documents.select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.col("w").rlike(_BPE_WORD_RE))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seg = persisted(
        words.select(
            F.regexp_replace("w", "(.)", " $1|").alias("seg"), "freq"
        )
    )
    merges: list[tuple[int, str, str, str, int]] = []
    generations: list[DataFrame] = [seg]
    for _rank in range(1, BPE_N_MERGES + 1):
        arr = F.split(F.expr("rtrim('|', trim(seg))"), r"\| ")
        # single-symbol words yield an empty zip and drop out of the
        # posexplode on their own — no pre-filter needed
        pairs = seg.select(
            F.posexplode(
                F.arrays_zip(
                    F.slice(arr, 1, F.size(arr) - 1).alias("l"),
                    F.slice(arr, 2, F.size(arr) - 1).alias("r"),
                )
            ).alias("_", "p"),
            "freq",
        )
        best = (
            pairs.groupBy(F.col("p.l").alias("lft"), F.col("p.r").alias("rgt"))
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "lft", "rgt")
            .limit(1)
            .collect()
        )
        if not best:
            break
        lft, rgt, cnt = best[0]["lft"], best[0]["rgt"], best[0]["pair_count"]
        merges.append((_rank, lft, rgt, lft + rgt, cnt))
        seg = persisted(
            seg.select(
                F.replace(
                    "seg", F.lit(f" {lft}| {rgt}|"), F.lit(f" {lft}{rgt}|")
                ).alias("seg"),
                "freq",
            )
        )
        generations.append(seg)
    # Unpersists are DEFERRED to after convergence (same cache
    # discipline as dedup._cc_fixpoint_loop): dropping generation N-1
    # mid-loop makes Spark recompile-and-drop generation N's
    # just-materialized buffers, so every later round re-ran the whole
    # lineage back to the corpus word count. The price is
    # BPE_N_MERGES+1 copies of the vocabulary table briefly co-resident
    # — vocabulary-bounded, not corpus-bounded, so the memory stays
    # model-sized; the result itself is a driver-side list, so nothing
    # downstream depends on these caches. If a large multilingual
    # vocabulary × many merges ever makes that aggregate footprint
    # spill, the relief valve is the one _cc_fixpoint_loop uses for its
    # final mapping: localCheckpoint each generation (lineage truncated
    # ⇒ no recompile-and-drop cascade) so predecessors can be freed
    # mid-loop (ADVICE r10 — deliberate deferral until pressure shows).
    for g in generations:
        g.unpersist()
    return merges


def bpe_merges_report(
    documents: DataFrame,
    merges: list[tuple[int, str, str, str, int]] | None = None,
) -> DataFrame:
    """Learn the first BPE_N_MERGES byte-pair-encoding merges from the
    corpus — the vocabulary-induction step of tokenizer training (the
    word-frequency formulation HuggingFace's trainer uses): start from
    characters, repeatedly merge the globally most frequent adjacent
    symbol pair (ties: lexicographic on (left, right)), weighting each
    word's pairs by its corpus frequency.

    Scale shape: the iteration state is the DISTINCT-WORD table
    (vocabulary-bounded — millions of rows at 100 TB, not the corpus),
    built by ONE corpus scan + aggregate and persisted; each round is a
    map-side weighted pair count over that table plus a 1-row argmax
    collect (a model parameter, like the k-means centroids). The corpus
    text is never rescanned after round 0.

    Output: (rank, lft, rgt, merged, pair_count) per learned merge; the
    oracle replays the identical rounds as unrolled CTEs. Pass
    precomputed `merges` (registry wrapper memo) to skip the re-fit."""
    return documents.sparkSession.createDataFrame(
        _learn_bpe_merges(documents) if merges is None else merges,
        "rank INT, lft STRING, rgt STRING, merged STRING, pair_count BIGINT",
    )


def bpe_apply_report(
    documents: DataFrame,
    merges: list[tuple[int, str, str, str, int]] | None = None,
) -> DataFrame:
    """Encode every document with the merges learned by the BPE
    induction — the second half of the tokenizer story: after training a
    vocabulary, the pipeline tokenizes the corpus with it and reports
    per-document token counts and fertility (learned-BPE tokens per
    whitespace word) against the character baseline.

    Encoding rides the same boundary-marked representation the induction
    proved exact in both engines: each in-vocabulary word (lowercased,
    `[a-z0-9]+`) renders as ' c1| c2|…', words join with a '#' separator
    that no ' a| b|' pair pattern can straddle, and each learned merge
    applies as ONE literal replace over the whole document — greedy
    left-to-right non-overlap, exactly BPE's application order, per word,
    in a single pass over the corpus. Token count falls out as the number
    of '|' terminators; no explode, no per-word rows.

    Scale shape: the merge list is a collected model parameter
    (BPE_N_MERGES rows) folded into the projection as literals, so the
    encode is a map-only plan — ONE corpus scan, ZERO exchanges
    (plan-pinned). Unlike the NB weight table, the merge table does NOT
    grow with corpus vocabulary: its size is the induction's fixed merge
    BUDGET (BPE_N_MERGES — a tokenizer design constant), so no size gate
    is needed here. A production-size budget (30k merges) would swap
    the literal replace chain for a mapInPandas trie encoder with the
    merge table broadcast — same scan shape, the chain is chosen here
    because it is exactly replayable by the SQL oracle. The induction
    itself re-runs first (vocabulary-bounded, see _learn_bpe_merges);
    a real pipeline would read the merges from the tokenizer store;
    pass precomputed `merges` (the registry wrapper memoizes them per
    (process, sf_dir)) to skip the re-fit."""
    words = F.filter(
        tokens(F.col("text")), lambda w: w.rlike(_BPE_WORD_RE)
    )
    seg = F.array_join(
        F.transform(
            words, lambda w: F.regexp_replace(w, F.lit("(.)"), F.lit(" $1|"))
        ),
        "#",
    )
    if merges is None:
        merges = _learn_bpe_merges(documents)
    for _rank, lft, rgt, merged, _cnt in merges:
        seg = F.replace(seg, F.lit(f" {lft}| {rgt}|"), F.lit(f" {merged}|"))
    n_words = F.size(words)
    n_chars = F.length(F.array_join(words, ""))
    n_tokens = F.length(seg) - F.length(F.replace(seg, F.lit("|"), F.lit("")))
    return documents.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_bpe_tokens"),
        F.when(
            n_words > 0,
            F.round(n_tokens.cast("double") / n_words.cast("double"), 6),
        ).alias("fertility"),
        F.when(
            n_tokens > 0,
            F.round(n_chars.cast("double") / n_tokens.cast("double"), 6),
        ).alias("chars_per_token"),
    )


def _bpe_cte_chain() -> list[str]:
    """The unrolled induction CTE chain shared by the merges oracle and
    the apply oracle: round r picks its argmax pair from seg{r} and
    rewrites seg{r} -> seg{r+1} with the same boundary-marked replace.
    Scalar subqueries coalesce to a \\x00 sentinel so an empty round
    (fully-merged vocabulary) no-ops instead of NULLing the
    segmentation; empty m{r} CTEs contribute zero output rows, matching
    the engine's break. m{r} is AS MATERIALIZED: each argmax is
    referenced by several scalar subqueries downstream (4 in seg{r+1},
    2 per enc{r} in the apply oracle), and DuckDB re-inlines a plain CTE
    per reference — the chained re-expansion turned the apply oracle
    O(rows x induction) (>120 s at sf0.001) vs 0.25 s materialized."""
    ctes = [
        f"""w AS (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
    FROM documents
  ) WHERE regexp_matches(w, '{_BPE_WORD_RE}') GROUP BY w
),
seg1 AS (SELECT regexp_replace(w, '(.)', ' \\1|', 'g') AS seg, freq FROM w)"""
    ]
    for r in range(1, BPE_N_MERGES + 1):
        ctes.append(f"""p{r} AS (
  SELECT arr[i] AS lft, arr[i + 1] AS rgt, sum(freq) AS pair_count
  FROM (
    SELECT arr, freq, unnest(generate_series(1, len(arr) - 1)) AS i
    FROM (SELECT string_split(rtrim(trim(seg), '|'), '| ') AS arr, freq
          FROM seg{r}) t
    WHERE len(arr) >= 2
  ) GROUP BY 1, 2
),
m{r} AS MATERIALIZED (SELECT lft, rgt, pair_count FROM p{r}
         ORDER BY pair_count DESC, lft, rgt LIMIT 1)""")
        ctes.append(f"""seg{r + 1} AS (
  SELECT replace(seg,
                 ' ' || coalesce((SELECT lft FROM m{r}), chr(0)) || '| '
                     || coalesce((SELECT rgt FROM m{r}), chr(0)) || '|',
                 ' ' || coalesce((SELECT lft FROM m{r}), chr(0))
                     || coalesce((SELECT rgt FROM m{r}), chr(0)) || '|') AS seg,
         freq
  FROM seg{r}
)""")
    return ctes


def _bpe_sql() -> str:
    finals = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INT) AS rank, lft, rgt, lft || rgt AS merged, "
        f"CAST(pair_count AS BIGINT) AS pair_count FROM m{r}"
        for r in range(1, BPE_N_MERGES + 1)
    )
    return "WITH " + ",\n".join(_bpe_cte_chain()) + "\n" + finals


BPE_MERGES_SQL = _bpe_sql()


def _bpe_apply_sql() -> str:
    """Apply oracle: derive m1..m{N} with the shared induction chain,
    then re-encode every document — per-word char segmentation joined by
    the '#' separator no pair pattern can straddle, the same
    sentinel-coalesced literal replace per round, token count = number
    of '|' terminators."""
    words = (
        "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), "
        f"w -> regexp_matches(w, '{_BPE_WORD_RE}'))"
    )
    ctes = _bpe_cte_chain()
    ctes.append(f"""docseg AS (
  SELECT doc_id,
         len(ws) AS n_words,
         len(array_to_string(ws, '')) AS n_chars,
         array_to_string(
           list_transform(ws, w -> regexp_replace(w, '(.)', ' \\1|', 'g')),
           '#') AS seg
  FROM (SELECT doc_id, {words} AS ws FROM documents)
)""")
    prev = "docseg"
    for r in range(1, BPE_N_MERGES + 1):
        ctes.append(f"""enc{r} AS (
  SELECT doc_id, n_words, n_chars,
         replace(seg,
                 ' ' || coalesce((SELECT lft FROM m{r}), chr(0)) || '| '
                     || coalesce((SELECT rgt FROM m{r}), chr(0)) || '|',
                 ' ' || coalesce((SELECT lft FROM m{r}), chr(0))
                     || coalesce((SELECT rgt FROM m{r}), chr(0)) || '|') AS seg
  FROM {prev}
)""")
        prev = f"enc{r}"
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(len(seg) - len(replace(seg, '|', '')) AS BIGINT) AS n_bpe_tokens,
       CASE WHEN n_words > 0 THEN
         round(CAST(len(seg) - len(replace(seg, '|', '')) AS DOUBLE)
               / n_words, 6) END AS fertility,
       CASE WHEN len(seg) - len(replace(seg, '|', '')) > 0 THEN
         round(CAST(n_chars AS DOUBLE)
               / (len(seg) - len(replace(seg, '|', ''))), 6) END
         AS chars_per_token
FROM {prev}"""
    )


BPE_APPLY_SQL = _bpe_apply_sql()
