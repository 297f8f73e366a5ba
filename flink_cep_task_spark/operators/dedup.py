"""Deduplication operators over `documents`: exact, MinHash-LSH, SimHash,
and exact n-gram Jaccard.

Scale design (the point of each variant):
  * exact        — one shuffle on the normalized-text key; at 100 TB use the
                   md5 of the normalized text as the shuffle key so the
                   exchange moves 16-byte keys, not document bodies.
  * minhash_lsh  — signatures are 16 min-aggregates over exploded shingles
                   (single pass); banding turns the quadratic pair search
                   into an equi-join on (band, signature) — the only join
                   fan-in is genuinely-colliding buckets.
  * simhash      — 60-bit signature from 60 sum-aggregates (one pass, no
                   bit-explode); banding into 6×10-bit chunks makes the
                   candidate join exact for hamming ≤ 5 (pigeonhole), so no
                   brute-force pair scan ever runs in Spark.
  * ngram_jaccard— EXACT set-similarity join via positional prefix
                   filtering: only rarest-first prefixes of each document
                   generate candidates (hot boilerplate shingles sort to
                   the suffix and never join); full-set verify.

Every hash is the portable md5-60bit (functions/hashing.py), so the DuckDB
oracles replicate results bit-for-bit. The oracle for simhash intentionally
uses the O(n²) brute-force pair scan — it validates that Spark's banded
join loses nothing.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_cep_task_spark.functions.hashing import (
    h64_sql,
    perm_hash,
    perm_hash_sql,
)
from flink_cep_task_spark.operators.text import norm_text, tokens

SHINGLE = 3
NUM_PERMS = 16
BANDS = 4          # 4 rows per band
ROWS_PER_BAND = NUM_PERMS // BANDS
MINHASH_TAU = 0.5
JACCARD_TAU = 0.5
SIMHASH_BITS = 60
SIMHASH_CHUNKS = 6          # 10-bit chunks ⇒ lossless for hamming ≤ 5
SIMHASH_MAX_HAMMING = SIMHASH_CHUNKS - 1
CHUNK_BITS = SIMHASH_BITS // SIMHASH_CHUNKS


# --- exact dedup ---------------------------------------------------------

def _norm(c: Column) -> Column:
    # strip non-alphanumerics, collapse whitespace: near-identical bodies
    # that differ only in punctuation/spacing collapse together.
    return F.trim(F.regexp_replace(F.regexp_replace(norm_text(c), r"[^a-z0-9\s]", ""), r"\s+", " "))


def _exact_key():
    """The normalized-text dedup key Column — the Spark twin of
    DEDUP_KEY_SQL, shared by every operator in the exact-dedup family."""
    return F.md5(F.coalesce(_norm(F.col("text")), F.lit("\x00null")))


def dedup_exact(documents: DataFrame) -> DataFrame:
    """Each doc mapped to the min doc_id sharing its normalized text.

    The shuffle key is md5(normalized text) — a fixed 32-byte key — so the
    exchange moves hashes, not document bodies; and the canonical id comes
    from an AGGREGATE + equi-join rather than a window function, so the
    min is a cheap streaming fold even over a pathological duplicate
    cluster (md5 collisions are negligible at any realistic corpus size).

    The key projection is EXPLICITLY repartitioned on k so the aggregate
    and the join probe both read ONE exchange (Spark's exchange reuse):
    without it the two branches each recompute the normalize+regex+md5
    projection — invisible at test scale, but it doubles the dominant
    per-row cost (measured 47 s → 23 s on the 64× scaling corpus). The
    join branch always shuffled every row on k anyway, so hot-cluster
    skew exposure is unchanged and stays AQE-splittable.

    NULL text hashes a NUL-prefixed sentinel (normalized text is lowercase
    alnum+space, so the sentinel can't collide) instead of propagating a
    NULL join key that would silently drop null-text documents; the oracle
    COALESCEs identically, so all-null docs form one duplicate cluster in
    both engines."""
    k = _exact_key()
    d = documents.select("doc_id", k.alias("k")).repartition("k")
    canon = d.groupBy("k").agg(F.min("doc_id").alias("canonical_id"))
    return d.join(canon, "k").select(
        "doc_id",
        "canonical_id",
        (F.col("doc_id") != F.col("canonical_id")).alias("is_duplicate"),
    )


# the normalized-text dedup key, shared verbatim by every SQL oracle that
# composes exact dedup (DEDUP_EXACT_SQL, the curation funnel) — a drifted
# copy would compute a DIFFERENT duplicate relation than the operator
DEDUP_KEY_SQL = (
    "md5(coalesce(trim(regexp_replace(regexp_replace(lower(trim(text)),"
    " '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')), chr(0) || 'null'))"
)

DEDUP_EXACT_SQL = f"""
SELECT doc_id,
       min(doc_id) OVER (PARTITION BY k) AS canonical_id,
       doc_id <> min(doc_id) OVER (PARTITION BY k) AS is_duplicate
FROM (SELECT doc_id, {DEDUP_KEY_SQL} AS k
      FROM documents)
"""


INCREMENTAL_INCOMING_SOURCE = "src0"  # stands in for "today's crawl"


def _incoming_filter(incoming):
    """The incremental probes' incoming-batch predicate: a plain source
    name in the common case (pushes to the scan as a partition/data
    filter), or a prebuilt Column for composite batches — the recrawl
    day's "today's source plus re-fetched day-1 docs" mix
    (plans/datapipe.daily_crawl_recrawl). Store-side corpus reads negate
    the same predicate, so the two sides stay exact complements for any
    predicate whose columns are non-NULL in every row (true for the
    test tables: doc_id and source are generated NOT NULL). Under SQL
    three-valued logic a NULL predicate column makes BOTH the filter
    and its negation NULL — the row silently leaves both sides — so a
    composite predicate over nullable columns must null-guard itself
    (coalesce(pred, FALSE) on the incoming side and coalesce(NOT pred,
    TRUE) on the corpus side) to stay a true complement (ADVICE r12)."""
    from pyspark.sql import Column

    if isinstance(incoming, Column):
        return incoming
    return F.col("source") == incoming


def dedup_incremental(
    documents: DataFrame, incoming_source: str = INCREMENTAL_INCOMING_SOURCE
) -> DataFrame:
    """PRODUCTION-shaped incremental dedup: a NEW batch (one source,
    standing in for today's crawl) checked against the EXISTING corpus
    (every other source). Each incoming doc is classified:

      corpus_dup — its key already exists in the corpus
      batch_dup  — new to the corpus but repeats within the batch
                   (min doc_id of the batch cluster is the canonical)
      new        — first sighting anywhere

    Scale shape: the corpus side collapses to DISTINCT 32-byte keys
    before the join (text never leaves its scan), and the incoming batch
    is typically orders of magnitude smaller than the corpus — AQE
    broadcasts it. This is the shape a daily pipeline runs; dedup_exact
    is its full-corpus backfill cousin."""
    k = _exact_key()
    inc = documents.filter(F.col("source") == incoming_source).select(
        "doc_id", k.alias("k")
    )
    corpus_keys = (
        documents.filter(F.col("source") != incoming_source)
        .select(k.alias("k"))
        .distinct()
        .withColumn("__in_corpus", F.lit(1))
    )
    batch_canon = inc.groupBy("k").agg(F.min("doc_id").alias("__canon"))
    return (
        inc.join(corpus_keys, "k", "left")
        .join(batch_canon, "k")
        .select(
            "doc_id",
            F.when(F.col("__in_corpus").isNotNull(), F.lit("corpus_dup"))
            .when(F.col("doc_id") != F.col("__canon"), F.lit("batch_dup"))
            .otherwise(F.lit("new"))
            .alias("status"),
        )
    )


def dedup_incremental_sql(incoming_source: str = INCREMENTAL_INCOMING_SOURCE) -> str:
    """Oracle builder tracking dedup_incremental's `incoming_source`
    argument — a caller overriding the batch source gets a matching
    oracle instead of silently diverging from a constant baked with the
    default (ADVICE r5)."""
    return f"""
WITH inc AS (
  SELECT doc_id, {DEDUP_KEY_SQL} AS k FROM documents
  WHERE source = '{incoming_source}'
),
corpus AS (
  SELECT DISTINCT {DEDUP_KEY_SQL} AS k FROM documents
  WHERE source <> '{incoming_source}'
),
canon AS (SELECT k, min(doc_id) AS canon FROM inc GROUP BY k)
SELECT i.doc_id,
       CASE WHEN c.k IS NOT NULL THEN 'corpus_dup'
            WHEN i.doc_id <> n.canon THEN 'batch_dup'
            ELSE 'new' END AS status
FROM inc i
LEFT JOIN corpus c ON i.k = c.k
JOIN canon n ON i.k = n.k
"""


DEDUP_INCREMENTAL_SQL = dedup_incremental_sql()


# --- shared shingle extraction ------------------------------------------

# tracked persistence shared with similarity.py — see operators/cache.py
from flink_cep_task_spark.operators.cache import persisted as _persisted
from flink_cep_task_spark.operators.cache import release_caches  # noqa: F401 (public API)

SHINGLES_CTE = """
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents),
       LATERAL (SELECT unnest(generate_series(1, len(w) - 2)) AS i) s
)
"""


def _make_shingle_udf():
    """DISTINCT word-3-gram 60-bit hashes per document in one Arrow batch —
    the Catalyst transform/array_distinct/concat chain is interpreted per
    element and dominated the stage. Python md5[:15 hex] == h64 exactly,
    and the tokenization mirrors tokens(): split lowercased+trimmed text on
    whitespace runs."""
    import hashlib as _hl
    import re as _re

    @F.pandas_udf("array<long>")
    def sh_hashes(texts: pd.Series) -> pd.Series:
        ws = _re.compile(r"\s+")
        # gram→hash memo shared across the batch: real corpora repeat
        # shingles heavily (boilerplate; here a tiny vocabulary), so most
        # md5 calls are cache hits — output is bit-identical either way
        memo: dict[str, int] = {}
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            # strip(' ') not strip(): SQL trim() removes SPACES only, and
            # re.split (like DuckDB regexp_split_to_array) keeps the empty
            # tokens a stray \n produces — same token stream as the oracle
            toks = ws.split(t.strip(" ").lower())
            if len(toks) >= SHINGLE:
                grams = {
                    " ".join(toks[i : i + SHINGLE])
                    for i in range(len(toks) - SHINGLE + 1)
                }
                hs = []
                for g in grams:
                    h = memo.get(g)
                    if h is None:
                        h = memo[g] = int(_hl.md5(g.encode()).hexdigest()[:15], 16)
                    hs.append(h)
                out.append(hs)
            else:
                out.append([])
        return pd.Series(out)

    return sh_hashes


def shingles_hashed(documents: DataFrame) -> DataFrame:
    """(doc_id, sh BIGINT) — shingles hashed to portable 60-bit ints at the
    source, so every downstream join/shuffle/aggregation moves 8-byte keys
    instead of ~20-char strings (the set algebra is identical modulo md5
    collisions, which are negligible)."""
    from flink_cep_task_spark.operators.cache import copy_provenance

    udf = _make_shingle_udf()
    return copy_provenance(
        documents.select("doc_id", F.explode(udf(F.col("text"))).alias("sh")),
        documents,
    )


def shingles_hashed_cte(suffix: str = "", source: str = "documents") -> str:
    """The shingle-extraction CTE pair with parameterizable names, for
    oracles that need a SECOND independent copy next to one already
    embedded in a subquery (string-replace surgery on the shared constant
    silently breaks when the constant is reformatted). `source` lets a
    composed oracle shingle a survivor CTE instead of the base table
    (curation_funnel's near-dup stage)."""
    return f"""sh{suffix} AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM {source}),
       LATERAL (SELECT unnest(generate_series(1, len(w) - 2)) AS i) s
),
shh{suffix} AS (SELECT doc_id, {h64_sql("shingle")} AS sh FROM sh{suffix})
"""


SHINGLES_HASHED_CTE = shingles_hashed_cte()


def _pair_jaccard(sh: DataFrame, candidates: DataFrame, tau: float) -> DataFrame:
    """Exact Jaccard for candidate (doc_a < doc_b) pairs from hashed
    shingle sets (columns: doc_id, sh).

    Verification joins each candidate pair against per-doc shingle ARRAYS
    (one row per pair) and intersects JVM-side with array_intersect —
    instead of expanding every pair by |A| shingle rows and re-joining on
    (doc_b, sh), which shuffles candidates × avg-set-size rows (measured
    ~6M intermediate rows at sf0.1 for the exact-Jaccard query, the
    dominant stage). Set sizes ride along as array lengths, so the old
    per-doc sizes aggregate and its two extra joins disappear too."""
    sets = sh.groupBy("doc_id").agg(F.collect_list("sh").alias("S"))
    va = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("S").alias("Sa"), F.size("S").alias("na")
    )
    vb = sets.select(
        F.col("doc_id").alias("doc_b"), F.col("S").alias("Sb"), F.size("S").alias("nb")
    )
    return (
        candidates.join(va, "doc_a")
        .join(vb, "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("Sa", "Sb")).cast("long"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= tau)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


# --- MinHash + LSH banding ----------------------------------------------

def minhash_signatures(documents: DataFrame) -> DataFrame:
    """16 minhash values per doc in ONE aggregation pass (no perm explode)."""
    return _minhash_from_shingles(shingles_hashed(documents))


def _minhash_from_shingles(sh: DataFrame) -> DataFrame:
    """ONE md5 per shingle + 16 Carter-Wegman integer permutations (instead
    of 16 md5 calls per shingle — the string hash dominated the stage)."""
    aggs = [
        F.min(perm_hash(F.col("sh"), p)).alias(f"mh{p}")
        for p in range(NUM_PERMS)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _banded(sig: DataFrame) -> DataFrame:
    """Explode a 16-column signature frame into (doc_id, band, sig) rows —
    the LSH banding shared by the full-corpus pair search and the
    incremental probe (and derivable from a stored signature table, so a
    signature store needs only the mh columns).

    Null-signature rows are dropped HERE, in the one shared site: the
    signature store keeps a row for EVERY doc (its exact-dedup key
    column must be complete — a <SHINGLE-token doc still has a key) but
    shingle-less docs carry null mh columns, and concat_ws SKIPS nulls,
    so without the filter every such doc would band-collide on the
    empty-string signature — a quadratic candidate explosion among
    short docs. A shingle-less doc has no near-dup pairs by definition
    (the oracle's shingle CTE emits nothing for it)."""
    sig = sig.filter(F.col("mh0").isNotNull())
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_",
                    *[F.col(f"mh{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
                ).alias("sig"),
            )
            for b in range(BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(band_structs).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def _self_band_candidates(banded: DataFrame) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs whose signatures collide in some
    band — the ONE self-join candidate criterion, shared by the
    full-corpus pair search (dedup_minhash_lsh), the incoming↔incoming
    branch of incremental_cluster_edges, and the store-side pair
    derivation (minhash_pairs_from_store), so the predicate can never
    drift between them. `banded` is a (doc_id, band, sig) frame."""
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def dedup_minhash_lsh(documents: DataFrame) -> DataFrame:
    """LSH-candidate pairs verified with exact Jaccard ≥ 0.5.

    The hashed-shingle DataFrame is computed once and persisted — it feeds
    both the signature aggregation and the exact-Jaccard verification, and
    the explode+distinct it contains is the expensive part of the plan.
    The returned (lazy) plan references the cached data; call
    release_caches() once results are consumed (see _persisted).

    The verified pair set itself is persisted in the session-SHARED tier
    (cache.persisted_shared): it is tiny (near-dup rate × corpus) and is
    rebuilt identically by dedup_clusters for its edge list — whichever
    query materializes first, the other's canonically-identical fragment
    hits the cache instead of re-running the whole LSH pipeline."""
    from flink_cep_task_spark.operators.cache import persisted_shared

    sh = _persisted(shingles_hashed(documents))
    cand = _self_band_candidates(_banded(_minhash_from_shingles(sh)))
    return persisted_shared(_pair_jaccard(sh, cand, MINHASH_TAU), src=sh)


def _minhash_sql(source: str = "documents") -> str:
    mh_aggs = ",\n    ".join(
        "min({h}) AS mh{p}".format(h=perm_hash_sql("sh", p), p=p)
        for p in range(NUM_PERMS)
    )
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band, "
        + " || '_' || ".join(
            f"CAST(mh{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        )
        + " AS sig FROM sig"
        for b in range(BANDS)
    )
    return f"""
WITH {shingles_hashed_cte(source=source).strip()},
sig AS (
  SELECT doc_id,
    {mh_aggs}
  FROM shh
  GROUP BY doc_id
),
banded AS (
{band_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN shh sa ON sa.doc_id = c.doc_a
  JOIN shh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b, CAST(i.n_common AS BIGINT) AS n_common,
       round(CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common), 6) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE round(CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common), 6) >= {MINHASH_TAU}
"""


# --- exact n-gram Jaccard (inverted index) -------------------------------

def dedup_ngram_jaccard(documents: DataFrame) -> DataFrame:
    """ALL pairs with Jaccard ≥ 0.5 — exact, via positional prefix
    filtering (Chaudhuri/Bayardo set-similarity join).

    A naive inverted-index join produces k² candidate pairs per shingle of
    document frequency k — hot boilerplate shingles make that quadratic.
    Prefix filter: order every document's shingles by GLOBAL df (rarest
    first, sh tiebreak); a pair with Jaccard ≥ τ must have overlap
    ≥ ⌈τ·|A|⌉, and two sets with that much overlap necessarily share an
    element inside their first |A|-⌈τ·|A|⌉+1 shingles. So only PREFIXES
    join — hot shingles sort to the ends of documents and almost never
    generate candidates — and verification over the full sets keeps the
    result exact (no df-cap loss)."""
    sh = _persisted(shingles_hashed(documents))
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("__df"))
    w_doc = Window.partitionBy("doc_id").orderBy("__df", "sh")
    ranked = (
        sh.join(dfreq, "sh")
        .withColumn("__rn", F.row_number().over(w_doc))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    )
    prefix = ranked.filter(
        F.col("__rn") <= F.col("__n") - F.ceil(F.lit(JACCARD_TAU) * F.col("__n")) + 1
    ).select("doc_id", "sh", "__rn", "__n")
    a = prefix.select(
        F.col("doc_id").alias("doc_a"), "sh",
        F.col("__rn").alias("__rna"), F.col("__n").alias("__na"),
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"), "sh",
        F.col("__rn").alias("__rnb"), F.col("__n").alias("__nb"),
    )
    # PPJoin bounds cut the candidate set BEFORE the expensive exact-verify
    # join; both are sound (they only drop pairs that provably cannot reach
    # τ), so the final pair set — and the oracle — are unchanged:
    #   * length filter: J ≥ τ forces τ·|B| ≤ |A| (size-compatible pairs)
    #   * positional filters: with prefixes in one GLOBAL (df, sh) order,
    #     every shared element beyond a known shared one x must rank after
    #     x in BOTH documents (both sets list elements in the same global
    #     order). Two sound overlap bounds follow, and we apply their min:
    #       - first-match:  overlap ≤ 1 + min(|A|−rnA₁, |B|−rnB₁) at the
    #         smallest shared prefix element;
    #       - count+last:   overlap ≤ c + min(|A|−rnAc, |B|−rnBc) with c
    #         shared prefix elements, positions of the LARGEST one — every
    #         uncounted shared element lies in a suffix, hence ranks after
    #         it in both docs.
    #     J ≥ τ needs overlap ≥ ⌈τ/(1+τ)·(|A|+|B|)⌉.
    sized = (
        a.join(b, ["sh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            (F.col("__na") >= F.ceil(F.lit(JACCARD_TAU) * F.col("__nb")))
            & (F.col("__nb") >= F.ceil(F.lit(JACCARD_TAU) * F.col("__na")))
        )
    )
    alpha = F.ceil(
        F.lit(JACCARD_TAU / (1.0 + JACCARD_TAU)) * (F.col("__na") + F.col("__nb"))
    )
    bound_first = F.lit(1) + F.least(
        F.col("__na") - F.col("__rna_min"), F.col("__nb") - F.col("__rnb_min")
    )
    bound_last = F.col("__c") + F.least(
        F.col("__na") - F.col("__rna_max"), F.col("__nb") - F.col("__rnb_max")
    )
    cand = (
        sized.groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.min("__rna").alias("__rna_min"),
            F.min("__rnb").alias("__rnb_min"),
            F.max("__rna").alias("__rna_max"),
            F.max("__rnb").alias("__rnb_max"),
            F.max("__na").alias("__na"),
            F.max("__nb").alias("__nb"),
        )
        .filter(F.least(bound_first, bound_last) >= alpha)
        .select("doc_a", "doc_b")
    )
    return _pair_jaccard(sh, cand, JACCARD_TAU)


NGRAM_JACCARD_SQL = f"""
WITH {SHINGLES_HASHED_CTE.strip()},
dfreq AS (SELECT sh, count(*) AS df FROM shh GROUP BY sh),
ranked AS (
  SELECT shh.doc_id, shh.sh,
         row_number() OVER (PARTITION BY shh.doc_id ORDER BY d.df, shh.sh) AS rn,
         count(*) OVER (PARTITION BY shh.doc_id) AS n
  FROM shh JOIN dfreq d USING (sh)
),
prefix AS (
  SELECT doc_id, sh FROM ranked
  WHERE rn <= n - CAST(ceil({JACCARD_TAU} * n) AS BIGINT) + 1
),
sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM prefix a JOIN prefix b ON a.sh = b.sh AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN shh sa ON sa.doc_id = c.doc_a
  JOIN shh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b, CAST(i.n_common AS BIGINT) AS n_common,
       round(CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common), 6) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE round(CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common), 6) >= {JACCARD_TAU}
"""


# --- SimHash -------------------------------------------------------------

def simhash_signatures(documents: DataFrame) -> DataFrame:
    """60-bit simhash per doc (term frequency weights repeated tokens),
    computed in one Arrow batch per partition: hash each token (python md5
    == h64 bit-for-bit), unpack hash bits into a ±1 matrix, sum columns,
    take signs — replacing a token explode + 60-column signed-sum
    aggregation (a shuffle plus 60 interpreted CASE aggregates)."""
    import hashlib as _hl
    import re as _re

    import numpy as np

    bit_idx = np.arange(SIMHASH_BITS, dtype=np.uint64)

    @F.pandas_udf("long")
    def sim(texts: pd.Series) -> pd.Series:
        ws = _re.compile(r"\s+")
        memo: dict[str, int] = {}  # token→hash across the batch (tf weights
        out = []                   # come from repetition in the LIST below)

        def th(tok: str) -> int:
            h = memo.get(tok)
            if h is None:
                h = memo[tok] = int(_hl.md5(tok.encode()).hexdigest()[:15], 16)
            return h

        for t in texts:
            if t is None:
                out.append(None)  # null text ⇒ null sig ⇒ filtered (the
                continue          # oracle's unnest drops the doc too)
            # strip(' ') mirrors SQL trim (spaces only) — see _make_shingle_udf
            toks = ws.split(t.strip(" ").lower())
            hs = np.array([th(tok) for tok in toks], dtype=np.uint64)
            bits = (hs[:, None] >> bit_idx) & 1          # (n_toks, 60)
            sums = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            sig = int(((sums > 0).astype(np.uint64) << bit_idx).sum())
            out.append(sig)
        return pd.Series(out, dtype="Int64")

    return documents.select("doc_id", sim(F.col("text")).alias("simhash")).filter(
        F.col("simhash").isNotNull()
    )


def dedup_simhash(documents: DataFrame) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ 5 via 6-chunk banded join —
    exact by pigeonhole (≤5 differing bits can't touch all 6 chunks)."""
    sig = simhash_signatures(documents)
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("chunk_id"),
                F.shiftright(F.col("simhash"), j * CHUNK_BITS)
                .bitwiseAND(F.lit((1 << CHUNK_BITS) - 1))
                .alias("chunk"),
            )
            for j in range(SIMHASH_CHUNKS)
        ]
    )
    chunked = sig.select("doc_id", "simhash", F.explode(chunk_structs).alias("c")).select(
        "doc_id", "simhash", F.col("c.chunk_id").alias("chunk_id"), F.col("c.chunk").alias("chunk")
    )
    a, b = chunked.alias("a"), chunked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("int")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )


def _simhash_sql() -> str:
    th = h64_sql("tok")
    bit_sums = ",\n    ".join(
        f"sum(CASE WHEN (th >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(SIMHASH_BITS)
    )
    sim_expr = " + ".join(
        f"CASE WHEN b{i} > 0 THEN CAST(1 AS BIGINT) << {i} ELSE CAST(0 AS BIGINT) END"
        for i in range(SIMHASH_BITS)
    )
    # brute-force O(n²) pair scan: the point of the oracle is to prove the
    # Spark banded join is lossless.
    return f"""
WITH toks AS (
  SELECT doc_id, {th} AS th
  FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
        FROM documents)
),
bits AS (
  SELECT doc_id,
    {bit_sums}
  FROM toks GROUP BY doc_id
),
sig AS (SELECT doc_id, {sim_expr} AS simhash FROM bits)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
"""


MINHASH_LSH_SQL = _minhash_sql()
SIMHASH_SQL = _simhash_sql()


def dedup_incremental_minhash(
    documents: DataFrame, incoming_source: str = INCREMENTAL_INCOMING_SOURCE
) -> DataFrame:
    """Incremental NEAR-dup classification (VERDICT r5 task #6): the daily
    batch's MinHash signatures banded-joined against CORPUS signatures —
    dedup_incremental's exact-key shape extended to the near-dup tier, so
    a rewritten/boilerplate-shifted re-crawl is caught, not just a
    byte-identical one. Each incoming doc gets:

      near_dup (match_id = best corpus match, exact verified Jaccard) or
      new      (no corpus doc with Jaccard ≥ tau)

    Best match = max Jaccard, ties to the smallest corpus doc_id — fully
    deterministic, so the whole report hash-checks against the oracle.

    Scale shape: the candidate step is a (band, sig) EQUI-join between
    the incoming side's banded signatures and the corpus's — bucketed by
    construction, never an incoming×corpus cross join (pinned by
    tests/test_plans.py). Signatures are 16 longs/doc: the corpus side
    of the join moves |corpus|×BANDS short rows, text stays in its scan;
    the exact-Jaccard verify touches only surviving candidate pairs via
    the shared array-intersect machinery (_pair_jaccard). In a real
    pipeline corpus signatures are PRECOMPUTED (written at each batch's
    admission), so the daily cost is the incoming batch's shingling plus
    the banded probe."""
    sh = _persisted(shingles_hashed(documents))
    sig = _minhash_from_shingles(sh)
    banded = _banded(sig)
    side = documents.select(
        "doc_id", (F.col("source") == incoming_source).alias("inc")
    )
    banded_s = banded.join(side, "doc_id")
    inc_b = banded_s.filter(F.col("inc")).select(
        F.col("doc_id").alias("doc_a"), "band", "sig"
    )
    cor_b = banded_s.filter(~F.col("inc")).select(
        F.col("doc_id").alias("doc_b"), "band", "sig"
    )
    cand = inc_b.join(cor_b, ["band", "sig"]).select("doc_a", "doc_b").distinct()
    pairs = _pair_jaccard(sh, cand, MINHASH_TAU)
    return _classify_incoming(pairs, documents, incoming_source)


def _classify_incoming(
    pairs: DataFrame, documents: DataFrame, incoming_source: str
) -> DataFrame:
    """Shared tail of the incremental near-dup variants: verified
    (doc_a=incoming, doc_b=corpus, jaccard) pairs → per-incoming-doc
    near_dup/new report with a deterministic best match (max Jaccard,
    ties to the smallest corpus id)."""
    # max(struct(jaccard, -doc_b)): max Jaccard first, then min corpus id
    best = (
        pairs.groupBy("doc_a")
        .agg(
            F.max(
                F.struct(F.col("jaccard").alias("j"), (-F.col("doc_b")).alias("nb"))
            ).alias("m")
        )
        .select(
            "doc_a",
            (-F.col("m.nb")).cast("long").alias("match_id"),
            F.col("m.j").alias("jaccard"),
        )
    )
    inc_docs = documents.filter(_incoming_filter(incoming_source)).select("doc_id")
    return (
        inc_docs.join(best, inc_docs["doc_id"] == best["doc_a"], "left")
        .select(
            "doc_id",
            F.when(F.col("doc_a").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("status"),
            "match_id",
            "jaccard",
        )
    )


def write_minhash_signature_store(
    documents: DataFrame, path: str, dynamic: bool = False
) -> None:
    """Materialize the PRODUCTION artifact the incremental near-dup probe
    reads: per doc — source, the 16 MinHash values, and the distinct
    hashed-shingle SET (needed for the exact-Jaccard verify; 60-bit longs,
    far smaller than text). Partitioned BY SOURCE, so a daily probe's
    corpus read (source != today) prunes the incoming partition at the
    file listing and an admission job appends only its own partition.
    At 100 TB of text the store is the thing that makes daily dedup
    affordable: signatures are computed once per document's lifetime,
    never re-shingled per probe.

    `dynamic=True` is the ADMISSION mode (see append_minhash_signatures):
    dynamic partition overwrite rewrites only the source partitions
    present in `documents`, leaving the rest of the store untouched —
    ONE writer, so the built and admitted partitions can never diverge
    in row shape.

    The REBALANCE-by-partition-column hint before the write is the
    guide-§6 "coalesce on write": without it every upstream task writes
    its own sliver into every source directory (measured: 1282 files
    for 6 MB of store at sf0.1 — and every fork, listing and probe of
    the store pays per file). AQE's rebalance coalesces each source's
    output to advisory-size chunks AND splits oversized partitions, so
    the same writer produces right-sized files at 100 TB instead of a
    skew bomb — content is untouched, only file layout changes."""
    w = (
        minhash_signature_rows(documents)
        .hint("rebalance", "source")
        .write.mode("overwrite")
        .partitionBy("source")
    )
    if dynamic:
        w = w.option("partitionOverwriteMode", "dynamic")
    w.parquet(path)


def minhash_signature_rows(documents: DataFrame) -> DataFrame:
    """The signature store's ROW derivation — factored out of the writer
    so the streaming admission path (plans/datapipe.daily_crawl_stream's
    per-micro-batch bid=N lands) derives rows through the SAME code as
    the batch store writer; content identity between a day's batch
    admission and the union of its micro-batch admissions is then a
    property of the batching, not of two implementations agreeing."""
    sh = _persisted(shingles_hashed(documents))
    sig = _minhash_from_shingles(sh)
    sets = sh.groupBy("doc_id").agg(F.collect_list("sh").alias("S"))
    # the exact-dedup key rides along (32 bytes/doc): a daily pipeline's
    # exact stage probes the SAME store the near-dup stage does, so one
    # admission covers both tiers (see plans/datapipe.daily_crawl_pipeline).
    # LEFT joins from the doc list: a doc too short to shingle (fewer
    # than SHINGLE tokens) still HAS an exact key and must be in the
    # store — its mh/S columns stay null and _banded drops it from every
    # near-dup candidate search
    src = documents.select("doc_id", "source", _exact_key().alias("k"))
    return src.join(sig, "doc_id", "left").join(sets, "doc_id", "left")


def _incoming_sets(sh_inc: DataFrame) -> DataFrame:
    """(doc_a, Sa, na): each incoming doc's distinct-shingle set + size,
    the probe side of every store-backed exact-Jaccard verify."""
    va = sh_inc.groupBy("doc_id").agg(F.collect_list("sh").alias("Sa"))
    return va.select(F.col("doc_id").alias("doc_a"), "Sa", F.size("Sa").alias("na"))


def _verify_set_pairs(cand: DataFrame, va: DataFrame, vb: DataFrame) -> DataFrame:
    """Exact-Jaccard verification of candidate (doc_a, doc_b) pairs from
    precomputed shingle sets — the ONE implementation of the
    round(|A∩B| / (|A|+|B|-|A∩B|), 6) >= MINHASH_TAU contract shared by
    the store-backed probes (minhash_stored, incremental cluster edges),
    so the threshold/rounding can never drift between operators that
    must agree with the same full-recompute oracle."""
    return (
        cand.join(va, "doc_a")
        .join(vb, "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("Sa", "Sb")).cast("long"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= MINHASH_TAU)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_store_probe_frames(
    store: DataFrame, incoming_source=INCREMENTAL_INCOMING_SOURCE
) -> tuple[DataFrame, DataFrame]:
    """The CORPUS-side probe frames (banded signatures, verify sets)
    dedup_incremental_minhash_from_store derives from a signature store —
    factored out so a REPEATED prober over a NON-advancing store (the
    streaming crawl replay runs the probe once per micro-batch) can build
    them once, materialize them (eager localCheckpoint), and pass them
    back in: each batch's plan then joins against two tiny leaf nodes
    instead of re-analyzing and re-executing the 16-permutation banding
    explode per batch. One-shot callers keep the default in-plan
    derivation — identical frames, built here either way."""
    corpus = store.filter(~_incoming_filter(incoming_source))
    banded = _banded(corpus).select(F.col("doc_id").alias("doc_b"), "band", "sig")
    sets = corpus.select(
        F.col("doc_id").alias("doc_b"), F.col("S").alias("Sb"), F.size("S").alias("nb")
    )
    return banded, sets


def dedup_incremental_minhash_from_store(
    documents: DataFrame,
    store: DataFrame,
    incoming_source: str = INCREMENTAL_INCOMING_SOURCE,
    corpus_banded: DataFrame | None = None,
    corpus_sets: DataFrame | None = None,
) -> DataFrame:
    """dedup_incremental_minhash's daily-production twin: corpus
    signatures come from the PRECOMPUTED store (write_minhash_signature_
    store) — only the incoming batch is shingled, the corpus text is
    never touched. `store` is the signature table (typically
    spark.read.parquet(store_path)); the source != incoming filter lands
    on the store scan as a partition filter. Result-identical to the
    inline variant (same oracle SQL; pinned by tests).

    `corpus_banded` / `corpus_sets`: a repeated caller (the streaming
    replay probes the same store every micro-batch) passes the
    pre-materialized minhash_store_probe_frames so the corpus subtrees
    are analyzed and executed once per stream, not once per batch —
    same frames, so results cannot differ (pinned by tests)."""
    inc_docs = documents.filter(_incoming_filter(incoming_source))
    sh_inc = _persisted(shingles_hashed(inc_docs))
    inc_b = _banded(_minhash_from_shingles(sh_inc)).select(
        F.col("doc_id").alias("doc_a"), "band", "sig"
    )
    if corpus_banded is None or corpus_sets is None:
        corpus_banded, corpus_sets = minhash_store_probe_frames(
            store, incoming_source
        )
    cand = (
        inc_b.join(corpus_banded, ["band", "sig"])
        .select("doc_a", "doc_b")
        .distinct()
    )
    # exact verify: incoming sets fresh, corpus sets from the store
    pairs = _verify_set_pairs(cand, _incoming_sets(sh_inc), corpus_sets)
    return _classify_incoming(pairs, documents, incoming_source)


def dedup_incremental_minhash_sql(
    incoming_source: str = INCREMENTAL_INCOMING_SOURCE,
    incoming_where: str | None = None,
    corpus_where: str | None = None,
) -> str:
    """Oracle builder tracking dedup_incremental_minhash's argument.

    `incoming_where` / `corpus_where` generalize the two-way source
    split: the rolling day-over-day oracle needs a corpus that excludes
    BOTH days on day 1 (day 2 hasn't been crawled yet) and exactly one
    day on day 2 — a doc matching neither predicate is simply absent
    from the probe (the default keeps the original incoming-vs-rest
    split)."""
    if incoming_where is None:
        incoming_where = f"source = '{incoming_source}'"
    if corpus_where is None:
        corpus_where = f"NOT ({incoming_where})"
    mh_aggs = ",\n    ".join(
        "min({h}) AS mh{p}".format(h=perm_hash_sql("sh", p), p=p)
        for p in range(NUM_PERMS)
    )
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band, "
        + " || '_' || ".join(
            f"CAST(mh{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        )
        + " AS sig FROM sig"
        for b in range(BANDS)
    )
    return f"""
WITH {SHINGLES_HASHED_CTE.strip()},
side AS (SELECT doc_id, ({incoming_where}) AS inc,
                ({corpus_where}) AS cor FROM documents),
sig AS (
  SELECT doc_id,
    {mh_aggs}
  FROM shh
  GROUP BY doc_id
),
banded AS (
{band_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN side sa ON sa.doc_id = a.doc_id AND sa.inc
  JOIN banded b ON a.band = b.band AND a.sig = b.sig
  JOIN side sb ON sb.doc_id = b.doc_id AND sb.cor
),
sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN shh sa ON sa.doc_id = c.doc_a
  JOIN shh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
  GROUP BY c.doc_a, c.doc_b
),
pairs AS (
  SELECT i.doc_a, i.doc_b,
         round(CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common), 6) AS jaccard
  FROM inter i
  JOIN sizes za ON za.doc_id = i.doc_a
  JOIN sizes zb ON zb.doc_id = i.doc_b
  WHERE round(CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common), 6)
        >= {MINHASH_TAU}
),
best AS (
  SELECT doc_a, doc_b, jaccard,
         row_number() OVER (PARTITION BY doc_a
                            ORDER BY jaccard DESC, doc_b) AS rn
  FROM pairs
)
SELECT d.doc_id,
       CASE WHEN b.doc_a IS NOT NULL THEN 'near_dup' ELSE 'new' END AS status,
       b.doc_b AS match_id, b.jaccard
FROM (SELECT doc_id FROM documents WHERE {incoming_where}) d
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.doc_a = d.doc_id
"""


DEDUP_INCREMENTAL_MINHASH_SQL = dedup_incremental_minhash_sql()


# --- day-over-day store maintenance (VERDICT r8 task #1) -------------------

ROLLING_DAY2_SOURCE = "src1"  # stands in for "tomorrow's crawl"
ROLLING_DAY3_SOURCE = "src2"  # day 3 of the N-day minhash cadence
# the registered minhash rolling loop runs THREE days (VERDICT r10 task
# #6): the day-3 report is reachable only through two consecutive store
# advances, so the GATED oracle — not just pytest — proves the cadence
ROLLING_DAYS = [
    INCREMENTAL_INCOMING_SOURCE,
    ROLLING_DAY2_SOURCE,
    ROLLING_DAY3_SOURCE,
]


def append_minhash_signatures(batch: DataFrame, path: str) -> None:
    """The ADMISSION job for the MinHash signature store — the daily
    increment of write_minhash_signature_store: compute the arriving
    batch's signatures + distinct-shingle sets (the batch's text is read
    once; the existing store is never read or rewritten) and land them in
    the store's own source partitions. DYNAMIC partition overwrite makes
    admission idempotent per source: a retried/replayed admission
    rewrites the same partition instead of appending duplicate signature
    rows — the write-side analog of rollup_stream_maintain's bid=N
    overwrite under at-least-once delivery. Delegates to the ONE store
    writer so built and admitted partitions share the exact row shape."""
    write_minhash_signature_store(batch, path, dynamic=True)


def dedup_minhash_rolling(
    spark,
    documents: DataFrame,
    store_path: str,
    day1: str | None = None,
    day2: str | None = None,
    days: list[str] | None = None,
) -> DataFrame:
    """Day-over-day near-dup maintenance loop — the pipeline a daily
    crawl actually runs (VERDICT r8 task #1), converting the signature
    store from a single-shot demo into an ADVANCING artifact:

      day 1: probe the day-1 batch against the store (corpus excludes
             both days — day 2 hasn't been crawled yet), then ADMIT the
             day-1 signatures into the store (append_minhash_signatures);
      day 2: probe the day-2 batch against the ADVANCED store — a day-2
             doc whose only near-dup is a day-1 doc is caught via the
             day-1 STORED signatures, its text never re-shingled.

    Per-day cost is the incoming batch's shingling plus the banded
    probe; the corpus contributes only partition-pruned store FileScans
    (day-2 plan pinned by tests/test_plans.py). The store advance is
    executed between the probes (the admission write is an action); the
    day-1 result is insensitive to it because its corpus filter excludes
    exactly the admitted partition. Day-1's store read is additionally
    pinned to exclude BOTH days' partitions (the IVF twin's
    batch_in=('base',) in source-partition form): without it, a day-1
    rerun against a store that has since admitted day 2 would read
    tomorrow's signatures — the oracle's day-1 corpus excludes both
    days. Oracle = the full recompute of both days (reference
    semantics: the same report a from-scratch re-shingle of
    corpus ∪ day1 ∪ day2 produces).

    Generalized to an N-day cadence (VERDICT r10 task #6): day i's probe
    pins the store to everything BEFORE it (~isin(days[i:]) — its own
    and future partitions excluded, so a rerun after any number of later
    admissions still answers as day i), then admits its own partition.
    Each probe's store read is created AFTER the admissions that rewrite
    partitions it keeps and pins OUT the partitions rewritten after it —
    the file-listing discipline _rolling_sig_store documents. The
    registered query runs days=ROLLING_DAYS (N=3: the day-3 report is
    reachable only through two consecutive store advances, so the gated
    oracle proves the cadence); the 2-day day1=/day2= form remains for
    the pytest fixtures."""
    if days is None:
        days = [
            day1 or INCREMENTAL_INCOMING_SOURCE,
            day2 or ROLLING_DAY2_SOURCE,
        ]
    parts = []
    for i, day in enumerate(days):
        store = spark.read.parquet(store_path).filter(
            ~F.col("source").isin(*days[i:])
        )
        r = dedup_incremental_minhash_from_store(documents, store, day)
        parts.append(r)
        append_minhash_signatures(
            documents.filter(F.col("source") == day), store_path
        )
    from flink_cep_task_spark.functions.rolling import day_union

    return day_union(parts)


def dedup_minhash_rolling_sql(days: list[str] | None = None) -> str:
    """Full-recompute oracle for the rolling loop: day i classified
    against the corpus minus days i..N (the days not yet crawled as of
    day i) — the stores change COST, never answers. The N-day shape
    makes the gated oracle prove the cadence chain: a day-3 near-dup
    whose only partner arrived on day 2 matches ONLY if both prior
    admissions advanced the store."""
    from flink_cep_task_spark.functions.rolling import day_union_sql

    days = list(days or ROLLING_DAYS)
    sqls = []
    for i, day in enumerate(days):
        not_in = ", ".join(f"'{d}'" for d in days[i:])
        sqls.append(
            dedup_incremental_minhash_sql(
                incoming_where=f"source = '{day}'",
                corpus_where=f"source NOT IN ({not_in})",
            )
        )
    return day_union_sql(sqls)


DEDUP_MINHASH_ROLLING_SQL = dedup_minhash_rolling_sql()


# --- benchmark decontamination --------------------------------------------

EVAL_SET_MAX_ID = 20  # docs with doc_id < 20 stand in for the eval/benchmark set


def decontaminate(documents: DataFrame) -> DataFrame:
    """Training-vs-benchmark contamination check: for every TRAINING doc
    (doc_id ≥ EVAL_SET_MAX_ID), how many of its word-3-gram shingles also
    occur anywhere in the EVAL set (doc_id < EVAL_SET_MAX_ID), plus a
    contamination flag — the standard n-gram-overlap decontamination pass
    run before training. One shared shingle scan; the eval side collapses
    to DISTINCT hashes (small — eval sets are thousands of docs, so at
    scale it broadcast-joins); zero-overlap docs are kept via the left
    join so the output is a complete per-doc report."""
    sh = _persisted(shingles_hashed(documents))
    eval_sh = (
        sh.filter(F.col("doc_id") < EVAL_SET_MAX_ID)
        .select("sh").distinct()
        .withColumn("__hit", F.lit(1))
    )
    train = sh.filter(F.col("doc_id") >= EVAL_SET_MAX_ID)
    return (
        train.join(F.broadcast(eval_sh), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_shared_shingles"),
            F.count(F.lit(1)).alias("n_shingles"),
        )
        .withColumn("contaminated", F.col("n_shared_shingles") > 0)
    )


DECONTAMINATE_SQL = f"""
WITH {SHINGLES_HASHED_CTE.strip()},
eval_sh AS (
  SELECT DISTINCT sh FROM shh WHERE doc_id < {EVAL_SET_MAX_ID}
)
SELECT t.doc_id,
       CAST(sum(CASE WHEN e.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_shingles,
       count(*) AS n_shingles,
       sum(CASE WHEN e.sh IS NOT NULL THEN 1 ELSE 0 END) > 0 AS contaminated
FROM shh t LEFT JOIN eval_sh e ON e.sh = t.sh
WHERE t.doc_id >= {EVAL_SET_MAX_ID}
GROUP BY t.doc_id
"""


# --- near-duplicate clusters (connected components) -----------------------

def dedup_clusters(documents: DataFrame) -> DataFrame:
    """Cluster ids over the near-duplicate graph: connected components of
    the MinHash-LSH pair edges, labeled by each component's min doc_id,
    with a canonical flag — the "keep one per cluster" primitive that
    turns pairwise dedup output into an actual training-set filter
    (pairs alone can't dedup A~B~C transitively).

    Iterative min-label propagation WITH path halving: every doc starts
    as its own label; each round takes the min over its neighbors' labels
    (one hop), then jumps through the just-computed mapping
    (label-of-label) — the pointer-jumping step that turns O(diameter)
    convergence into O(log diameter). Labels are always node ids inside
    the component and only ever decrease, so the jump is safe: at the
    fixpoint every node carries the component min. The driver loop holds
    only a changed-row COUNT per round — never data. This is the standard
    large-graph CC skeleton (label propagation + pointer jumping, as in
    the large-star/small-star formulation).

    The iteration runs ONLY over nodes that appear in an edge (near-dup
    graphs are sparse — the overwhelming singleton majority never enters
    the loop and is labeled by a final left join); the pair DataFrame is
    persisted so the undirected-edge union doesn't execute the LSH
    pipeline twice.

    The oracle replays the same fixpoint as a recursive CTE over the same
    pair SQL."""
    pairs = dedup_minhash_lsh(documents).select("doc_a", "doc_b")
    return _cluster_from_pairs(documents, pairs)


def _cluster_from_pairs(documents: DataFrame, und_pairs: DataFrame) -> DataFrame:
    """Shared CC skeleton of dedup_clusters and its stored twin: turn an
    undirected (doc_a, doc_b) pair frame into per-doc cluster labels.
    Kept as ONE function so the small-graph execution gate and the
    canonical-label join can never diverge between the two operators
    (their outputs must stay byte-identical)."""
    from flink_cep_task_spark.operators.cache import persisted

    # both directions in ONE pass over the pair pipeline (a self-union
    # would execute the whole upstream plan twice on first
    # materialization — lazy caching can't help two branches of one job)
    edges = persisted(
        und_pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
                    F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
                )
            ).alias("e")
        ).select("e.src", "e.dst")
    )
    # materializes the edge cache AND measures the iteration's working-set
    # size — the statistic that drives the execution-parameter gate below
    n_edges = edges.count()
    labels = persisted(
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("label"))
    )
    # Right-size the FIXPOINT LOOP's execution to the measured graph: the
    # iteration state is the edge list, not the corpus — near-dup graphs
    # are tiny relative to their corpus. When it fits a handful of
    # partitions, 32-way shuffles + AQE's per-stage re-planning dominate
    # the per-round wall time (~3× measured at sf0.1), so pin a small
    # static shuffle width for the loop only. A huge graph keeps the
    # session's AQE + width (skew handling matters there). Confs are
    # restored before the corpus-wide final join, which always runs with
    # the session's scale settings.
    spark = documents.sparkSession
    small_graph = n_edges < 1_000_000
    saved: dict[str, str] = {}
    if small_graph:
        for k, v in (
            ("spark.sql.adaptive.enabled", "false"),
            ("spark.sql.shuffle.partitions", "4"),
        ):
            saved[k] = spark.conf.get(k)
            spark.conf.set(k, v)
    try:
        labels = _cc_fixpoint_loop(edges, labels)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    out = (
        documents.select("doc_id")
        .join(labels.withColumnRenamed("label", "__cl"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("__cl"), F.col("doc_id")).alias("cluster_id"),
            (F.col("doc_id") == F.coalesce(F.col("__cl"), F.col("doc_id"))).alias("is_canonical"),
        )
    )
    # Thread the node-only fixpoint mapping through for consumers that
    # need ONLY the star edges (label-store admission): every doc absent
    # from the mapping coalesces to doc_id == cluster_id above, i.e.
    # contributes no star edge — so the mapping alone determines the
    # store contents, and a writer that uses it skips this corpus-wide
    # join entirely. Same attribute-threading idiom as
    # cache.copy_provenance. Precondition (holds at every call site:
    # pairs derive from the same universe as `documents`): edge
    # endpoints ⊆ documents.doc_id, else the mapping would carry star
    # edges the corpus-joined frame doesn't.
    out._graft_cc_labels = labels
    return out


def _cc_fixpoint_loop(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Min-label propagation + path halving to fixpoint; returns the final
    (doc_id, label) mapping with TRUNCATED lineage (localCheckpoint).
    Driver holds only counts.

    Cache discipline (the round-10 probe profile found the old loop
    re-executing its entire lineage for every downstream consumer):
    unpersisting generation N-1 makes Spark recompile-and-drop the
    materialized buffers of every cache entry whose plan contains it —
    generation N included (the same cascade cache.py documents for the
    shared tier). So the loop DEFERS all unpersists: every generation
    stays cached until convergence, the final mapping is decoupled from
    the generation caches by an eager localCheckpoint (a LogicalRDD has
    no plan ancestry, so nothing released later can invalidate it), and
    only then are the O(log diameter) intermediate generations freed.
    The checkpoint trades executor-loss recovery for a guaranteed-stable
    materialization — the same trade cache.persisted_shared makes, and
    the right one for the loop's bounded (nodes-in-edges × 2 longs)
    state; the generations briefly co-resident are the same size."""
    from flink_cep_task_spark.operators.cache import persisted

    generations: list[DataFrame] = []
    while True:
        neighbor_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("label").alias("nlabel"))
        )
        # one-hop step; carry the previous label so the convergence count
        # below needs no extra join against the old generation
        stepped = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.col("label").alias("old"),
            F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("t"),
        )
        # pointer jump (path halving): label ← label-of-label through the
        # PREVIOUS generation's mapping — `labels` is persisted, so this
        # second join is against cached data, and t values are node ids
        # whose labels only ever decrease, keeping the jump in-component.
        jump = labels.select(F.col("doc_id").alias("t"), F.col("label").alias("tl"))
        new_gen = persisted(
            stepped.join(jump, "t", "left").select(
                "doc_id",
                "old",
                F.least(F.col("t"), F.coalesce(F.col("tl"), F.col("t"))).alias("label"),
            )
        )
        # this count is the action that materializes new_gen's cache AND
        # decides convergence — one job per round, no old-vs-new join
        changed = new_gen.filter(F.col("label") != F.col("old")).count()
        generations.append(new_gen)
        labels = new_gen.select("doc_id", "label")
        if changed == 0:
            # tracked so release_caches() can free the pinned blocks at
            # the next query boundary — a checkpointed frame's own
            # unpersist() frees nothing (ADVICE r10; cache.track_checkpoint)
            from flink_cep_task_spark.operators.cache import track_checkpoint

            final = track_checkpoint(labels.localCheckpoint(eager=True))
            for g in generations:
                g.unpersist()
            return final


def dedup_clusters_sql(source: str = "documents", prelude: str = "") -> str:
    """Recursive-CTE replay of the CC fixpoint over the minhash pair
    graph; `source` lets a composed oracle cluster a survivor CTE
    instead of the base table (curation_funnel's near-dup stage), and
    `prelude` prepends extra CTE definitions (e.g. a filtered-documents
    view for the rolling oracle's day-1 universe — never SHADOW
    `documents` itself: DuckDB binds outer CTE bodies at use site, so a
    shadowing CTE poisons every transitively-referenced one)."""
    return f"""
WITH RECURSIVE {prelude}pairs AS ({_minhash_sql(source)}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
cc AS (
  SELECT doc_id, doc_id AS label FROM {source}
  UNION
  SELECT e.b AS doc_id, cc.label
  FROM cc JOIN edges e ON e.a = cc.doc_id
)
SELECT doc_id, min(label) AS cluster_id,
       doc_id = min(label) AS is_canonical
FROM cc GROUP BY doc_id
"""


DEDUP_CLUSTERS_SQL = dedup_clusters_sql()


# --- passage-level (exact-substring-style) dedup -------------------------

PASSAGE_WORDS = 8


def dedup_passages(documents: DataFrame, chunk: int = PASSAGE_WORDS) -> DataFrame:
    """Passage-level exact dedup: split each document into non-overlapping
    `chunk`-word passages, find passages that recur across documents, and
    report each document's duplicated-passage fraction — the scalable
    approximation of suffix-array exact-substring dedup (Lee et al.) used
    to strip shared boilerplate from training corpora.

    Plan shape: the passage text never shuffles — the exchange key is
    md5(passage), a fixed 32-byte hash; cross-doc recurrence is one hash
    aggregate on that key (count_distinct doc partials absorb a passage's
    in-doc repeats map-side) and the verdict joins back to the exploded
    passages on the same key, so the join is co-partitioned with the agg.
    Docs shorter than one passage carry no evidence and are dropped (the
    oracle's range() lateral does the same)."""
    w = tokens(F.col("text"))
    ck = F.expr(
        f"transform(sequence(0, CAST(floor(size(__w) / {chunk}) AS INT) - 1), "
        f"i -> md5(concat_ws(' ', slice(__w, i * {chunk} + 1, {chunk}))))"
    )
    passages = (
        documents.select("doc_id", w.alias("__w"))
        .filter(F.size("__w") >= chunk)
        .select("doc_id", F.explode(ck).alias("ck"))
    )
    recur = passages.groupBy("ck").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    return (
        passages.join(recur, "ck")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_passages"),
        )
        .withColumn(
            "dup_passage_frac",
            F.round(
                F.col("n_dup_passages").cast("double") / F.col("n_passages"), 6
            ),
        )
    )


DEDUP_PASSAGES_SQL = f"""
WITH ch AS (
  SELECT doc_id,
         md5(array_to_string(w[(i * {PASSAGE_WORDS} + 1):(i * {PASSAGE_WORDS} + {PASSAGE_WORDS})], ' ')) AS ck
  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents),
       LATERAL (SELECT unnest(range(CAST(floor(len(w) / {PASSAGE_WORDS}) AS BIGINT))) AS i) s
),
cd AS (SELECT ck, count(DISTINCT doc_id) AS nd FROM ch GROUP BY ck)
SELECT doc_id, count(*) AS n_passages,
       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_passages,
       round(CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS dup_passage_frac
FROM ch JOIN cd USING (ck)
GROUP BY doc_id
"""


# --- substring-level dedup via winnowing fingerprints --------------------

WINNOW_K = 5            # words per k-gram
WINNOW_W = 4            # winnowing window (consecutive k-gram hashes)
WINNOW_MIN_SHARED = 2   # pairs must share >= this many fingerprints
WINNOW_MAX_DOCS_PER_FP = 128  # boilerplate stop-fingerprint cap


def _winnow_fps(documents: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W) -> DataFrame:
    """(doc_id, fp) winnowing fingerprints, extracted fully IN-ROW:
    every overlapping k-word gram is hashed via transform over a
    position sequence, then winnowing selects the minimum hash per
    window of w consecutive k-gram hashes — one window per position
    while m >= w, a single window covering everything when 1 <= m < w
    (short docs keep one fingerprint, as in the original scheme). The
    document text never leaves its scan; only the 32-byte fingerprints
    explode."""
    toks = tokens(F.col("text"))
    kg = F.expr(
        f"transform(sequence(0, size(__w) - {k}), "
        f"i -> md5(concat_ws(' ', slice(__w, i + 1, {k}))))"
    )
    sel = F.expr(
        f"array_distinct(transform(sequence(0, greatest(size(__kg) - {w}, 0)), "
        f"j -> array_min(slice(__kg, j + 1, least({w}, size(__kg))))))"
    )
    return (
        documents.select("doc_id", toks.alias("__w"))
        .filter(F.size("__w") >= k)
        .select("doc_id", kg.alias("__kg"))
        .select("doc_id", F.explode(sel).alias("fp"))
    )


def dedup_substring(
    documents: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = WINNOW_MIN_SHARED,
    max_docs_per_fp: int = WINNOW_MAX_DOCS_PER_FP,
) -> DataFrame:
    """SHIFT-INVARIANT substring-level dedup via winnowing fingerprints
    (Schleimer et al. 2003, the MOSS algorithm) — the scalable stand-in
    for suffix-array exact-substring dedup (Lee et al. 2021).

    dedup_passages hashes NON-overlapping fixed-word chunks, so a
    duplicated passage shifted by one word realigns every chunk and
    becomes invisible. Here every OVERLAPPING k-word gram is hashed
    (rolling window over the token stream), then winnowing selects the
    minimum hash in each window of w consecutive k-gram hashes: any
    shared substring of >= k+w-1 words is guaranteed to contribute at
    least one identical fingerprint regardless of its offset in either
    document, while expected fingerprint density stays bounded at
    2/(w+1) per k-gram. Documents sharing >= min_shared fingerprints
    are reported as substring-duplicate pairs with a containment score.

    Plan shape: all k-gram hashing + window-min selection happens
    IN-ROW via higher-order functions (transform over sequence +
    array_min over slice) — the document text never shuffles; the only
    exchange key is the 32-byte fingerprint hash. Pair generation is an
    equi-self-join on that key, with fingerprints occurring in more
    than max_docs_per_fp documents dropped first (MOSS's over-common
    cull): corpus-wide boilerplate would otherwise make one fingerprint
    bucket quadratic. With the cap, any fingerprint contributes at most
    cap^2/2 candidate pairs, so the join output is linearly bounded in
    the fingerprint count. The per-doc fingerprint counts reuse the
    same exploded frame, and the two doc-keyed joins that attach them
    run on the already-aggregated (pair) side."""
    # persist the extracted fingerprints: the k-gram + winnowing pass is
    # the expensive leg and the plan reads it FOUR times (freq, both
    # self-join sides, per-doc counts) — unpersisted, the 64× scaling
    # audit measured the whole query at ~4× the extraction cost, i.e.
    # the extraction re-ran per consumer. At production scale this frame
    # is the materialized fingerprint store a daily pipeline would keep
    # (32-byte hash + doc id — a few % of the text size; see
    # write_winnow_fingerprint_store).
    fps = _persisted(_winnow_fps(documents, k, w))
    freq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("nd"))
    eligible = fps.join(freq.filter(F.col("nd") <= max_docs_per_fp), "fp")
    n_fps = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fps"))
    a = eligible.select(F.col("doc_id").alias("doc_a"), "fp")
    b = eligible.select(F.col("doc_id").alias("doc_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
    return (
        pairs.join(n_fps.select(F.col("doc_id").alias("doc_a"), F.col("n_fps").alias("n_fps_a")), "doc_a")
        .join(n_fps.select(F.col("doc_id").alias("doc_b"), F.col("n_fps").alias("n_fps_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_fps",
            "n_fps_a",
            "n_fps_b",
            F.round(
                F.col("shared_fps").cast("double")
                / F.least("n_fps_a", "n_fps_b"),
                6,
            ).alias("containment"),
        )
    )


DEDUP_SUBSTRING_SQL = f"""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents
), kg AS (
  SELECT doc_id, i, md5(array_to_string(w[i:(i + {WINNOW_K} - 1)], ' ')) AS h
  FROM words, LATERAL (SELECT unnest(range(1, len(w) - {WINNOW_K} + 2))::BIGINT AS i) s
), win AS (
  SELECT doc_id, i,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS wmin,
         count(*) OVER (PARTITION BY doc_id) AS m
  FROM kg
), fps AS (
  SELECT DISTINCT doc_id, wmin AS fp
  FROM win WHERE i <= greatest(m - {WINNOW_W} + 1, 1)
), freq AS (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {WINNOW_MAX_DOCS_PER_FP}
), eligible AS (
  SELECT doc_id, fp FROM fps JOIN freq USING (fp)
), n_fps AS (
  SELECT doc_id, count(*) AS n_fps FROM fps GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fps
  FROM eligible a JOIN eligible b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= {WINNOW_MIN_SHARED}
)
SELECT doc_a, doc_b, shared_fps, na.n_fps AS n_fps_a, nb.n_fps AS n_fps_b,
       round(CAST(shared_fps AS DOUBLE) / least(na.n_fps, nb.n_fps), 6)
         AS containment
FROM pairs
JOIN n_fps na ON na.doc_id = doc_a
JOIN n_fps nb ON nb.doc_id = doc_b
"""


def write_winnow_fingerprint_store(
    documents: DataFrame, path: str, dynamic: bool = False
) -> None:
    """Materialize the winnowing-fingerprint store — the substring-dedup
    analog of write_minhash_signature_store: per doc the selected
    (doc_id, fp) fingerprints plus the source, partitioned BY SOURCE so
    a daily probe's corpus read (source != today) prunes the incoming
    partition at the file listing and an admission job appends only its
    own partition. Fingerprints are computed once per document's
    lifetime; no probe ever re-tokenizes corpus text.

    `dynamic=True` is the ADMISSION mode (the daily increment): dynamic
    partition overwrite rewrites only the source partitions present in
    `documents` — idempotent per source, existing partitions untouched,
    ONE writer for built and admitted partitions. REBALANCE-by-source
    before the write for the same guide-§6 file-sizing reason as
    write_minhash_signature_store (this store measured the same
    1282-file sprawl at sf0.1 without it)."""
    w = (
        winnow_fingerprint_rows(documents)
        .hint("rebalance", "source")
        .write.mode("overwrite")
        .partitionBy("source")
    )
    if dynamic:
        w = w.option("partitionOverwriteMode", "dynamic")
    w.parquet(path)


def winnow_fingerprint_rows(documents: DataFrame) -> DataFrame:
    """The fingerprint store's ROW derivation — shared by the batch
    writer and the streaming admission path (see
    minhash_signature_rows for why the split exists)."""
    fps = _winnow_fps(documents)
    return fps.join(documents.select("doc_id", "source"), "doc_id")


def append_winnow_fingerprints(batch: DataFrame, path: str) -> None:
    """The ADMISSION job for the winnowing-fingerprint store — the daily
    increment; see append_minhash_signatures for the idempotence
    contract (same dynamic-overwrite pattern, same single-writer
    delegation)."""
    write_winnow_fingerprint_store(batch, path, dynamic=True)


def winnow_store_probe_frames(
    store: DataFrame,
    incoming_source=INCREMENTAL_INCOMING_SOURCE,
    max_docs_per_fp: int = WINNOW_MAX_DOCS_PER_FP,
) -> tuple[DataFrame, DataFrame]:
    """The CORPUS-side probe frames (frequency-culled fingerprints,
    per-doc fingerprint counts) dedup_substring_incremental_from_store
    derives from a fingerprint store — factored out for the same reason
    as minhash_store_probe_frames: a per-micro-batch prober over a
    non-advancing store materializes them once instead of re-running the
    corpus frequency cull every batch."""
    corpus = store.filter(~_incoming_filter(incoming_source))
    cfreq = corpus.groupBy("fp").agg(F.count(F.lit(1)).alias("nd"))
    cor_ok = corpus.join(cfreq.filter(F.col("nd") <= max_docs_per_fp), "fp")
    counts = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_b"))
    return cor_ok, counts


def dedup_substring_incremental_from_store(
    documents: DataFrame,
    store: DataFrame,
    incoming_source: str = INCREMENTAL_INCOMING_SOURCE,
    min_shared: int = WINNOW_MIN_SHARED,
    max_docs_per_fp: int = WINNOW_MAX_DOCS_PER_FP,
    corpus_ok: DataFrame | None = None,
    corpus_counts: DataFrame | None = None,
) -> DataFrame:
    """Incremental SUBSTRING-level dedup: the daily batch's winnowing
    fingerprints (computed inline — only incoming text is tokenized)
    probed against the PRECOMPUTED corpus fingerprint store. Each
    incoming doc gets:

      substring_dup (match_id = best corpus match) or new

    Best match = most shared fingerprints, ties to the smallest corpus
    doc_id — fully deterministic. Completes the incremental family:
    dedup_incremental catches byte-identical re-crawls, the minhash
    variant whole-doc near-dups, this one a shared shifted PASSAGE
    inside an otherwise-new document (the k+w-1-word winnowing
    guarantee, offset-independent).

    Scale shape: candidates are an fp equi-join between the incoming
    batch's fingerprints and the store's (source != incoming lands as a
    partition filter on the store scan — never incoming×corpus); the
    over-common cull runs on the CORPUS side frequencies (precomputable
    at admission), bounding any fingerprint's contribution at
    max_docs_per_fp candidate rows per incoming fingerprint.

    `corpus_ok` / `corpus_counts`: pre-materialized
    winnow_store_probe_frames for a repeated (per-micro-batch) prober —
    same frames, so results cannot differ (pinned by tests)."""
    inc_docs = documents.filter(_incoming_filter(incoming_source))
    fa = _persisted(_winnow_fps(inc_docs))
    if corpus_ok is None or corpus_counts is None:
        corpus_ok, corpus_counts = winnow_store_probe_frames(
            store, incoming_source, max_docs_per_fp
        )
    cor_ok, nb = corpus_ok, corpus_counts
    na = fa.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_a"))
    pairs = (
        fa.select(F.col("doc_id").alias("doc_a"), "fp")
        .join(cor_ok.select(F.col("doc_id").alias("doc_b"), "fp"), "fp")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
    scored = (
        pairs.join(na.select(F.col("doc_id").alias("doc_a"), "n_a"), "doc_a")
        .join(nb.select(F.col("doc_id").alias("doc_b"), "n_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_fps",
            F.round(
                F.col("shared_fps").cast("double") / F.least("n_a", "n_b"), 6
            ).alias("containment"),
        )
    )
    best = (
        scored.groupBy("doc_a")
        .agg(
            F.max(
                F.struct(
                    F.col("shared_fps").alias("s"),
                    (-F.col("doc_b")).alias("nb"),
                    F.col("containment").alias("c"),
                )
            ).alias("m")
        )
        .select(
            "doc_a",
            (-F.col("m.nb")).cast("long").alias("match_id"),
            F.col("m.s").alias("shared_fps"),
            F.col("m.c").alias("containment"),
        )
    )
    inc_ids = inc_docs.select("doc_id")
    return inc_ids.join(best, inc_ids["doc_id"] == best["doc_a"], "left").select(
        "doc_id",
        F.when(F.col("doc_a").isNotNull(), F.lit("substring_dup"))
        .otherwise(F.lit("new"))
        .alias("status"),
        "match_id",
        "shared_fps",
        "containment",
    )


def dedup_substring_rolling(
    spark,
    documents: DataFrame,
    store_path: str,
    day1: str | None = None,
    day2: str | None = None,
    days: list[str] | None = None,
) -> DataFrame:
    """Day-over-day maintenance loop for the SUBSTRING tier — the
    winnowing-fingerprint edition of dedup_minhash_rolling (same probe →
    admit → probe-the-advanced-store shape, same per-day cost: only the
    arriving batch is tokenized; the corpus rides partition-pruned store
    FileScans). A day-2 document sharing a shifted passage ONLY with a
    day-1 document is caught via day-1's STORED fingerprints. Each
    day's store read excludes its own and all FUTURE days' partitions
    (rerun-safe after any later admission, and created after every
    admission that rewrites a partition it keeps — the file-listing
    discipline _rolling_sig_store documents); oracle = the full
    recompute of all days. The registered query runs days=ROLLING_DAYS
    (N=3) like its minhash sibling — one composer, two families proving
    the cadence chain through the gated oracle; the 2-day day1=/day2=
    form remains for the pytest fixtures."""
    if days is None:
        days = [
            day1 or INCREMENTAL_INCOMING_SOURCE,
            day2 or ROLLING_DAY2_SOURCE,
        ]
    parts = []
    for i, day in enumerate(days):
        store = spark.read.parquet(store_path).filter(
            ~F.col("source").isin(*days[i:])
        )
        r = dedup_substring_incremental_from_store(documents, store, day)
        parts.append(r)
        append_winnow_fingerprints(
            documents.filter(F.col("source") == day), store_path
        )
    from flink_cep_task_spark.functions.rolling import day_union

    return day_union(parts)


def dedup_substring_incremental_sql(
    incoming_source: str = INCREMENTAL_INCOMING_SOURCE,
    incoming_where: str | None = None,
    corpus_where: str | None = None,
) -> str:
    if incoming_where is None:
        incoming_where = f"source = '{incoming_source}'"
    if corpus_where is None:
        corpus_where = f"NOT ({incoming_where})"
    return f"""
WITH words AS (
  SELECT doc_id, source, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
  FROM documents
), kg AS (
  SELECT doc_id, source, i,
         md5(array_to_string(w[i:(i + {WINNOW_K} - 1)], ' ')) AS h
  FROM words, LATERAL (SELECT unnest(range(1, len(w) - {WINNOW_K} + 2))::BIGINT AS i) s
), win AS (
  SELECT doc_id, source, i,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS wmin,
         count(*) OVER (PARTITION BY doc_id) AS m
  FROM kg
), fps AS (
  SELECT DISTINCT doc_id, source, wmin AS fp
  FROM win WHERE i <= greatest(m - {WINNOW_W} + 1, 1)
), inc AS (
  SELECT doc_id, fp FROM fps WHERE {incoming_where}
), cor AS (
  SELECT doc_id, fp FROM fps WHERE {corpus_where}
), cfreq AS (
  SELECT fp FROM cor GROUP BY fp HAVING count(*) <= {WINNOW_MAX_DOCS_PER_FP}
), na AS (
  SELECT doc_id, count(*) AS n FROM inc GROUP BY doc_id
), nb AS (
  SELECT doc_id, count(*) AS n FROM cor GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, c.doc_id AS doc_b, count(*) AS shared
  FROM inc a JOIN (SELECT cor.doc_id, cor.fp FROM cor JOIN cfreq USING (fp)) c
    ON a.fp = c.fp
  GROUP BY 1, 2 HAVING count(*) >= {WINNOW_MIN_SHARED}
), scored AS (
  SELECT doc_a, doc_b, shared,
         round(CAST(shared AS DOUBLE) / least(na.n, nb.n), 6) AS containment
  FROM pairs JOIN na ON na.doc_id = doc_a JOIN nb ON nb.doc_id = doc_b
), best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_a ORDER BY shared DESC, doc_b) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT d.doc_id,
       CASE WHEN b.doc_a IS NULL THEN 'new' ELSE 'substring_dup' END AS status,
       b.doc_b AS match_id,
       CAST(b.shared AS BIGINT) AS shared_fps,
       b.containment
FROM (SELECT doc_id FROM documents WHERE {incoming_where}) d
LEFT JOIN best b ON b.doc_a = d.doc_id
"""


DEDUP_SUBSTRING_INCREMENTAL_SQL = dedup_substring_incremental_sql()


def dedup_substring_rolling_sql(days: list[str] | None = None) -> str:
    """Full-recompute oracle for the substring rolling loop — the same
    N-day composition as dedup_minhash_rolling_sql: day i classified
    against the corpus minus days i..N."""
    from flink_cep_task_spark.functions.rolling import day_union_sql

    days = list(days or ROLLING_DAYS)
    sqls = []
    for i, day in enumerate(days):
        not_in = ", ".join(f"'{d}'" for d in days[i:])
        sqls.append(
            dedup_substring_incremental_sql(
                incoming_where=f"source = '{day}'",
                corpus_where=f"source NOT IN ({not_in})",
            )
        )
    return day_union_sql(sqls)


DEDUP_SUBSTRING_ROLLING_SQL = dedup_substring_rolling_sql()


# --- dedup retention report (clusters applied as a corpus filter) ---------

def dedup_retention_report(documents: DataFrame) -> DataFrame:
    """Apply near-dup clustering as an actual corpus filter and report the
    per-source retention: docs/chars kept when only each cluster's
    canonical (min doc_id) survives. This is the decision artifact of a
    dedup run — "how much of each source did dedup remove" — computed
    WITHOUT materializing a filtered copy of the corpus: the cluster map
    covers only docs that appear in a near-dup edge (sparse), the join
    back to documents is a left join on doc_id, and the rollup is one
    map-side-combinable aggregate per source. At 100 TB the corpus scan
    dominates; nothing here is quadratic or driver-side."""
    clusters = dedup_clusters(documents).select("doc_id", "is_canonical")
    keep = F.col("is_canonical").cast("long")
    return (
        documents.select("doc_id", "source", "n_chars")
        .join(clusters, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(keep).alias("n_kept"),
            F.sum("n_chars").alias("chars_total"),
            F.sum(F.col("n_chars") * keep).alias("chars_kept"),
        )
        .select(
            "source",
            "n_docs",
            "n_kept",
            (F.col("n_docs") - F.col("n_kept")).alias("n_dropped"),
            "chars_total",
            "chars_kept",
            F.round(F.col("n_kept").cast("double") / F.col("n_docs"), 6).alias(
                "doc_retention"
            ),
            F.round(
                F.col("chars_kept").cast("double") / F.col("chars_total"), 6
            ).alias("char_retention"),
        )
    )


DEDUP_RETENTION_SQL = f"""
WITH clusters AS (
  {DEDUP_CLUSTERS_SQL}
)
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN c.is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       count(*) - CAST(sum(CASE WHEN c.is_canonical THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       CAST(sum(d.n_chars) AS BIGINT) AS chars_total,
       CAST(sum(CASE WHEN c.is_canonical THEN d.n_chars ELSE 0 END) AS BIGINT)
         AS chars_kept,
       round(CAST(sum(CASE WHEN c.is_canonical THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS doc_retention,
       round(CAST(sum(CASE WHEN c.is_canonical THEN d.n_chars ELSE 0 END) AS DOUBLE)
             / sum(d.n_chars), 6) AS char_retention
FROM documents d JOIN clusters c USING (doc_id)
GROUP BY d.source
"""


# --- prefix dedup ---------------------------------------------------------

PREFIX_TOKENS = 8


def dedup_prefix(documents: DataFrame, k: int = PREFIX_TOKENS) -> DataFrame:
    """Dedup on the first-k-token prefix — the cheap screen used by web
    pipelines for boilerplate-headed / template pages whose bodies diverge
    only after a shared opening (mirrors the URL-prefix / doc-prefix pass
    in C4-style cleaning; the reference engine has no analog — this is a
    training-pipeline extension).

    Same scale shape as dedup_exact (`dedup.py:62`), including the
    explicit repartition on the hash so the aggregate and join probe share
    one exchange instead of recomputing the normalize+split+md5 projection
    per branch. Docs shorter than k tokens hash their whole normalized
    text — identical short docs still collapse."""
    pfx = F.array_join(F.slice(F.split(_norm(F.col("text")), " "), 1, k), " ")
    h = F.md5(F.coalesce(pfx, F.lit("\x00null")))
    d = documents.select("doc_id", h.alias("k")).repartition("k")
    canon = d.groupBy("k").agg(
        F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("n_group")
    )
    return d.join(canon, "k").select(
        "doc_id",
        "canonical_id",
        (F.col("doc_id") != F.col("canonical_id")).alias("is_duplicate"),
        "n_group",
    )


_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(trim(text)),"
    " '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))"
)

DEDUP_PREFIX_SQL = f"""
SELECT doc_id,
       min(doc_id) OVER (PARTITION BY k) AS canonical_id,
       doc_id <> min(doc_id) OVER (PARTITION BY k) AS is_duplicate,
       count(*) OVER (PARTITION BY k) AS n_group
FROM (SELECT doc_id,
             md5(coalesce(array_to_string(list_slice(string_split({_NORM_SQL}, ' '), 1, {PREFIX_TOKENS}), ' '), chr(0) || 'null')) AS k
      FROM documents)
"""


# --- cross-source duplicate overlap matrix --------------------------------

def cross_source_overlap(documents: DataFrame) -> DataFrame:
    """Pairwise source contamination matrix: for every ordered source pair
    (a < b), how many EXACT-duplicate text groups span both sources —
    the artifact that decides which crawls/dumps double-count each other
    before mixing weights are chosen.

    Scale shape: the corpus collapses to DISTINCT (md5, source) first
    (≤ |sources| rows per duplicate group, hashes not bodies), the pair
    explosion is per-group over that collapsed set (bounded by the number
    of distinct sources, not group size — a 1M-copy template counts once
    per source pair), and the final rollup is a map-side-combinable count
    on a (source, source) key. No quadratic blowup on hot groups."""
    k = _exact_key()
    per_src = documents.select(k.alias("k"), "source").distinct()
    a = per_src.alias("a")
    b = per_src.alias("b")
    return (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_texts"))
    )


CROSS_SOURCE_OVERLAP_SQL = f"""
WITH per_src AS (
  SELECT DISTINCT
    md5(coalesce({_NORM_SQL}, chr(0) || 'null')) AS k,
    source
  FROM documents
)
SELECT a.source AS source_a, b.source AS source_b,
       count(*) AS n_shared_texts
FROM per_src a JOIN per_src b ON a.k = b.k AND a.source < b.source
GROUP BY a.source, b.source
"""


# --- minhash estimation-quality audit -------------------------------------

def minhash_est_error_report(documents: DataFrame) -> DataFrame:
    """Per-verified-pair audit of the MinHash sketch itself: signature
    agreement fraction (the k/16 Jaccard ESTIMATE the bands act on) next
    to the exact Jaccard, with the absolute error — the artifact used to
    size NUM_PERMS/band layout before trusting the sketch on a new corpus
    (the MinHash analog of ann_recall_report).

    Cost shape: the pair set is the already-verified LSH output (session-
    shared, tiny), signatures join to it by doc id, and the agreement sum
    is 16 column equalities — no new corpus scan beyond the shared shingle
    cache. est and error are exact in both engines: k/16 is a dyadic
    rational (exact double) and the exact jaccard is pre-rounded."""
    sh = _persisted(shingles_hashed(documents))
    sig = _minhash_from_shingles(sh)
    pairs = dedup_minhash_lsh(documents).select("doc_a", "doc_b", "jaccard")
    a = sig.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"mh{p}").alias(f"a{p}") for p in range(NUM_PERMS)]
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"mh{p}").alias(f"b{p}") for p in range(NUM_PERMS)]
    )
    agree = None
    for p in range(NUM_PERMS):
        term = F.when(F.col(f"a{p}") == F.col(f"b{p}"), 1).otherwise(0)
        agree = term if agree is None else agree + term
    est = agree.cast("double") / float(NUM_PERMS)
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            est.alias("jaccard_est"),
            F.round(F.abs(est - F.col("jaccard")), 6).alias("abs_err"),
        )
    )


def _minhash_est_error_sql() -> str:
    mh_aggs = ",\n    ".join(
        "min({h}) AS mh{p}".format(h=perm_hash_sql("sh", p), p=p)
        for p in range(NUM_PERMS)
    )
    agree = " + ".join(
        f"CASE WHEN sa.mh{p} = sb.mh{p} THEN 1 ELSE 0 END" for p in range(NUM_PERMS)
    )
    return f"""
WITH pairs AS ({_minhash_sql()}),
{shingles_hashed_cte("2").strip()},
sig2 AS (
  SELECT doc_id,
    {mh_aggs}
  FROM shh2
  GROUP BY doc_id
)
SELECT p.doc_a, p.doc_b, p.jaccard,
       CAST(({agree}) AS DOUBLE) / {float(NUM_PERMS)!r} AS jaccard_est,
       round(abs(CAST(({agree}) AS DOUBLE) / {float(NUM_PERMS)!r} - p.jaccard), 6)
         AS abs_err
FROM pairs p
JOIN sig2 sa ON sa.doc_id = p.doc_a
JOIN sig2 sb ON sb.doc_id = p.doc_b
"""


MINHASH_EST_ERROR_SQL = _minhash_est_error_sql()


# --- dedup method-agreement matrix ----------------------------------------

def dedup_method_agreement(documents: DataFrame) -> DataFrame:
    """Which near-dup detectors agree: the (exact, MinHash-LSH, SimHash)
    membership matrix over the union of all flagged pairs — the audit a
    pipeline runs before committing to one method's threshold (exact ⊆
    minhash by construction: identical docs share signatures; the
    interesting rows are the sketch methods' disagreements).

    Cost shape: reuses the session-shared verified MinHash pair set and
    the banded SimHash join; the exact-pair arm is the same
    one-exchange-reused hash self-join as dedup_exact. Output is ≤ 2³
    rows."""
    k = _exact_key()
    d = documents.select("doc_id", k.alias("k")).repartition("k")
    a, b = d.alias("a"), d.alias("b")
    ex = a.join(
        b, (F.col("a.k") == F.col("b.k")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    mh = dedup_minhash_lsh(documents).select("doc_a", "doc_b")
    sh = dedup_simhash(documents).select("doc_a", "doc_b")
    u = (
        ex.withColumn("m", F.lit("e"))
        .unionByName(mh.withColumn("m", F.lit("m")))
        .unionByName(sh.withColumn("m", F.lit("s")))
    )
    flags = u.groupBy("doc_a", "doc_b").agg(
        F.max((F.col("m") == "e").cast("int")).alias("__e"),
        F.max((F.col("m") == "m").cast("int")).alias("__m"),
        F.max((F.col("m") == "s").cast("int")).alias("__s"),
    )
    return (
        flags.groupBy(
            (F.col("__e") == 1).alias("in_exact"),
            (F.col("__m") == 1).alias("in_minhash"),
            (F.col("__s") == 1).alias("in_simhash"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


DEDUP_AGREEMENT_SQL = f"""
WITH keyed AS (
  SELECT doc_id,
         md5(coalesce({_NORM_SQL}, chr(0) || 'null')) AS k
  FROM documents
),
u AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 'e' AS m
  FROM keyed a JOIN keyed b ON a.k = b.k AND a.doc_id < b.doc_id
  UNION ALL
  SELECT doc_a, doc_b, 'm' AS m FROM ({MINHASH_LSH_SQL})
  UNION ALL
  SELECT doc_a, doc_b, 's' AS m FROM ({SIMHASH_SQL})
),
flags AS (
  SELECT doc_a, doc_b,
         max(CASE WHEN m = 'e' THEN 1 ELSE 0 END) AS e,
         max(CASE WHEN m = 'm' THEN 1 ELSE 0 END) AS mm,
         max(CASE WHEN m = 's' THEN 1 ELSE 0 END) AS s
  FROM u GROUP BY doc_a, doc_b
)
SELECT e = 1 AS in_exact, mm = 1 AS in_minhash, s = 1 AS in_simhash,
       count(*) AS n_pairs
FROM flags GROUP BY 1, 2, 3
"""


# --- bloom-filter scan-side pruning for incremental dedup ----------------

# Bitmap sizing for the fixture scale: 2**17 bits = 2048 64-bit words
# (16 KiB broadcast). At production scale size m ~ 10 bits per incoming
# key (fp ~ 1%): a 1-billion-key daily crawl is a 1.25 GB bitmap — still
# a broadcast, where the exact key set (32 B/key = 32 GB) is not.
BLOOM_BITS = 1 << 17
BLOOM_HASHES = 5

def _bit_masks() -> Column:
    """element_at(_bit_masks(), pos % 64 + 1) == the 64-bit word with only
    that bit set; a literal array because Spark's shiftleft() takes a
    literal shift count, not a column. Bit 63 wraps to the sign bit.
    Built lazily — Column literals need an active SparkContext."""
    return F.array(
        *[F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long") for i in range(64)]
    )


def _bloom_positions(k: Column) -> list[Column]:
    """BLOOM_HASHES independent bit positions for key k: xxhash64 seeded
    by hashing a distinct literal alongside the key (xxhash64 has no seed
    parameter; an extra input column re-keys it)."""
    return [
        F.pmod(F.xxhash64(F.lit(i), k), F.lit(BLOOM_BITS))
        for i in range(BLOOM_HASHES)
    ]


def dedup_bloom_prune(
    documents: DataFrame, incoming_source: str = INCREMENTAL_INCOMING_SOURCE
) -> DataFrame:
    """Incremental corpus-membership check with SCAN-SIDE bloom pruning —
    the join strategy for the regime where the CORPUS is the 100 TB side
    and the incoming batch is too large to broadcast as an exact hash
    table but its bloom bitmap fits anywhere.

    Build: the incoming batch's keys are hashed to BLOOM_HASHES bit
    positions, reduced to <= BLOOM_BITS/64 (word, bits) rows by a bit_or
    aggregate — the ONLY shuffle of the build, bounded by the bitmap size
    not the batch size — and packed into a single-row map<word,bits>
    that broadcasts to every corpus partition (16 KiB here; see
    BLOOM_BITS note for production sizing).

    Probe: each corpus row tests its key's BLOOM_HASHES bits against the
    broadcast map INSIDE the scan stage, so corpus rows that cannot match
    (1 - fp of them, fp = (1 - e^(-kn/m))^k) die before the exchange.
    Only bloom survivors — true matches plus a fp sliver — shuffle into
    the exact equi-join that the final answer is computed from, which is
    why the output is EXACT and a plain left-join oracle checks it: a
    false positive survives the bloom but finds no incoming key in the
    verify join; a false negative is impossible.

    Output: one row per incoming doc — the min corpus doc_id sharing its
    normalized-text key (NULL if the corpus has never seen it)."""
    from functools import reduce as _reduce
    from operator import and_ as _and

    key = _exact_key()
    inc = documents.filter(F.col("source") == incoming_source).select(
        "doc_id", key.alias("k")
    )
    corpus = documents.filter(F.col("source") != incoming_source).select(
        "doc_id", key.alias("k")
    )

    pos = inc.select(
        F.explode(F.array(*_bloom_positions(F.col("k")))).alias("pos")
    )
    words = pos.select(
        F.shiftright("pos", 6).cast("int").alias("w"),
        F.element_at(
            _bit_masks(), F.pmod("pos", F.lit(64)).cast("int") + F.lit(1)
        ).alias("m"),
    )
    bloom = (
        words.groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .groupBy()
        .agg(
            F.map_from_arrays(
                F.collect_list("w"), F.collect_list("bits")
            ).alias("bloom")
        )
    )

    probed = corpus.join(F.broadcast(bloom))  # 1-row broadcast attach
    conds = []
    for p in _bloom_positions(F.col("k")):
        word = F.coalesce(
            F.try_element_at(F.col("bloom"), F.shiftright(p, 6).cast("int")),
            F.lit(0).cast("long"),
        )
        bit = F.element_at(_bit_masks(), F.pmod(p, F.lit(64)).cast("int") + F.lit(1))
        conds.append(word.bitwiseAND(bit) != F.lit(0))
    survivors = probed.filter(_reduce(_and, conds)).select("doc_id", "k")

    corpus_min = survivors.groupBy("k").agg(F.min("doc_id").alias("corpus_match_id"))
    return inc.join(corpus_min, "k", "left").select(
        "doc_id",
        "corpus_match_id",
        F.col("corpus_match_id").isNotNull().alias("is_corpus_dup"),
    )


DEDUP_BLOOM_PRUNE_SQL = f"""
WITH inc AS (
  SELECT doc_id, {DEDUP_KEY_SQL} AS k
  FROM documents WHERE source = '{INCREMENTAL_INCOMING_SOURCE}'
),
corp AS (
  SELECT {DEDUP_KEY_SQL} AS k, min(doc_id) AS corpus_match_id
  FROM documents WHERE source <> '{INCREMENTAL_INCOMING_SOURCE}'
  GROUP BY 1
)
SELECT inc.doc_id,
       corp.corpus_match_id,
       corp.corpus_match_id IS NOT NULL AS is_corpus_dup
FROM inc LEFT JOIN corp USING (k)
"""


# --- incremental cluster maintenance (stored labels + new edges) ----------

def incremental_cluster_edges(
    documents: DataFrame,
    store: DataFrame,
    incoming_source: str = INCREMENTAL_INCOMING_SOURCE,
) -> DataFrame:
    """Verified near-dup pairs INVOLVING the incoming batch, computed
    from the signature store: incoming↔corpus candidates band-join the
    store's precomputed signatures (corpus text untouched), and
    incoming↔incoming candidates band-join the fresh incoming signatures
    against themselves. Both verify with the exact-Jaccard criterion of
    dedup_minhash_lsh, and the pair predicate is pairwise-local, so

        pairs(full corpus ∪ batch) = pairs(corpus) ∪ THIS —

    the identity incremental clustering rests on."""
    inc_docs = documents.filter(F.col("source") == incoming_source)
    sh_inc = _persisted(shingles_hashed(inc_docs))
    inc_b = _persisted(
        _banded(_minhash_from_shingles(sh_inc)).select("doc_id", "band", "sig")
    )
    corpus = store.filter(F.col("source") != incoming_source)
    cor_b = _banded(corpus).select(F.col("doc_id").alias("doc_b"), "band", "sig")
    cand_ic = (
        inc_b.select(F.col("doc_id").alias("doc_a"), "band", "sig")
        .join(cor_b, ["band", "sig"])
        .select("doc_a", "doc_b")
        .distinct()
    )
    cand_ii = _self_band_candidates(inc_b)
    va = _incoming_sets(sh_inc)
    vb_store = corpus.select(
        F.col("doc_id").alias("doc_b"), F.col("S").alias("Sb"), F.size("S").alias("nb")
    )
    vb_inc = va.select(
        F.col("doc_a").alias("doc_b"), F.col("Sa").alias("Sb"), F.col("na").alias("nb")
    )
    return _verify_set_pairs(cand_ic, va, vb_store).select(
        "doc_a", "doc_b"
    ).unionByName(_verify_set_pairs(cand_ii, va, vb_inc).select("doc_a", "doc_b"))


def dedup_clusters_from_store(
    documents: DataFrame,
    cluster_store: DataFrame,
    sig_store: DataFrame,
    incoming_source: str = INCREMENTAL_INCOMING_SOURCE,
) -> DataFrame:
    """dedup_clusters' incremental daily-production twin: connected
    components over the UNION of the stored corpus labels and the new
    batch's edges, instead of re-running LSH over the whole corpus.

    Why this equals the full recompute (the oracle): the stored
    (doc_id, cluster_id) labels are a SPANNING structure of the corpus
    near-dup graph — star edges doc→(component min) connect exactly the
    corpus components — and incremental_cluster_edges contributes every
    pair involving the batch (the pair criterion is pairwise-local). CC
    over the union therefore has the same components as CC over the full
    pair set, and since labels are doc_ids, min-label propagation yields
    each merged component's global min — identical output to
    dedup_clusters(corpus ∪ batch), which is what DEDUP_CLUSTERS_SQL
    recomputes.

    Scale shape: corpus text is NEVER read (the only full-documents scan
    is the doc_id-projected final join); the store scans carry the
    source partition filter; the fixpoint iterates over |label edges| +
    |new edges| rows — the sparse near-dup graph, not the corpus."""
    new_pairs = incremental_cluster_edges(documents, sig_store, incoming_source)
    label_pairs = cluster_store.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("doc_b")
    )
    return _cluster_from_pairs(documents, new_pairs.unionByName(label_pairs))


# --- day-over-day cluster-label store maintenance (VERDICT r9 task #2) ----

CLUSTER_BASE_EPOCH = "base"

# explicit reader schema: a duplicate-free corpus writes ZERO star-edge
# rows, and a 0-row partitionBy write leaves no parquet files at all —
# schema inference would fail on the empty store (same contract as
# read_rollup_partial_store)
CLUSTER_LABEL_STORE_SCHEMA = "doc_id LONG, cluster_id LONG, epoch STRING"


def read_cluster_label_store(spark, path: str, epoch: str) -> DataFrame:
    """One epoch's star edges from the label store — the ONE reader, so
    the empty-store schema contract can't drift between the rolling
    query's two day probes."""
    return (
        spark.read.schema(CLUSTER_LABEL_STORE_SCHEMA)
        .parquet(path)
        .filter(F.col("epoch") == epoch)
        .select("doc_id", "cluster_id")
    )


def minhash_pairs_from_store(store: DataFrame) -> DataFrame:
    """The dedup_minhash_lsh pair set computed ENTIRELY from the
    signature store — no document is ever re-shingled: banded candidates
    self-join the stored signatures, and the exact-Jaccard verify runs
    on the stored distinct-shingle sets via the shared
    _verify_set_pairs criterion. This is what makes the cluster-label
    store's base build a store-side derivation: at 100 TB the corpus
    text is read once per document lifetime (when its signatures are
    admitted), and cluster maintenance touches only the store."""
    cand = _self_band_candidates(
        _persisted(_banded(store).select("doc_id", "band", "sig"))
    )
    va = store.select(
        F.col("doc_id").alias("doc_a"), F.col("S").alias("Sa"), F.size("S").alias("na")
    )
    vb = store.select(
        F.col("doc_id").alias("doc_b"), F.col("S").alias("Sb"), F.size("S").alias("nb")
    )
    return _verify_set_pairs(cand, va, vb).select("doc_a", "doc_b")


def write_cluster_label_store(
    labels: DataFrame, path: str, epoch: str, dynamic: bool = False
) -> None:
    """Materialize cluster labels under an EPOCH partition — the
    spanning-structure artifact incremental clustering advances. Only
    the STAR EDGES are stored (doc_id != cluster_id — each duplicate
    doc pointing at its component min): singletons and canonical roots
    re-derive as their own id in every consumer
    (dedup_clusters_from_store's label_pairs filter and the final
    coalesce both treat an absent row as label = doc_id), so storing
    them would spend O(corpus) rows on information the doc_id column
    already carries — the store stays O(duplicate docs), which is what
    makes daily label admission affordable at 100 TB. Unlike the
    signature stores (per-source partitions that only ever ADD), a
    label advance REWRITES labels of existing docs (components merge),
    so admissions land complete star-edge sets under the admitting
    day's own epoch: the base epoch stays untouched (day-1 probes
    re-run pinned against it) and a retried admission dynamically
    overwrites its own epoch partition — idempotent, like the sibling
    stores' batch partitions.

    When `labels` carries the _graft_cc_labels attribute
    (_cluster_from_pairs threads its node-only fixpoint mapping), the
    write uses THAT: docs absent from the mapping are exactly the
    doc_id == cluster_id rows the filter below discards, so the star
    edges are identical — but the mapping is a checkpointed few-row
    frame, while the full per-doc frame costs a corpus scan + join per
    admission (the round-10 probe profile measured that join dominating
    the admission wall)."""
    src = getattr(labels, "_graft_cc_labels", None)
    if src is not None:
        # Equivalence precondition (ADVICE r10): the mapping covers only
        # nodes that appear in edges, and it equals the full frame's
        # star edges ONLY if every such node survives the corpus join
        # the full frame ran (edge endpoints ⊆ documents universe). All
        # current producers satisfy it (pairs derive from the same
        # universe as `documents`); a caller whose pairs reference
        # since-removed docs would persist star edges the full frame
        # drops. SPARK_GRAFT_DEBUG_STORES=1 verifies containment with an
        # anti-join (a count per admission — debug/test only;
        # tests/test_store_compaction.py runs one cadence under it).
        import os as _os

        if _os.environ.get("SPARK_GRAFT_DEBUG_STORES"):
            stray = (
                src.select("doc_id")
                .join(labels.select("doc_id"), "doc_id", "left_anti")
                .count()
            )
            if stray:
                raise ValueError(
                    f"cluster-label mapping carries {stray} doc_ids outside "
                    "the labels frame's universe — the star-edge fast path "
                    "would persist edges the full frame drops"
                )
        labels = src.select("doc_id", F.col("label").alias("cluster_id"))
    # REBALANCE before the partitioned write (guide §6): one epoch's
    # star edges otherwise land as one sliver per upstream task; AQE
    # coalesces them to advisory-size files (and would split an
    # oversized epoch at scale)
    w = (
        labels.filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id", "cluster_id")
        .withColumn("epoch", F.lit(epoch))
        .hint("rebalance", "epoch")
        .write.mode("overwrite")
        .partitionBy("epoch")
    )
    if dynamic:
        w = w.option("partitionOverwriteMode", "dynamic")
    w.parquet(path)
    # materialize the epoch's partition DIRECTORY even when it has zero
    # star edges (a duplicate-free clustering): a 0-row partitionBy
    # write creates no directory, which would make "epoch admitted"
    # unobservable — the schema-pinned reader would correctly return an
    # empty mapping, but retire_label_epochs' existence-based retain
    # sets (and its newest-epoch guard) could not see the epoch at all,
    # so a legitimate GC down to an empty rebuild would refuse to run.
    # mkdirs is idempotent and goes through the same Hadoop FS the GC
    # lists, so the invariant holds on any store URI.
    sc = labels.sparkSession.sparkContext
    p = sc._jvm.org.apache.hadoop.fs.Path(path, f"epoch={epoch}")
    p.getFileSystem(sc._jsc.hadoopConfiguration()).mkdirs(p)


def retire_label_epochs(spark, path: str, keep: list[str] | None = None,
                        keep_last: int | None = None) -> dict:
    """Epoch GC for the cluster-label store (VERDICT r10 task #1) — the
    retention job the store's growth shape demands: unlike the additive
    per-doc stores (O(batch) bytes per day), every label advance writes
    a COMPLETE corpus-sized star-edge mapping under a new epoch
    partition, so a daily cadence grows the store O(corpus × days) and
    superseded epochs are pure dead weight. Reads are epoch-pinned
    (read_cluster_label_store selects exactly one epoch; the rolling
    probe flow reads only the previous advance's epoch), so deleting any
    epoch no consumer will pin again is safe BY CONSTRUCTION — GC can
    never change an answer, only reclaim bytes and shrink the driver's
    partition listing.

    Listing and deletion go through the Hadoop FileSystem API resolved
    from the store URI (VERDICT r11 task #2): at the 100 TB design point
    these stores live on object storage or HDFS, where `os.path`/`glob`
    semantics don't exist — `Path.getFileSystem` routes a local path
    through the local FS, an `hdfs://`/`s3a://`/`gs://` URI through its
    connector, so the one operator whose purpose is at-scale byte
    reclamation runs against the at-scale store. (Deletion still happens
    on the DRIVER — it is a control-plane metadata job over O(epochs)
    directories, never a data job.)

    `keep` names the epochs to retain explicitly; `keep_last=N` instead
    retains the N most-recently-WRITTEN epochs. Recency is the newest
    FILE modification time inside each epoch partition (directory mtime
    as the floor, epoch name as a deterministic tiebreak) — file mtimes
    because object stores report synthetic (often zero) times for
    directory prefixes, and the whole point of the Hadoop-FS port is
    that this job runs against s3a://gs:// stores; one extra listStatus
    per epoch is control-plane cost on a job that is all control plane.
    The same recency ranking drives the safety guard: the newest epoch
    is always retained, NOT the lexicographically-last one — so a
    rebuild epoch named 'rebuilt' alongside daily 'src*' epochs is
    recognized as the store's newest advance even though it sorts first
    (ADVICE r12: the earlier lexicographic guard mis-ranked exactly
    that case), and an idempotent re-land of an OLD epoch makes that
    epoch newest for both the guard and keep_last consistently. An
    explicit `keep` that omits the newest advance raises rather than
    GCing it out from under the next incremental probe (rolling back a
    bad epoch is a different operation — delete it explicitly, don't
    reach for the GC). Deletion is per-partition directory (hive
    layout `epoch=<v>/`): partition-granular, atomic per epoch at the
    directory level, and invisible to pinned readers of surviving
    epochs — their file listings never contained the retired
    directories. Returns {"retired": [...], "kept": [...]} for the
    caller's audit log."""
    sc = spark.sparkContext
    jvm = sc._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(sc._jsc.hadoopConfiguration())
    dirs = {}
    mtimes = {}
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith("epoch="):
                ep = name.split("=", 1)[1]
                dirs[ep] = st.getPath()
                m = st.getModificationTime()
                for child in fs.listStatus(st.getPath()):
                    m = max(m, child.getModificationTime())
                mtimes[ep] = m
    recency = sorted(dirs, key=lambda ep: (mtimes[ep], ep))
    if keep is None:
        if keep_last is None:
            raise ValueError("pass keep=[...] or keep_last=N")
        keep = recency[-keep_last:] if keep_last > 0 else []
    if dirs:
        if not set(keep) & set(dirs):
            # an empty retain set would delete the store's only readable
            # epoch out from under its next consumer
            raise ValueError(
                f"keep={keep!r} retains no existing epoch of {sorted(dirs)}"
            )
        latest = recency[-1]
        if latest not in set(keep):
            raise ValueError(
                f"keep={keep!r} would retire the newest epoch {latest!r} — "
                "the GC never deletes the store's most recent advance"
            )
    retired = sorted(set(dirs) - set(keep))
    for ep in retired:
        fs.delete(dirs[ep], True)
    return {"retired": retired, "kept": sorted(set(dirs) & set(keep))}


def rebuild_label_epoch(
    spark, sig_store_path: str, label_store_path: str,
    epoch: str, corpus_pred=None,
) -> None:
    """Full epoch REBUILD — the documented SPLIT mechanism for the label
    store (VERDICT r10 task #2). Incremental label advances are CC
    MERGES: an edge that disappears (a re-crawled doc whose changed text
    no longer near-dups its old partner, or a deleted doc) can never
    split a stored cluster — the stale epoch stays a SUPERSET of the
    true clustering. The only split-capable operation is recomputing the
    clustering from the CURRENT per-doc signature store (which recrawl
    admissions DO keep correct — dynamic overwrite replaces a re-crawled
    doc's signature rows) and landing it as a fresh epoch. Same
    derivation as the base-epoch build (minhash_pairs_from_store — the
    corpus text is never re-shingled; cost is the banded self-join over
    the store, the same job the base build runs), so production
    schedules this at recrawl-rate cadence (weekly, say), with the daily
    incremental advance in between and retire_label_epochs GCing the
    superseded epochs after each rebuild."""
    sig = spark.read.parquet(sig_store_path)
    if corpus_pred is not None:
        sig = sig.filter(corpus_pred)
    # universe = the store's own doc_ids (the source of truth for what
    # has been crawled) — keeps the pairs and the corpus join derived
    # from the SAME scan, which is exactly the containment precondition
    # write_cluster_label_store's fast path needs
    labels = _cluster_from_pairs(
        sig.select("doc_id"), minhash_pairs_from_store(sig)
    )
    write_cluster_label_store(labels, label_store_path, epoch=epoch, dynamic=True)


def dedup_clusters_rolling(
    spark,
    documents: DataFrame,
    label_store_path: str,
    sig_store_path: str,
    day1: str | None = None,
    day2: str | None = None,
    days: list[str] | None = None,
) -> DataFrame:
    """Day-over-day CLUSTER-label maintenance — the missing maintenance-
    family member (VERDICT r9 task #2), closing the loop
    dedup_clusters_stored opened: that query merges one batch against
    stored labels but never admits the merged labels back, so nothing
    proved the advanced labels are a valid spanning structure for the
    NEXT day. This query does the full cycle:

      day 1: CC over (base-epoch stored labels ∪ the day-1 batch's
             signature-store edges) — clusters of corpus ∪ day1;
             then ADMIT day-1's signatures into the signature store and
             the merged labels under the day-1 epoch;
      day 2: CC over (day-1-epoch stored labels ∪ the day-2 batch's
             edges against the ADVANCED signature store) — a day-2 doc
             whose only near-dup partner is a day-1 doc lands in the
             day-1 doc's cluster purely via stored state (its partner's
             text is never re-shingled), and a day-1 merge of two
             corpus clusters is visible to day 2 through the admitted
             labels alone.

    Why each day equals the full recompute (the oracle): stored labels
    are a spanning structure of their epoch's near-dup graph, the batch
    edge set is every pair involving the batch (pairwise-local
    criterion), so CC over the union has the full graph's components
    and min-label propagation yields each component's global min — see
    dedup_clusters_from_store. Day-1 reads are PINNED (base epoch;
    signature store minus every day partition) so a rerun after any
    admissions still answers as day 1. Oracle = full recursive-CTE
    recompute of each day (day i over documents minus the days not yet
    crawled).

    Lifecycle policy (VERDICT r10 tasks #1/#2, pinned by
    tests/test_recrawl.py + tests/test_store_compaction.py):
      * retention — every advance writes a full corpus-sized mapping
        under a new epoch; superseded epochs are retired with
        retire_label_epochs (safe by construction: reads are
        epoch-pinned);
      * recrawl/split — incremental advances are CC MERGES and cannot
        split a cluster whose near-dup edge disappeared (a re-crawled
        doc with changed text): the stored epoch stays a stale SUPERSET.
        Per-doc signature admissions DO track the change (dynamic
        overwrite replaces the doc's rows), so the split mechanism is a
        scheduled full epoch rebuild from the current signature store
        (rebuild_label_epoch) followed by epoch GC — daily merges,
        recrawl-cadence rebuilds.

    Generalized to the N-day cadence (VERDICT r11 task #3 — this is the
    epoch-REWRITING store, where the chained proof matters most): day i
    merges from the PREVIOUS day's admitted epoch, so a day-3 membership
    whose only path runs through a day-1⊔day-2 merge is reachable only
    if both label admissions genuinely advanced the store. Day i's
    signature read pins OUT days i..N (its own and future partitions —
    rerun-safe after any number of later admissions) and its universe
    excludes days i+1..N (not yet crawled). The registered query runs
    days=ROLLING_DAYS (N=3); the 2-day day1=/day2= form remains for the
    pytest fixtures."""
    if days is None:
        days = [
            day1 or INCREMENTAL_INCOMING_SOURCE,
            day2 or ROLLING_DAY2_SOURCE,
        ]
    parts = []
    prev_epoch = CLUSTER_BASE_EPOCH
    for i, day in enumerate(days):
        sig = spark.read.parquet(sig_store_path).filter(
            ~F.col("source").isin(*days[i:])
        )
        lab = read_cluster_label_store(spark, label_store_path, prev_epoch)
        universe = (
            documents.filter(~F.col("source").isin(*days[i + 1:]))
            if days[i + 1:]
            else documents
        )
        r = dedup_clusters_from_store(universe, lab, sig, day)
        parts.append(r)
        # ADMISSION: the day's signatures (source partition, shared
        # writer) and the merged labels (the day's own epoch) — both
        # idempotent dynamic overwrites; the label write lands r's
        # checkpointed CC mapping (star edges only), so the next day's
        # probe genuinely reads stored state. Two DISTINCT stores →
        # overlapped writes (guide §2.6); the barrier precedes the next
        # day's store reads.
        from flink_cep_task_spark.functions.jobs import run_parallel

        run_parallel(
            lambda: append_minhash_signatures(
                documents.filter(F.col("source") == day), sig_store_path
            ),
            lambda: write_cluster_label_store(
                r, label_store_path, epoch=day, dynamic=True
            ),
        )
        prev_epoch = day
    from flink_cep_task_spark.functions.rolling import day_union

    return day_union(parts)


def dedup_clusters_rolling_sql(days: list[str] | None = None) -> str:
    """Full-recompute oracle for the cluster rolling loop: day i
    clustered over the world minus days i+1..N (the days not yet
    crawled as of day i) — the stores change COST, never answers. The
    N-day shape makes the gated oracle prove the label-cadence chain:
    a day-3 membership that exists only via a day-2 merge of day-1
    clusters requires both admitted epochs to be correct spanning
    structures."""
    from flink_cep_task_spark.functions.rolling import day_union_sql

    days = list(days or ROLLING_DAYS)
    blocks = []
    for i in range(len(days)):
        future = days[i + 1:]
        if future:
            in_list = ", ".join(f"'{d}'" for d in future)
            blocks.append(
                dedup_clusters_sql(
                    source=f"docs_d{i + 1}",
                    prelude=(
                        f"docs_d{i + 1} AS (SELECT * FROM documents "
                        f"WHERE source NOT IN ({in_list})),\n"
                    ),
                )
            )
        else:
            blocks.append(dedup_clusters_sql())
    return day_union_sql(blocks)


DEDUP_CLUSTERS_ROLLING_SQL = dedup_clusters_rolling_sql()
