"""Embedding similarity search over `embeddings` (vec_id, embedding
ARRAY<FLOAT>, label).

Two paths:
  * knn_bruteforce — exact top-k cosine: broadcast the (small) query set,
    stream once over all vectors. The scan side never shuffles; per-pair
    work is a zip_with/aggregate fold (built-in higher-order functions,
    JVM-side). This is the 100 TB-safe exact baseline: cost = |Q| × scan.
  * ann_lsh — MULTI-TABLE random-hyperplane LSH: N_TABLES independent
    signature tables of BITS_PER_TABLE sign-bits each; a pair is a
    candidate if it collides in ANY table (recall compounds across
    tables: p_hit = 1-(1-p^b)^T), exact cosine only on candidates.
    Each (table, signature) bucket's data side is capped at BUCKET_CAP
    rows (deterministic lowest-vec_id), so the bucket join's fan-out is
    bounded by |Q|×T×CAP no matter how skewed the vector distribution —
    the single-table/8-bit variant degenerated toward all-pairs at large
    N (256 buckets ⇒ N/256 per bucket). Band width should grow with
    log2(N): 12 bits suits ~1e5-1e7 vectors; at 1e9 raise to 16-20 so
    expected bucket occupancy stays O(cap).

Cross-engine determinism AND speed: float components are widened to DOUBLE,
quantized to DECIMAL(9,6), then scaled ×10⁶ into exact 64-bit INTEGERS —
every dot product / norm-squared is an integer sum (order-independent, so
safe under any partitioning, and plain long arithmetic in whole-stage
codegen instead of JVM BigDecimal, which made the signature stage the
bench hotspot). |component|·10⁶ < 2^24 ⇒ a 64-dim dot ≤ 2^54 — exact in
int64 AND in the double conversions both engines apply afterwards. Only
the final sqrt/division is floating point, with identical operand values
and operation order in Spark and DuckDB. Ranking orders by the ROUNDED
cosine with vec_id tie-break, so both engines rank identically.
Hyperplane weights are ±1 literals derived from md5 in Python and inlined
on BOTH sides.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_QUERIES = 10       # query set = vec_id < 10
TOP_K = 5
DIM = 64
N_TABLES = 4         # independent LSH tables (OR-amplification for recall)
BITS_PER_TABLE = 12  # sign-bits per table (AND-amplification for precision)
N_PLANES = N_TABLES * BITS_PER_TABLE
BUCKET_CAP = 256     # max data-side rows considered per (table, signature)

VDEC = "decimal(9,6)"
SCALE = 1_000_000          # DECIMAL(9,6) → exact integer micro-units
SCALE2 = float(SCALE) ** 2  # de-scaling for dot products of two vectors


def _vec_int(c: Column) -> Column:
    """float array → exact micro-unit int64 array (via the DECIMAL(9,6)
    quantization, so the integer IS the decimal times 10⁶)."""
    return F.transform(
        c, lambda x: (x.cast("double").cast(VDEC) * SCALE).cast("long")
    )


def _idot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two micro-unit vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _cosine(va: Column, vb: Column, na: Column, nb: Column) -> Column:
    return F.round(
        (_idot(va, vb).cast("double") / F.lit(SCALE2)) / (na * nb), 6
    )


def _with_norm(df: DataFrame) -> DataFrame:
    from flink_cep_task_spark.operators.cache import copy_provenance

    v = _vec_int(F.col("embedding"))
    return copy_provenance(
        df.select(
            "vec_id",
            v.alias("v"),
            F.sqrt(_idot(v, v).cast("double") / F.lit(SCALE2)).alias("nrm"),
        ),
        df,
    )


def knn_bruteforce(embeddings: DataFrame) -> DataFrame:
    """Exact top-5 cosine neighbors for each query vector (vec_id < 10)."""
    base = _with_norm(embeddings)
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    pairs = base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = _cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm"))
    ranked = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
    ).withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
        ),
    )
    # session-shared: |Q| x k rows of model-audit output, rebuilt
    # canonically-identically by ann_recall_report — whichever materializes
    # first, the other hits the cache (see cache.persisted_shared)
    from flink_cep_task_spark.operators.cache import persisted_shared

    return persisted_shared(
        ranked.filter(F.col("rnk") <= TOP_K).select(
            "query_id", "neighbor_id", "cosine", "rnk"
        ),
        src=base,
    )


_FLAT_CTE = """flat AS (
  SELECT vec_id, i,
         CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(9,6)) * 1000000 AS BIGINT) AS v
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS i FROM embeddings)
)"""
_NORMS_CTE = f"""norms AS (
  SELECT vec_id, sqrt(CAST(sum(v * v) AS DOUBLE) / {SCALE2!r}) AS nrm
  FROM flat GROUP BY vec_id
)"""

KNN_SQL = f"""
WITH {_FLAT_CTE},
{_NORMS_CTE},
dots AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         CAST(sum(a.v * b.v) AS DOUBLE) / {SCALE2!r} AS dt
  FROM flat a JOIN flat b ON a.i = b.i AND b.vec_id <> a.vec_id
  WHERE a.vec_id < {N_QUERIES}
  GROUP BY a.vec_id, b.vec_id
),
cos AS (
  SELECT query_id, neighbor_id,
         round(dt / (na.nrm * nb.nrm), 6) AS cosine
  FROM dots
  JOIN norms na ON na.vec_id = query_id
  JOIN norms nb ON nb.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk
  FROM cos
) WHERE rnk <= {TOP_K}
"""


def _plane_weights() -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5 — computed once in Python and
    inlined as literals in BOTH engines (no engine hash dependency)."""
    planes = []
    for p in range(N_PLANES):
        row = []
        for i in range(DIM):
            digest = hashlib.md5(f"{p}:{i}".encode()).hexdigest()
            row.append(1 if int(digest[0], 16) & 1 else -1)
        planes.append(row)
    return planes


PLANES = _plane_weights()


def _make_sigs_udf():
    """All N_PLANES sign-bits in ONE Arrow-vectorized numpy matmul —
    48 interpreted higher-order-function dots per row made the signature
    stage the bench hotspot; int64 matmul is exact (|dot| < 2^54), so the
    signs — and therefore every bucket — are bit-identical to the
    per-plane integer dots the DuckDB oracle computes."""
    planes_t = np.array(PLANES, dtype=np.int64).T  # (DIM, N_PLANES)

    @F.pandas_udf("array<string>")
    def sigs(vs: pd.Series) -> pd.Series:
        m = np.array(vs.tolist(), dtype=np.int64)          # (B, DIM)
        bits = (m @ planes_t) > 0                          # (B, N_PLANES)
        chars = np.where(bits, "1", "0")
        out = [
            [
                "".join(row[t * BITS_PER_TABLE : (t + 1) * BITS_PER_TABLE])
                for t in range(N_TABLES)
            ]
            for row in chars
        ]
        return pd.Series(out)

    return sigs


def _bucketed(base: DataFrame) -> DataFrame:
    """(vec_id, table, sig): one row per vector per LSH table."""
    sigs = _make_sigs_udf()
    return base.select(
        "vec_id", F.posexplode(sigs(F.col("v"))).alias("table", "sig")
    )


def ann_lsh(embeddings: DataFrame) -> DataFrame:
    """Approximate top-5 cosine: candidates = pairs colliding in ≥1 of the
    N_TABLES signature tables (data side capped at BUCKET_CAP rows per
    bucket, lowest vec_id first — deterministic, mirrored in the oracle),
    then exact cosine + rank on candidates only. May return <5 rows per
    query (sparse buckets) — by design; the oracle replicates the same
    bucketing so results hash-match.

    Scale shape: the bucketed self-join's fan-out is bounded by
    |Q| × N_TABLES × BUCKET_CAP; the base scan is touched once for
    signatures and once (id-equi-join) to fetch candidate vectors."""
    base = _with_norm(embeddings)
    buckets = _bucketed(base)
    capped = buckets.withColumn(
        "bucket_rank",
        F.row_number().over(
            Window.partitionBy("table", "sig").orderBy("vec_id")
        ),
    ).filter(F.col("bucket_rank") <= BUCKET_CAP)
    qb = buckets.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "table", "sig"
    )
    cand = (
        capped.join(
            F.broadcast(qb),
            ["table", "sig"],
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    pairs = (
        cand.join(base.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .join(F.broadcast(q), "query_id")
    )
    cos = _cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm"))
    ranked = pairs.select(
        "query_id", "neighbor_id", cos.alias("cosine")
    ).withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
        ),
    )
    # session-shared: |Q| x k rows of model-audit output, rebuilt
    # canonically-identically by ann_recall_report — whichever materializes
    # first, the other hits the cache (see cache.persisted_shared)
    from flink_cep_task_spark.operators.cache import persisted_shared

    return persisted_shared(
        ranked.filter(F.col("rnk") <= TOP_K).select(
            "query_id", "neighbor_id", "cosine", "rnk"
        ),
        src=base,
    )


def _ann_sql() -> str:
    values = ", ".join(
        f"({p}, {i + 1}, {PLANES[p][i]})" for p in range(N_PLANES) for i in range(DIM)
    )
    return f"""
WITH {_FLAT_CTE},
w(p, i, wt) AS (VALUES {values}),
sigbits AS (
  SELECT f.vec_id, w.p // {BITS_PER_TABLE} AS tbl, w.p,
         CASE WHEN sum(f.v * w.wt) > 0 THEN '1' ELSE '0' END AS bit
  FROM flat f JOIN w ON w.i = f.i
  GROUP BY f.vec_id, w.p
),
sigs AS (
  SELECT vec_id, tbl, string_agg(bit, '' ORDER BY p) AS sig
  FROM sigbits GROUP BY vec_id, tbl
),
capped AS (
  SELECT vec_id, tbl, sig FROM (
    SELECT *, row_number() OVER (PARTITION BY tbl, sig ORDER BY vec_id) AS brk
    FROM sigs
  ) WHERE brk <= {BUCKET_CAP}
),
{_NORMS_CTE},
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, d.vec_id AS neighbor_id
  FROM sigs q JOIN capped d ON q.tbl = d.tbl AND q.sig = d.sig AND d.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
dots AS (
  SELECT c.query_id, c.neighbor_id, CAST(sum(a.v * b.v) AS DOUBLE) / {SCALE2!r} AS dt
  FROM cand c
  JOIN flat a ON a.vec_id = c.query_id
  JOIN flat b ON b.vec_id = c.neighbor_id AND b.i = a.i
  GROUP BY c.query_id, c.neighbor_id
),
cos AS (
  SELECT query_id, neighbor_id, round(dt / (na.nrm * nb.nrm), 6) AS cosine
  FROM dots
  JOIN norms na ON na.vec_id = query_id
  JOIN norms nb ON nb.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk
  FROM cos
) WHERE rnk <= {TOP_K}
"""


ANN_LSH_SQL = _ann_sql()


# --- embedding-cosine near-duplicate pairs --------------------------------

# the synthetic embeddings are near-orthogonal random vectors (max pair
# cosine ≈ 0.42 at sf0.01), so the demonstration threshold is 0.3 to keep
# the result non-trivial; a production near-dup pass would use 0.9+ — the
# plan is threshold-independent.
COSINE_DUP_TAU = 0.3


def dedup_embedding_cosine(embeddings: DataFrame) -> DataFrame:
    """Near-duplicate VECTOR pairs: cosine ≥ COSINE_DUP_TAU (demonstration
    threshold 0.3 — the synthetic vectors are near-orthogonal; a production
    near-dup pass would use 0.9+, same plan), candidates restricted to
    pairs colliding in ≥1 LSH table (same multi-table bucketing + per-
    bucket cap as ann_lsh — truly similar vectors collide with high
    probability, and the self-join is bounded per bucket instead of N²).
    The embedding analog of dedup_minhash_lsh: bucket, verify exactly,
    emit (vec_a, vec_b, cosine)."""
    base = _with_norm(embeddings)
    buckets = _bucketed(base)
    capped = buckets.withColumn(
        "bucket_rank",
        F.row_number().over(Window.partitionBy("table", "sig").orderBy("vec_id")),
    ).filter(F.col("bucket_rank") <= BUCKET_CAP)
    a, b = capped.alias("a"), capped.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    pairs = (
        cand.join(
            base.select(
                F.col("vec_id").alias("vec_a"),
                F.col("v").alias("va"),
                F.col("nrm").alias("na"),
            ),
            "vec_a",
        )
        .join(
            base.select(
                F.col("vec_id").alias("vec_b"),
                F.col("v").alias("vb"),
                F.col("nrm").alias("nb"),
            ),
            "vec_b",
        )
    )
    cos = _cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= COSINE_DUP_TAU)
        .select("vec_a", "vec_b", "cosine")
    )


def _cosine_dup_sql() -> str:
    values = ", ".join(
        f"({p}, {i + 1}, {PLANES[p][i]})" for p in range(N_PLANES) for i in range(DIM)
    )
    return f"""
WITH {_FLAT_CTE},
w(p, i, wt) AS (VALUES {values}),
sigbits AS (
  SELECT f.vec_id, w.p // {BITS_PER_TABLE} AS tbl, w.p,
         CASE WHEN sum(f.v * w.wt) > 0 THEN '1' ELSE '0' END AS bit
  FROM flat f JOIN w ON w.i = f.i
  GROUP BY f.vec_id, w.p
),
sigs AS (
  SELECT vec_id, tbl, string_agg(bit, '' ORDER BY p) AS sig
  FROM sigbits GROUP BY vec_id, tbl
),
capped AS (
  SELECT vec_id, tbl, sig FROM (
    SELECT *, row_number() OVER (PARTITION BY tbl, sig ORDER BY vec_id) AS brk
    FROM sigs
  ) WHERE brk <= {BUCKET_CAP}
),
{_NORMS_CTE},
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM capped a JOIN capped b
    ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id
),
dots AS (
  SELECT c.vec_a, c.vec_b, CAST(sum(fa.v * fb.v) AS DOUBLE) / {SCALE2!r} AS dt
  FROM cand c
  JOIN flat fa ON fa.vec_id = c.vec_a
  JOIN flat fb ON fb.vec_id = c.vec_b AND fb.i = fa.i
  GROUP BY c.vec_a, c.vec_b
)
SELECT vec_a, vec_b, cosine FROM (
  SELECT d.vec_a, d.vec_b, round(d.dt / (na.nrm * nb.nrm), 6) AS cosine
  FROM dots d
  JOIN norms na ON na.vec_id = d.vec_a
  JOIN norms nb ON nb.vec_id = d.vec_b
) WHERE cosine >= {COSINE_DUP_TAU}
"""


COSINE_DUP_SQL = _cosine_dup_sql()


# --- int8 vector quantization ---------------------------------------------

def embedding_quantize(embeddings: DataFrame) -> DataFrame:
    """Per-vector symmetric int8 quantization — the storage/bandwidth
    compression step of a vector pipeline (4×+ smaller than float32, dot
    products stay in integer SIMD range). scale = max |component| in
    micro-units; q_i = floor(v_i·127/scale + 0.5) — the floor(+0.5) form
    sidesteps engine tie-rounding differences, and all inputs are the
    exact integer micro-units, so both engines quantize bit-identically.
    Pure higher-order functions; embarrassingly parallel."""
    base = embeddings.select(
        "vec_id", _vec_int(F.col("embedding")).alias("__v")
    ).withColumn(
        "scale_micro", F.array_max(F.transform(F.col("__v"), lambda x: F.abs(x)))
    )
    q = F.transform(
        F.col("__v"),
        lambda x: F.floor(
            x.cast("double") * 127.0 / F.col("scale_micro").cast("double") + 0.5
        ).cast("int"),
    )
    return base.filter(F.col("scale_micro") > 0).select(
        "vec_id", "scale_micro", q.alias("q")
    )


def embedding_quantize_csv(embeddings: DataFrame) -> DataFrame:
    """Gate projection of embedding_quantize: the int8 array joined to a
    CSV string (array cells aren't row-sortable in the comparator)."""
    out = embedding_quantize(embeddings)
    return out.select(
        "vec_id", "scale_micro", F.array_join(F.col("q"), ",").alias("q_csv")
    )


EMBEDDING_QUANTIZE_SQL = f"""
WITH {_FLAT_CTE},
amax AS (SELECT vec_id, max(abs(v)) AS scale_micro FROM flat GROUP BY vec_id)
SELECT f.vec_id, a.scale_micro,
       array_to_string(
         list(CAST(floor(CAST(f.v AS DOUBLE) * 127.0 / a.scale_micro + 0.5) AS INTEGER)
              ORDER BY f.i), ',') AS q_csv
FROM flat f JOIN amax a USING (vec_id)
WHERE a.scale_micro > 0
GROUP BY f.vec_id, a.scale_micro
"""


# --- per-dimension corpus audit -------------------------------------------

def embedding_dim_stats(embeddings: DataFrame) -> DataFrame:
    """Per-DIMENSION distribution audit over the whole embedding corpus:
    n / mean / std / min / max for each of the DIM coordinates — the
    data-quality report that catches dead dimensions, clipped values, and
    scale drift before vectors enter an index.

    Scale shape: posexplode fans each vector into DIM rows, but partial
    aggregation collapses them map-side to at most DIM rows per task
    BEFORE the exchange — the shuffle moves O(DIM × tasks) rows no matter
    the corpus size, and the final agg is over a fixed 64-key space.
    Determinism: all sums run over the exact micro-unit integers (sum of
    squares in DECIMAL(38,0) — int64 would overflow past ~2^15 rows ×
    2^48 per-term); only the final mean/std division is floating point,
    with the identical operand values and operation order in both
    engines. min/max are reported in exact micro-units."""
    flat = embeddings.select(
        "vec_id", F.posexplode(_vec_int(F.col("embedding"))).alias("i", "v")
    )
    agg = flat.groupBy(F.col("i").cast("long").alias("dim")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("__s"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).alias("__ss"),
        F.min("v").alias("min_micro"),
        F.max("v").alias("max_micro"),
    )
    s_d = F.col("__s").cast("double")
    ss_d = F.col("__ss").cast("double")
    n = F.col("n")
    m = s_d / n
    return agg.select(
        "dim",
        "n",
        F.round(s_d / n / F.lit(1000000.0), 6).alias("mean"),
        F.round(
            F.sqrt(F.greatest(ss_d / n - m * m, F.lit(0.0))) / F.lit(1000000.0), 6
        ).alias("std"),
        "min_micro",
        "max_micro",
    )


EMBEDDING_DIM_STATS_SQL = f"""
WITH {_FLAT_CTE}
SELECT CAST(i - 1 AS BIGINT) AS dim,
       count(*) AS n,
       round(CAST(sum(v) AS DOUBLE) / count(*) / 1000000.0, 6) AS mean,
       round(sqrt(greatest(
               CAST(sum(v * v) AS DOUBLE) / count(*)
               - (CAST(sum(v) AS DOUBLE) / count(*))
                 * (CAST(sum(v) AS DOUBLE) / count(*)), 0))
             / 1000000.0, 6) AS std,
       min(v) AS min_micro,
       max(v) AS max_micro
FROM flat
GROUP BY i
"""


# --- IVF (inverted-file) ANN ---------------------------------------------

IVF_CENTROID_IDS = list(range(10, 26))  # 16 k-means SEEDS (fixed vec_ids,
                                        # disjoint from the query set <10)
IVF_NPROBE = 4
IVF_KMEANS_ITERS = 2   # Lloyd refinement passes over the seeds
IVF_FIT_SAMPLE_MOD = 2  # fit on vec_id % MOD == 0 — a deterministic sample:
                        # at corpus scale the fit must not scan everything,
                        # and the modulus predicate is mirrorable in SQL
                        # (production would hash-sample; same plan shape)


def _assign_cells(base: DataFrame, cents: list[tuple[int, list[int]]], k: int) -> DataFrame:
    """(vec_id, cell [, rank]) — nearest-k centroids per vector by maximum
    integer dot product (all vectors share unit-ish scale in the fixture;
    a production IVF uses L2 after normalization — same plan shape).
    Vectorized: ONE numpy matmul per Arrow batch against the (tiny,
    driver-collected) centroid matrix — centroids are model parameters
    exactly like the LSH planes, just learned from the data."""
    cent_ids = [c[0] for c in cents]
    cent_mat = np.array([c[1] for c in cents], dtype=np.int64).T  # (DIM, C)

    @F.pandas_udf("array<int>")
    def nearest(vs: pd.Series) -> pd.Series:
        m = np.array(vs.tolist(), dtype=np.int64)      # (B, DIM)
        dots = m @ cent_mat                            # (B, C)
        # top-k by (dot DESC, centroid id ASC) — fully tie-broken
        order = np.lexsort((np.array(cent_ids)[None, :].repeat(len(m), 0), -dots), axis=1)
        return pd.Series([[int(cent_ids[j]) for j in row[:k]] for row in order])

    return base.select("vec_id", F.posexplode(nearest(F.col("v"))).alias("rank", "cell"))


# The k-means fit is a pure function of (input parquet files, constants):
# ann_ivf, ivf_cell_report and ann_recall_report all need the SAME fit, and
# without memoization each re-runs the full iterative job (~3×3.5 s at
# sf0.1 measured in round 3). The fitted centroids are model parameters
# (≤ K×DIM ints) — exactly the kind of thing a session should cache, like
# the LSH plane literals. Keyed on df.inputFiles() so different sf_dirs
# (tests at sf0.001, bench at sf0.1) never collide within one process.
_FIT_CACHE: dict[tuple, list[tuple[int, list[int]]]] = {}


def _fit_centroids(
    base: DataFrame, n_iters: int = IVF_KMEANS_ITERS, key_extra: str = ""
) -> list[tuple[int, list[int]]]:
    """Deterministic distributed k-means (Lloyd) over the micro-unit
    integer vectors, bit-identical in Spark and DuckDB:

      * seeds = the IVF_CENTROID_IDS sample vectors (deterministic start);
      * assignment = argmax integer dot product, centroid-id tie-break —
        exact int64 arithmetic in both engines;
      * update = per-component floor(sum / count), computed as
        floor(double(sum)/count) on BOTH sides: |sum| < 2^53 so the
        division is exact to well under the 1/count gap to the nearest
        integer, and the floored centroids are integers again, keeping
        every later dot product exact;
      * empty cells drop out of the fit (both engines lose the GROUP BY
        row).

    Each iteration is one matmul-assignment pass + one component-sum
    aggregation; the only driver-side data is the ≤ K×DIM centroid matrix
    itself — model parameters, exactly like the LSH plane literals. The
    caller should pass a PERSISTED base: the per-iteration collects
    materialize it once per pass otherwise."""
    import math

    # persist() hides the file scan from inputFiles(); cache.persisted
    # stashes the pre-persist provenance on the handle for exactly this key.
    files = getattr(base, "_graft_input_files", None) or tuple(
        sorted(base.inputFiles())
    )
    # key_extra disambiguates fits over FILTERED views of the same files
    # (e.g. the corpus-only fit of the incremental index) — a plain
    # filter does not change inputFiles(), so without it the memo would
    # alias two different fits
    key = (files, n_iters, key_extra)
    if files and key in _FIT_CACHE:
        return [(cid, list(v)) for cid, v in _FIT_CACHE[key]]

    cents = sorted(
        (r["vec_id"], r["v"])
        for r in base.filter(F.col("vec_id").isin(IVF_CENTROID_IDS))
        .select("vec_id", "v")
        .collect()
    )
    sample = base.filter(F.col("vec_id") % IVF_FIT_SAMPLE_MOD == 0)
    comp = sample.select("vec_id", F.posexplode("v").alias("i", "comp"))
    for _ in range(n_iters):
        assigned = _assign_cells(sample, cents, 1).filter(F.col("rank") == 0).drop("rank")
        agg = (
            assigned.join(comp, "vec_id")
            .groupBy("cell", "i")
            .agg(F.sum("comp").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()
        )
        fitted: dict[int, list[int]] = {}
        for r in agg:
            fitted.setdefault(r["cell"], [0] * DIM)[r["i"]] = math.floor(r["s"] / r["c"])
        cents = sorted(fitted.items())
    if files:
        _FIT_CACHE[key] = [(cid, list(v)) for cid, v in cents]
    return cents


def ann_ivf(embeddings: DataFrame) -> DataFrame:
    """IVF ANN: coarse-quantize every vector to its nearest centroid cell
    (inverted file), probe the query's IVF_NPROBE nearest cells, exact
    cosine + top-5 on the probed candidates only. Centroids are a
    deterministic k-means fit (_fit_centroids) so cells stay data-balanced
    under skew; the DuckDB oracle replays the identical fit in SQL.

    Scale shape: the cell assignment is one matmul per batch; the
    candidate join is an equi-join on cell id whose fan-out is |Q| ×
    nprobe × cell size."""
    from flink_cep_task_spark.operators.cache import persisted

    # persisted: the fit's per-iteration collects and the final
    # inverted-file/probe/verify branches all reuse the normalized vectors
    base = persisted(_with_norm(embeddings))
    cents = _fit_centroids(base)
    # data side: each vector lives in exactly its nearest cell (rank 0)
    inv_file = _assign_cells(base, cents, 1).filter(F.col("rank") == 0).drop("rank")
    # query side: probe the nprobe nearest cells
    probes = (
        _assign_cells(base.filter(F.col("vec_id") < N_QUERIES), cents, IVF_NPROBE)
        .drop("rank")
        .withColumnRenamed("vec_id", "query_id")
    )
    cand = (
        inv_file.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    pairs = (
        cand.join(base.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .join(F.broadcast(q), "query_id")
    )
    cos = _cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm"))
    ranked = pairs.select(
        "query_id", "neighbor_id", cos.alias("cosine")
    ).withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
        ),
    )
    # session-shared: |Q| x k rows of model-audit output, rebuilt
    # canonically-identically by ann_recall_report — whichever materializes
    # first, the other hits the cache (see cache.persisted_shared)
    from flink_cep_task_spark.operators.cache import persisted_shared

    return persisted_shared(
        ranked.filter(F.col("rnk") <= TOP_K).select(
            "query_id", "neighbor_id", "cosine", "rnk"
        ),
        src=base,
    )


def _ivf_common_ctes(fit_where: str = "") -> tuple[str, str]:
    """Shared oracle prefix for every IVF-derived query: the deterministic
    k-means fit (Lloyd iterations unrolled as CTE pairs — the oracle
    derives the fitted centroids from the data exactly like the engine),
    the full-corpus dots against the fitted centroids, and the inverted
    file. Returns (ctes, final_centroid_cte_name). fit_where restricts
    the FIT (seeds + Lloyd sample) only — assignment still covers every
    vector — which is how the incremental index's corpus-only fit is
    replayed."""
    ids = ", ".join(str(i) for i in IVF_CENTROID_IDS)
    extra = f" AND ({fit_where})" if fit_where else ""
    lloyd = [
        "sflat AS (SELECT * FROM flat "
        f"WHERE vec_id % {IVF_FIT_SAMPLE_MOD} = 0{extra})",
        "c0 AS (SELECT vec_id AS cid, i, v AS cv FROM flat "
        f"WHERE vec_id IN ({ids}){extra})",
    ]
    for it in range(IVF_KMEANS_ITERS):
        lloyd.append(f"""d{it} AS (
  SELECT f.vec_id, c.cid, sum(f.v * c.cv) AS dt
  FROM sflat f JOIN c{it} c USING (i)
  GROUP BY f.vec_id, c.cid
)""")
        lloyd.append(f"""a{it} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dt DESC, cid) AS rnk
    FROM d{it}
  ) WHERE rnk = 1
)""")
        lloyd.append(f"""c{it + 1} AS (
  SELECT a.cid, f.i,
         CAST(floor(CAST(sum(f.v) AS DOUBLE) / count(*)) AS BIGINT) AS cv
  FROM a{it} a JOIN sflat f USING (vec_id)
  GROUP BY a.cid, f.i
)""")
    lloyd_ctes = ",\n".join(lloyd)
    cfin = f"c{IVF_KMEANS_ITERS}"
    ctes = f"""{_FLAT_CTE},
{lloyd_ctes},
dots AS (
  SELECT f.vec_id, c.cid, sum(f.v * c.cv) AS dt
  FROM flat f JOIN {cfin} c USING (i)
  GROUP BY f.vec_id, c.cid
),
ranked_cells AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY dt DESC, cid) AS rnk
  FROM dots
),
inv_file AS (SELECT vec_id, cid AS cell FROM ranked_cells WHERE rnk = 1)"""
    return ctes, cfin


def _ivf_sql(fit_where: str = "", neighbor_where: str = "TRUE") -> str:
    """Mirrors ann_ivf: shared fit/inverted-file prefix + probe/verify.
    With fit_where, mirrors ann_ivf_stored instead (corpus-only fit,
    assignment unchanged). neighbor_where restricts which vectors may be
    NEIGHBORS (the rolling day-1 universe excludes the not-yet-crawled
    day-2 batch); queries and the fit are unaffected."""
    ctes, _cfin = _ivf_common_ctes(fit_where)
    return f"""
WITH {ctes},
probes AS (
  SELECT vec_id AS query_id, cid AS cell FROM ranked_cells
  WHERE rnk <= {IVF_NPROBE} AND vec_id < {N_QUERIES}
),
cand AS (
  SELECT DISTINCT p.query_id, f.vec_id AS neighbor_id
  FROM inv_file f JOIN probes p USING (cell)
  WHERE f.vec_id <> p.query_id AND ({neighbor_where})
),
{_NORMS_CTE},
pair_dots AS (
  SELECT c.query_id, c.neighbor_id, CAST(sum(a.v * b.v) AS DOUBLE) / {SCALE2!r} AS dt
  FROM cand c
  JOIN flat a ON a.vec_id = c.query_id
  JOIN flat b ON b.vec_id = c.neighbor_id AND b.i = a.i
  GROUP BY c.query_id, c.neighbor_id
),
cos AS (
  SELECT query_id, neighbor_id, round(dt / (na.nrm * nb.nrm), 6) AS cosine
  FROM pair_dots
  JOIN norms na ON na.vec_id = query_id
  JOIN norms nb ON nb.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk
  FROM cos
) WHERE rnk <= {TOP_K}
"""


ANN_IVF_SQL = _ivf_sql()


# --- incremental IVF index maintenance -------------------------------------

# embeddings with this label are "today's batch"; everything else is the
# corpus the stored index covers. A plain equality predicate so the
# incoming scan's filter pushes to parquet, like the dedup stores' source
# split.
IVF_INCOMING_LABEL = 9

# the rolling (day-over-day) loop's first batch: label 8 plays
# "yesterday's crawl", label 9 stays "today's"
IVF_ROLLING_DAY1_LABEL = 8

# the 3-day rolling cadence (VERDICT r11 task #3): label 7 is the
# earliest day, 9 the latest — the day-3 probe's index state is
# reachable only through two consecutive inverted-file admissions
IVF_ROLLING_DAYS = (7, IVF_ROLLING_DAY1_LABEL, IVF_INCOMING_LABEL)


def write_ivf_index_store(
    embeddings: DataFrame,
    path: str,
    exclude_labels: tuple = (IVF_INCOMING_LABEL,),
) -> None:
    """Persist the IVF index a daily ANN pipeline maintains — the ANN
    analog of the MinHash/winnowing signature stores: the k-means
    centroids fitted on the CORPUS ONLY (label != IVF_INCOMING_LABEL;
    seeds inside the incoming batch drop out of the fit exactly as the
    oracle's fit predicate drops them) plus the corpus inverted file
    (vec_id -> nearest cell), partitioned by cell. A daily run then
    assigns only the incoming batch against the stored centroids — one
    matmul over |batch| rows — instead of re-scoring (or re-fitting
    over) the corpus. Centroids are integer vectors, so the parquet
    round trip is exact and every later dot product stays exact."""
    from flink_cep_task_spark.operators.cache import persisted

    # null-safe split: a NULL label is CORPUS (the complement of the
    # incoming batches), so every vector lands in exactly one side of the
    # index — a plain != would drop NULL-label rows from BOTH sides and
    # diverge from the oracle, whose inverted file assigns every vector
    pred = F.lit(False)
    for lbl in exclude_labels:
        pred = pred | F.col("label").eqNullSafe(lbl)
    corpus = persisted(_with_norm(embeddings.filter(~pred)))
    cents = _fit_centroids(
        corpus, key_extra="ivf_corpus_fit_" + "_".join(map(str, exclude_labels))
    )
    import pyarrow as pa

    from flink_cep_task_spark.sources.sink import write_model_parquet

    # bounded model parameters: direct pyarrow write (a 15-row
    # createDataFrame().write costs ~5 s of Spark job overhead — see
    # write_model_parquet)
    write_model_parquet(
        f"{path}/centroids",
        pa.table(
            {
                "cid": pa.array([int(cid) for cid, _v in cents], pa.int64()),
                "cv": pa.array(
                    [[int(x) for x in v] for _cid, v in cents],
                    pa.list_(pa.int64()),
                ),
            }
        ),
    )
    # `batch` sub-partitions the inverted file by ADMISSION: the corpus
    # build owns batch=base, each daily admission owns its own value, so
    # a dynamic-overwrite re-admission rewrites only its own directories
    inv = (
        _assign_cells(corpus, cents, 1)
        .filter(F.col("rank") == 0)
        .drop("rank")
        .withColumn("batch", F.lit("base"))
        # REBALANCE before the two-level partitioned write (guide §6):
        # without it each upstream task writes a sliver into every
        # (cell, batch) directory; AQE coalesces to advisory-size files
        # and would split an oversized cell at scale
        .hint("rebalance", "cell", "batch")
    )
    inv.write.partitionBy("cell", "batch").mode("overwrite").parquet(
        f"{path}/inv_file"
    )


def _read_centroids(spark, store_path: str) -> list[tuple[int, list[int]]]:
    """Deserialize the stored centroid model — the ONE reader shared by
    every store probe and the admission job, so an index-layout change
    can never make admission-time and probe-time cell assignment drift."""
    return sorted(
        (r["cid"], list(r["cv"]))
        for r in spark.read.parquet(f"{store_path}/centroids").collect()
    )


def append_ivf_assignments(
    embeddings: DataFrame, store_path: str, label, batch: str
) -> None:
    """The ADMISSION job for the IVF index store — the ANN analog of
    append_minhash_signatures: assign ONLY the arriving batch (one
    bounded matmul against the STORED centroids; the corpus is never
    re-scored, the centroids never refitted) and land the (vec_id, cell)
    rows in the inverted file under the batch's own partition value.
    Dynamic partition overwrite keeps admission idempotent per batch."""
    spark = embeddings.sparkSession
    cents = _read_centroids(spark, store_path)
    incoming = _with_norm(embeddings.filter(F.col("label").eqNullSafe(label)))
    inv = (
        _assign_cells(incoming, cents, 1)
        .filter(F.col("rank") == 0)
        .select("vec_id", "cell")
        .withColumn("batch", F.lit(batch))
        # same guide-§6 file sizing as the base build's inv_file write
        .hint("rebalance", "cell", "batch")
    )
    (
        inv.write.partitionBy("cell", "batch")
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(f"{store_path}/inv_file")
    )


def ann_ivf_stored(
    embeddings: DataFrame,
    store_path: str,
    incoming_label=IVF_INCOMING_LABEL,
    batch_in: tuple | None = None,
) -> DataFrame:
    """Incremental IVF probe: top-5 cosine neighbors per query where the
    index = the STORED corpus inverted file UNIONed with today's batch
    assigned on the fly to the STORED centroids. Result-identical to
    assigning every vector to the corpus-fit centroids from scratch,
    which is what the oracle does in SQL — the store changes the COST,
    never the answer.

    Scale shape: probe-time Python is two bounded matmul passes (the
    incoming batch + the |Q| query vectors); the corpus contributes only
    a (vec_id, cell) FileScan of the index store, and full corpus
    vectors are touched exclusively inside the exact rerank join of the
    bounded candidate set. Only the BOUNDED query slice is persisted
    (two consumers: probe assignment + the rerank's query side); the
    rerank join STREAMS the corpus scan — pinning the whole normalized
    corpus would hold 100 TB in cache to serve a candidate-bounded join
    (VERDICT r8 task #5)."""
    from flink_cep_task_spark.operators.cache import persisted

    spark = embeddings.sparkSession
    cents = _read_centroids(spark, store_path)
    inv_raw = spark.read.parquet(f"{store_path}/inv_file")
    if batch_in is not None:
        # pin WHICH admissions this probe sees (rolling day-1 must read
        # only the corpus partitions regardless of directory-listing
        # time, and stay rerun-safe after its own day has been admitted)
        inv_raw = inv_raw.filter(F.col("batch").isin(*batch_in))
    corpus_inv = inv_raw.select(
        "vec_id", F.col("cell").cast("int").alias("cell")
    )
    queries = persisted(
        _with_norm(embeddings.filter(F.col("vec_id") < N_QUERIES))
    )
    # eqNullSafe: the exact complement of the store's corpus predicate
    incoming = _with_norm(
        embeddings.filter(F.col("label").eqNullSafe(incoming_label))
    )
    inc_inv = (
        _assign_cells(incoming, cents, 1)
        .filter(F.col("rank") == 0)
        .select("vec_id", "cell")
    )
    inv_all = corpus_inv.unionByName(inc_inv)
    probes = (
        _assign_cells(queries, cents, IVF_NPROBE)
        .drop("rank")
        .withColumnRenamed("vec_id", "query_id")
    )
    cand = (
        inv_all.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    pairs = (
        cand.join(
            _with_norm(embeddings).withColumnRenamed("vec_id", "neighbor_id"),
            "neighbor_id",
        )
        .join(F.broadcast(q), "query_id")
    )
    cos = _cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm"))
    ranked = pairs.select(
        "query_id", "neighbor_id", cos.alias("cosine")
    ).withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("cosine").desc(), F.col("neighbor_id")
            )
        ),
    )
    return ranked.filter(F.col("rnk") <= TOP_K).select(
        "query_id", "neighbor_id", "cosine", "rnk"
    )


ANN_IVF_STORED_SQL = _ivf_sql(
    fit_where=(
        "vec_id IN (SELECT vec_id FROM embeddings "
        f"WHERE label IS DISTINCT FROM {IVF_INCOMING_LABEL})"
    )
)


def ann_ivf_rolling(
    spark,
    embeddings: DataFrame,
    store_path: str,
    days: tuple = IVF_ROLLING_DAYS,
) -> DataFrame:
    """Day-over-day IVF index maintenance — the ANN edition of the
    signature-store maintenance loop (VERDICT r8 task #1), at the
    shared 3-day cadence (VERDICT r11 task #3):

      day i: top-5 probe with inv = the STORED inverted file pinned to
             the partitions admitted BEFORE day i (batch=base ∪
             d1..d{i-1}) ∪ the day-i batch assigned on the fly, then
             ADMIT the day-i (vec_id, cell) rows
             (append_ivf_assignments — idempotent dynamic overwrite of
             the batch=d{i} partitions; centroids never refitted).

    Day-i vectors are assigned through Python exactly once (their own
    probe); every later day sees their cells as store FileScan rows.
    Each probe's batch_in pin makes it rerun-safe after any number of
    later admissions. Oracle = the from-scratch IVF replay per day
    (fit excludes every rolling day, exactly the store build's corpus;
    day i's neighbor universe excludes the not-yet-crawled days
    i+1..N)."""
    parts = []
    batches = ["base"]
    for i, day in enumerate(days):
        r = ann_ivf_stored(
            embeddings, store_path, incoming_label=day,
            batch_in=tuple(batches),
        )
        parts.append(r)
        append_ivf_assignments(embeddings, store_path, day, f"d{i + 1}")
        batches.append(f"d{i + 1}")
    from flink_cep_task_spark.functions.rolling import day_union

    return day_union(parts)


def _ann_ivf_rolling_sql(days: tuple = IVF_ROLLING_DAYS) -> str:
    from flink_cep_task_spark.functions.rolling import day_union_sql

    fit = "vec_id IN (SELECT vec_id FROM embeddings WHERE " + " AND ".join(
        f"label IS DISTINCT FROM {d}" for d in days
    ) + ")"
    blocks = []
    for i in range(len(days)):
        future = days[i + 1:]
        if future:
            excl = " OR ".join(
                f"label IS NOT DISTINCT FROM {d}" for d in future
            )
            blocks.append(
                _ivf_sql(
                    fit_where=fit,
                    neighbor_where=(
                        "f.vec_id NOT IN (SELECT vec_id FROM embeddings "
                        f"WHERE {excl})"
                    ),
                )
            )
        else:
            blocks.append(_ivf_sql(fit_where=fit))
    return day_union_sql(blocks)


ANN_IVF_ROLLING_SQL = _ann_ivf_rolling_sql()


# --- cluster-scoped semantic dedup (SemDeDup) ------------------------------

# the synthetic vectors are near-orthogonal (max pair cosine ≈ 0.42), so
# the demonstration threshold sits low to keep the result non-trivial; a
# production pass on real embeddings uses 0.95+ — threshold-independent plan.
SEMDEDUP_TAU = 0.3
SEMDEDUP_ANCHORS = 256  # per-cell comparison anchors (earliest vec_ids)


def semantic_dedup(embeddings: DataFrame) -> DataFrame:
    """Cluster-scoped semantic dedup (the SemDeDup recipe, Abbas et al.
    2023): k-means-cluster the embedding space (same deterministic fit as
    ann_ivf), then mark a vector as a semantic duplicate iff its cosine to
    an EARLIER-id member of its own cell reaches SEMDEDUP_TAU; the
    earliest such member is reported as dup_of. Pairs are only ever formed
    WITHIN a cell, so the corpus-level N² never materializes — the fit's
    cell count is chosen so cells stay small, and the comparison side is
    additionally capped to each cell's SEMDEDUP_ANCHORS earliest members,
    which bounds per-cell work to anchors × |cell| even if a cell
    degenerates (capping anchors, not members, keeps every vector
    *checked*; only the candidate-canonical set is truncated). No
    reference analog (pure streaming engine) — training-pipeline
    extension; the oracle replays the identical fit in SQL."""
    from flink_cep_task_spark.operators.cache import persisted

    base = persisted(_with_norm(embeddings))
    cents = _fit_centroids(base)
    cells = _assign_cells(base, cents, 1).filter(F.col("rank") == 0).drop("rank")
    members = cells.join(base, "vec_id")

    # Screen-then-verify (the same two-phase shape as the LSH/PPJoin dedup
    # paths): a naive anchors×members join materializes every within-cell
    # pair row carrying TWO 64-long arrays (~1 KB/pair — hundreds of MB
    # through the exchange at even 2k vectors, measured 4.5 s). Instead the
    # cell's vectors shuffle ONCE (N rows × 64 longs) into a per-cell
    # numpy screen: one exact-int64 matmul per cell, emitting only id
    # pairs whose unrounded cosine clears tau - 1e-5 (margin strictly
    # covers the 0.5e-6 round-up plus float association noise, so the
    # candidate set is a superset of the final answer). The exact Catalyst
    # cosine — bit-identical to the oracle's — then decides tau on that
    # small candidate set only.
    def _screen(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        m = np.array(pdf["v"].tolist(), dtype=np.int64)
        nrm = pdf["nrm"].to_numpy()
        a_cnt = min(len(pdf), SEMDEDUP_ANCHORS)
        cos = (m[:a_cnt] @ m.T) / SCALE2 / np.outer(nrm[:a_cnt], nrm)
        ai, vi = np.nonzero(cos >= SEMDEDUP_TAU - 1e-5)
        ids = pdf["vec_id"].to_numpy()
        a_ids, v_ids = ids[ai], ids[vi]
        keep = a_ids < v_ids
        return pd.DataFrame({"anchor_id": a_ids[keep], "vec_id": v_ids[keep]})

    cand = members.groupBy("cell").applyInPandas(_screen, "anchor_id long, vec_id long")
    sim = (
        cand.join(
            base.select(
                F.col("vec_id").alias("anchor_id"),
                F.col("v").alias("av"),
                F.col("nrm").alias("an"),
            ),
            "anchor_id",
        )
        .join(base, "vec_id")
        .withColumn(
            "cosine", _cosine(F.col("av"), F.col("v"), F.col("an"), F.col("nrm"))
        )
        .filter(F.col("cosine") >= SEMDEDUP_TAU)
    )
    dups = sim.groupBy("vec_id").agg(F.min("anchor_id").alias("dup_of"))
    return (
        cells.join(dups, "vec_id", "left")
        .select(
            "vec_id",
            F.col("cell").cast("long").alias("cell"),
            F.coalesce(F.col("dup_of"), F.lit(-1)).cast("long").alias("dup_of"),
            F.col("dup_of").isNotNull().alias("is_semantic_dup"),
        )
    )


def _semantic_dedup_sql() -> str:
    ctes, _cfin = _ivf_common_ctes()
    return f"""
WITH {ctes},
{_NORMS_CTE},
anchors AS (
  SELECT cell, vec_id AS anchor_id FROM (
    SELECT cell, vec_id,
           row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS arnk
    FROM inv_file
  ) WHERE arnk <= {SEMDEDUP_ANCHORS}
),
pairs AS (
  SELECT a.anchor_id, m.vec_id
  FROM inv_file m JOIN anchors a
    ON a.cell = m.cell AND a.anchor_id < m.vec_id
),
pdots AS (
  SELECT p.anchor_id, p.vec_id, CAST(sum(fa.v * fb.v) AS DOUBLE) / {SCALE2!r} AS dt
  FROM pairs p
  JOIN flat fa ON fa.vec_id = p.anchor_id
  JOIN flat fb ON fb.vec_id = p.vec_id AND fb.i = fa.i
  GROUP BY p.anchor_id, p.vec_id
),
dups AS (
  SELECT pdots.vec_id AS vec_id, min(pdots.anchor_id) AS dup_of
  FROM pdots
  JOIN norms na ON na.vec_id = pdots.anchor_id
  JOIN norms nb ON nb.vec_id = pdots.vec_id
  WHERE round(dt / (na.nrm * nb.nrm), 6) >= {SEMDEDUP_TAU}
  GROUP BY pdots.vec_id
)
SELECT f.vec_id, f.cell,
       coalesce(d.dup_of, -1) AS dup_of,
       d.dup_of IS NOT NULL AS is_semantic_dup
FROM inv_file f LEFT JOIN dups d USING (vec_id)
"""


SEMANTIC_DEDUP_SQL = _semantic_dedup_sql()


# --- ANN quality audit -----------------------------------------------------

def _recall_against_exact(exact: DataFrame, approx: DataFrame, method: str) -> DataFrame:
    a = approx.select("query_id", F.col("neighbor_id").alias("__ann_n"))
    hit = exact.join(
        F.broadcast(a),
        (exact.query_id == a.query_id) & (F.col("neighbor_id") == F.col("__ann_n")),
        "left",
    ).select(
        exact.query_id.alias("query_id"),
        F.col("__ann_n").isNotNull().cast("int").alias("h"),
    )
    # denominator = n_exact (the per-query count of exact neighbors), not
    # the constant TOP_K: if exact kNN emits fewer than TOP_K neighbors
    # for a query, a perfect index should still reach recall 1.0.
    return hit.groupBy("query_id").agg(
        F.lit(method).alias("method"),
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum("h").cast("long").alias("n_hit"),
        F.round(
            F.sum("h").cast("double") / F.count(F.lit(1)), 6
        ).alias("recall_at_k"),
    )


def ann_recall_report(embeddings: DataFrame) -> DataFrame:
    """Recall@k of BOTH approximate indexes (LSH, IVF) against the exact
    brute-force top-k — the audit an ANN deployment runs before trusting
    its index parameters. One row per (query, method): exact-neighbor
    count, hits found, recall against TOP_K.

    On THIS corpus the report (correctly) shows near-zero LSH recall and
    partial IVF recall: the synthetic embeddings are near-uniform unit
    vectors — the genuine worst case for sign-random-projection LSH (top
    neighbors sit at ~68°, so a 12-bit table collides with p≈0.62¹²≈0.003)
    — and that is precisely what this audit exists to catch before an
    index ships. On clustered real-world embeddings the same parameters
    recall well; the production levers are bits-per-table (vs corpus
    size), table count, and multiprobe.

    Plan: the per-method reports join operator outputs on (query_id,
    neighbor_id) — both sides are |Q|×k rows, so the joins and folds are
    trivial at any corpus size; the cost is the underlying index scans,
    each already scale-shaped (broadcast query side / bounded fan-out)."""
    exact = knn_bruteforce(embeddings).select("query_id", "neighbor_id")
    return _recall_against_exact(exact, ann_lsh(embeddings), "lsh").unionAll(
        _recall_against_exact(exact, ann_ivf(embeddings), "ivf")
    )


def _recall_sql(approx_sql: str, method: str) -> str:
    return f"""
SELECT e.query_id, '{method}' AS method,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       round(CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS recall_at_k
FROM ({KNN_SQL.strip()}) e
LEFT JOIN ({approx_sql.strip()}) a
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


ANN_RECALL_SQL = (
    _recall_sql(ANN_LSH_SQL, "lsh")
    + "\nUNION ALL\n"
    + _recall_sql(ANN_IVF_SQL, "ivf")
)


# --- IVF index diagnostics -------------------------------------------------

def ivf_cell_report(embeddings: DataFrame) -> DataFrame:
    """Inverted-file diagnostics: per fitted cell, member count and mean
    cosine of members to their centroid — the balance + quantization-error
    audit run after (re)fitting an IVF index (a fat or incoherent cell
    means the probe join scans garbage). Complements tests/test_ivf.py's
    balance assertions with a user-facing report.

    Per-member cosine is rounded to DECIMAL(9,6) BEFORE the per-cell sum,
    so the mean is exact and order-independent across partitionings —
    the same trick as corpus_quality_report. Scale shape: one matmul
    assignment pass + one aggregate; centroids stay driver-side model
    parameters."""
    import math as _math

    from flink_cep_task_spark.operators.cache import persisted

    base = persisted(_with_norm(embeddings))
    cents = _fit_centroids(base)
    rows = [
        (cid, cv, _math.sqrt(sum(x * x for x in cv) / SCALE2)) for cid, cv in cents
    ]
    cent_df = embeddings.sparkSession.createDataFrame(
        rows, "cell INT, cv ARRAY<BIGINT>, cn DOUBLE"
    )
    assigned = _assign_cells(base, cents, 1).filter(F.col("rank") == 0).drop("rank")
    mem = (
        assigned.join(base, "vec_id")
        .join(F.broadcast(cent_df), "cell")
        .select(
            "cell",
            F.round(
                (_idot(F.col("v"), F.col("cv")).cast("double") / F.lit(SCALE2))
                / (F.col("nrm") * F.col("cn")),
                6,
            )
            .cast("decimal(9,6)")
            .alias("cosv"),
        )
    )
    return mem.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.round(F.sum("cosv").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_cos_to_centroid"
        ),
    )


def _ivf_cell_report_sql() -> str:
    ctes, cfin = _ivf_common_ctes()
    return f"""
WITH {ctes},
{_NORMS_CTE},
cnorms AS (
  SELECT cid, sqrt(CAST(sum(cv * cv) AS DOUBLE) / {SCALE2!r}) AS cn
  FROM {cfin} GROUP BY cid
),
mem AS (
  SELECT i.cell,
         CAST(round((CAST(d.dt AS DOUBLE) / {SCALE2!r}) / (n.nrm * c.cn), 6)
              AS DECIMAL(9,6)) AS cosv
  FROM inv_file i
  JOIN dots d ON d.vec_id = i.vec_id AND d.cid = i.cell
  JOIN norms n ON n.vec_id = i.vec_id
  JOIN cnorms c ON c.cid = i.cell
)
SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors,
       round(CAST(sum(cosv) AS DOUBLE) / count(*), 6) AS avg_cos_to_centroid
FROM mem GROUP BY cell
"""


IVF_CELL_REPORT_SQL = _ivf_cell_report_sql()


# --- cluster-balanced sampling --------------------------------------------

CLUSTER_SAMPLE_K = 20


def cluster_balanced_sample(embeddings: DataFrame, k: int = CLUSTER_SAMPLE_K) -> DataFrame:
    """Curation sampling that preserves semantic coverage: keep (up to) k
    vectors per IVF k-means cell, chosen by a salted deterministic hash —
    the cluster-balanced subset used after a SemDeDup-style pass so rare
    semantic regions survive downsampling (a uniform sample would keep
    them in proportion to their mass, i.e. barely). No RNG state: the
    per-cell ranking is a pure function of vec_id, reproducible across
    engines/retries/partitionings like operators/sampling.py. The rank
    window sorts one cell per partition — cells are fit-balanced, so no
    partition degenerates."""
    from flink_cep_task_spark.functions.hashing import h64
    from flink_cep_task_spark.operators.cache import persisted

    base = persisted(_with_norm(embeddings))
    cents = _fit_centroids(base)
    cells = _assign_cells(base, cents, 1).filter(F.col("rank") == 0).drop("rank")
    order = h64(F.concat(F.lit("cbs:"), F.col("vec_id").cast("string")))
    w = Window.partitionBy("cell").orderBy(order, "vec_id")
    return (
        cells.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("vec_id", F.col("cell").cast("long").alias("cell"), "rnk")
    )


def _cluster_balanced_sample_sql() -> str:
    from flink_cep_task_spark.functions.hashing import h64_sql

    ctes, _cfin = _ivf_common_ctes()
    order = h64_sql("'cbs:' || CAST(vec_id AS VARCHAR)")
    return f"""
WITH {ctes}
SELECT vec_id, cell, rnk FROM (
  SELECT vec_id, cell,
         CAST(row_number() OVER (PARTITION BY cell ORDER BY {order}, vec_id) AS INTEGER) AS rnk
  FROM inv_file
) WHERE rnk <= {CLUSTER_SAMPLE_K}
"""


CLUSTER_BALANCED_SAMPLE_SQL = _cluster_balanced_sample_sql()


# --- pairwise dimension correlation audit --------------------------------

CORR_TOP_PAIRS = 20
_CORR_CHUNK = 8192  # int64 Gram safety: |v| ≤ ~1e6 micro-units ⇒ per-term
                    # products ≤ ~1e12, × 8192 rows ≤ ~1e16 « 2^63


def embedding_corr_pairs(embeddings: DataFrame) -> DataFrame:
    """Top-|corr| DIMENSION pairs of the embedding corpus — the
    redundancy/collapse audit run before building an index or training a
    projection: highly-correlated coordinate pairs mean wasted dimensions
    (and a candidate for PCA/whitening), anti-correlated pairs flag
    encoder defects.

    Scale shape: ONE pass over the corpus. mapInPandas accumulates a
    per-chunk integer Gram matrix (numpy int64 matmul over ≤8192-row
    chunks — the DIM×DIM upper triangle plus per-dim sums, ~2k tiny rows
    per chunk) and the exchange moves only those partials: O(DIM² ×
    chunks) rows regardless of corpus size, summed into DECIMAL(38,0)
    (int64 would overflow across a 1e9-vector corpus). The vectors are
    quantized IN-PLAN by _vec_int before reaching Python, so the
    micro-unit rounding is the engine's own decimal cast — the pandas
    side never re-implements it.

    Determinism: every sum is an exact integer in both engines; the
    correlation is computed from those integers with an identical
    double-arithmetic operand order, rounded via the shared
    floor(x·10⁶+0.5)/10⁶ formula (F.round and DuckDB's round disagree
    within one ulp of a half — see operators/windows.round_half_up), and
    ranked with a full deterministic tiebreak (|corr| desc, dim_i,
    dim_j). Zero-variance dimensions are excluded before any sqrt runs,
    identically in both engines."""
    quant = embeddings.select(_vec_int(F.col("embedding")).alias("mv"))

    def gram(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf["mv"].to_numpy()).astype(np.int64)
            for lo in range(0, len(M), _CORR_CHUNK):
                C = M[lo : lo + _CORR_CHUNK]
                G = C.T @ C
                iu, ju = np.triu_indices(G.shape[0])
                s = C.sum(axis=0, dtype=np.int64)
                rows = {
                    "i": np.concatenate((iu, np.arange(len(s)), [-1])),
                    "j": np.concatenate((ju, np.full(len(s), -1), [-1])),
                    "p": np.concatenate((G[iu, ju], s, [len(C)])),
                }
                yield pd.DataFrame(rows)

    parts = quant.mapInPandas(gram, "i INT, j INT, p LONG")
    sums = parts.groupBy("i", "j").agg(
        F.sum(F.col("p").cast("decimal(38,0)")).alias("P")
    )
    n_total = sums.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("P").cast("double").alias("n")
    )
    mom = sums.filter((F.col("j") == -1) & (F.col("i") >= 0)).select(
        F.col("i").alias("d"), F.col("P").cast("double").alias("s")
    )
    diag = sums.filter((F.col("i") == F.col("j")) & (F.col("i") >= 0)).select(
        F.col("i").alias("d"), F.col("P").cast("double").alias("ss")
    )
    dimtab = F.broadcast(mom.join(diag, "d"))
    pairs = sums.filter((F.col("i") >= 0) & (F.col("j") > F.col("i"))).select(
        F.col("i").alias("dim_i"),
        F.col("j").alias("dim_j"),
        F.col("P").cast("double").alias("p"),
    )
    a = dimtab.select(
        F.col("d").alias("dim_i"), F.col("s").alias("sa"), F.col("ss").alias("ssa")
    )
    b = dimtab.select(
        F.col("d").alias("dim_j"), F.col("s").alias("sb"), F.col("ss").alias("ssb")
    )
    j = pairs.join(a, "dim_i").join(b, "dim_j").crossJoin(F.broadcast(n_total))
    var_a = F.col("n") * F.col("ssa") - F.col("sa") * F.col("sa")
    var_b = F.col("n") * F.col("ssb") - F.col("sb") * F.col("sb")
    num = F.col("n") * F.col("p") - F.col("sa") * F.col("sb")
    corr = F.floor(num / F.sqrt(var_a * var_b) * 1e6 + F.lit(0.5)) / 1e6
    ranked = (
        j.filter((var_a > 0) & (var_b > 0))
        .select(
            F.col("dim_i").cast("long").alias("dim_i"),
            F.col("dim_j").cast("long").alias("dim_j"),
            corr.alias("corr"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.abs(F.col("corr")).desc(), "dim_i", "dim_j")
            ),
        )
    )
    return ranked.filter(F.col("rnk") <= CORR_TOP_PAIRS).drop("rnk")


EMBEDDING_CORR_PAIRS_SQL = f"""
WITH {_FLAT_CTE},
mom AS (
  SELECT i, count(*) AS n, sum(v) AS s, sum(v * v) AS ss
  FROM flat GROUP BY i
),
pair AS (
  SELECT a.i AS ia, b.i AS ib, sum(a.v * b.v) AS p
  FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND b.i > a.i
  GROUP BY a.i, b.i
),
c AS (
  SELECT CAST(ia - 1 AS BIGINT) AS dim_i, CAST(ib - 1 AS BIGINT) AS dim_j,
         floor((CAST(ma.n AS DOUBLE) * CAST(p AS DOUBLE)
                - CAST(ma.s AS DOUBLE) * CAST(mb.s AS DOUBLE))
               / sqrt((CAST(ma.n AS DOUBLE) * CAST(ma.ss AS DOUBLE)
                       - CAST(ma.s AS DOUBLE) * CAST(ma.s AS DOUBLE))
                      * (CAST(mb.n AS DOUBLE) * CAST(mb.ss AS DOUBLE)
                         - CAST(mb.s AS DOUBLE) * CAST(mb.s AS DOUBLE)))
               * 1e6 + 0.5) / 1e6 AS corr
  FROM pair
  JOIN mom ma ON ma.i = ia
  JOIN mom mb ON mb.i = ib
  WHERE CAST(ma.n AS DOUBLE) * CAST(ma.ss AS DOUBLE)
        - CAST(ma.s AS DOUBLE) * CAST(ma.s AS DOUBLE) > 0
    AND CAST(mb.n AS DOUBLE) * CAST(mb.ss AS DOUBLE)
        - CAST(mb.s AS DOUBLE) * CAST(mb.s AS DOUBLE) > 0
)
SELECT dim_i, dim_j, corr FROM (
  SELECT dim_i, dim_j, corr,
         row_number() OVER (ORDER BY abs(corr) DESC, dim_i, dim_j) AS rnk
  FROM c
) WHERE rnk <= {CORR_TOP_PAIRS}
"""


# --- product-quantization ANN (codes + ADC + exact rerank) ---------------

PQ_M = 8                     # subspaces of 8 components each
PQ_SUBDIM = DIM // PQ_M
# codeword seeds: 16 fixed corpus vectors (disjoint from the query set),
# each contributing its m-th subvector as subspace m's k-th codeword.
# Deterministic by construction; _fit_centroids already demonstrates the
# Lloyd machinery for IVF — reusing seeds-only codebooks here keeps the
# 8-codebook oracle tractable while the encode/LUT/ADC plan shape is
# identical under any codebook.
PQ_CODEBOOK_IDS = list(range(30, 46))
PQ_SHORTLIST = 20            # ADC candidates per query before exact rerank


def pq_encode(base: DataFrame, cb_ids: list[int], cbs: "np.ndarray") -> DataFrame:
    """(vec_id, codes): each micro-unit vector quantized to PQ_M codeword
    IDs — argmin exact-integer squared L2 per subspace, codeword-id
    tie-break. 64 floats → 8 small ints: the 32× compression that lets a
    billion-vector index live in RAM. One numpy pass per Arrow batch."""
    ids_arr = np.array(cb_ids, dtype=np.int64)

    @F.pandas_udf("array<int>")
    def encode(vs: pd.Series) -> pd.Series:
        Mx = np.array(vs.tolist(), dtype=np.int64).reshape(-1, PQ_M, PQ_SUBDIM)
        out = np.empty((len(Mx), PQ_M), dtype=np.int64)
        for m in range(PQ_M):
            diff = Mx[:, m, None, :] - cbs[m][None, :, :]
            d2 = np.einsum("bkd,bkd->bk", diff, diff)  # exact int64
            order = np.lexsort((ids_arr[None, :].repeat(len(Mx), 0), d2), axis=1)
            out[:, m] = ids_arr[order[:, 0]]
        return pd.Series(out.tolist())

    return base.select("vec_id", encode(F.col("v")).alias("codes"))


def ann_pq(embeddings: DataFrame) -> DataFrame:
    """Product-quantization ANN: vectors PQ-encoded to PQ_M codeword ids
    (pq_encode), queries score the WHOLE corpus through an asymmetric-
    distance lookup table (LUT: |Q| × M × K exact integer squared
    sub-distances, built once from the collected query set — model-scale
    data like the LSH planes), each Arrow batch emits only its LOCAL
    top-PQ_SHORTLIST per query (tournament: the global top-R of
    batch-local top-Rs is exactly the global top-R under the identical
    (adc, vec_id) tie-broken order), and the global shortlist is
    exact-cosine reranked to TOP_K — the IVF-complementary half of a
    production vector index (IVF prunes WHICH vectors to score; PQ
    compresses HOW each one is scored).

    Scale shape: after encoding, a scan touches only (vec_id, 8 codes);
    the ADC pass is LUT gathers (no vector arithmetic), shuffles at most
    |Q| × R rows per batch, and only the ≤ |Q| × R shortlist ever
    re-reads full vectors for the rerank. Every distance is exact int64
    (micro-unit components), so the DuckDB oracle replays encode + LUT +
    ADC + rerank bit-identically."""
    from flink_cep_task_spark.operators.cache import persisted

    base = persisted(_with_norm(embeddings))
    seeds = sorted(
        (r["vec_id"], r["v"])
        for r in base.filter(F.col("vec_id").isin(PQ_CODEBOOK_IDS))
        .select("vec_id", "v")
        .collect()
    )
    cb_ids = [cid for cid, _ in seeds]
    cbs = (
        np.array([v for _, v in seeds], dtype=np.int64)
        .reshape(len(cb_ids), PQ_M, PQ_SUBDIM)
        .transpose(1, 0, 2)
    )  # (M, K, SUBDIM)
    enc = pq_encode(base, cb_ids, cbs)

    qs = sorted(
        (r["vec_id"], r["v"])
        for r in base.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "v")
        .collect()
    )
    q_ids = np.array([q for q, _ in qs], dtype=np.int64)
    Q = np.array([v for _, v in qs], dtype=np.int64).reshape(
        len(q_ids), PQ_M, PQ_SUBDIM
    )
    # LUT[q, m, k] = ||Q[q,m] - cbs[m,k]||² exact
    lut = np.einsum(
        "qmkd,qmkd->qmk",
        Q[:, :, None, :] - cbs[None, :, :, :],
        Q[:, :, None, :] - cbs[None, :, :, :],
    )
    ids_sorted = np.array(cb_ids, dtype=np.int64)

    def adc_local_top(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vec_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (B, M)
            ci = np.searchsorted(ids_sorted, codes)  # codeword id → index
            adc = np.zeros((len(q_ids), len(vec_ids)), dtype=np.int64)
            for m in range(PQ_M):
                adc += lut[:, m, ci[:, m]]
            # a query never shortlists itself
            adc = np.where(
                vec_ids[None, :] == q_ids[:, None], np.iinfo(np.int64).max, adc
            )
            r = min(PQ_SHORTLIST, len(vec_ids))
            order = np.lexsort(
                (vec_ids[None, :].repeat(len(q_ids), 0), adc), axis=1
            )[:, :r]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, r),
                    "vec_id": vec_ids[order].ravel(),
                    "adc": np.take_along_axis(adc, order, axis=1).ravel(),
                }
            )

    local = enc.mapInPandas(adc_local_top, "query_id LONG, vec_id LONG, adc LONG")
    short = (
        local.filter(F.col("adc") < np.iinfo(np.int64).max)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("adc", "vec_id")
            ),
        )
        .filter(F.col("rn") <= PQ_SHORTLIST)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    pairs = (
        short.join(base.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .join(F.broadcast(q), "query_id")
    )
    cos = _cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm"))
    ranked = pairs.select(
        "query_id", "neighbor_id", cos.alias("cosine")
    ).withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("cosine").desc(), F.col("neighbor_id")
            )
        ),
    )
    return ranked.filter(F.col("rnk") <= TOP_K).select(
        "query_id", "neighbor_id", "cosine", "rnk"
    )


ANN_PQ_SQL = f"""
WITH {_FLAT_CTE},
{_NORMS_CTE},
sub AS (
  SELECT vec_id, (i - 1) // {PQ_SUBDIM} AS m, (i - 1) % {PQ_SUBDIM} AS si, v
  FROM flat
),
cb AS (
  SELECT vec_id AS cb_id, m, si, v FROM sub
  WHERE vec_id IN ({", ".join(str(i) for i in PQ_CODEBOOK_IDS)})
),
codes AS (
  SELECT vec_id, m, cb_id FROM (
    SELECT s.vec_id, s.m, c.cb_id,
           row_number() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY sum((s.v - c.v) * (s.v - c.v)), c.cb_id) AS rn
    FROM sub s JOIN cb c ON c.m = s.m AND c.si = s.si
    GROUP BY s.vec_id, s.m, c.cb_id
  ) WHERE rn = 1
),
lut AS (
  SELECT q.vec_id AS query_id, c.m, c.cb_id,
         sum((q.v - c.v) * (q.v - c.v)) AS d
  FROM sub q JOIN cb c ON c.m = q.m AND c.si = q.si
  WHERE q.vec_id < {N_QUERIES}
  GROUP BY q.vec_id, c.m, c.cb_id
),
adc AS (
  SELECT l.query_id, co.vec_id, sum(l.d) AS dist
  FROM codes co JOIN lut l ON l.m = co.m AND l.cb_id = co.cb_id
  WHERE co.vec_id <> l.query_id
  GROUP BY l.query_id, co.vec_id
),
short AS (
  SELECT query_id, vec_id AS neighbor_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rn
    FROM adc
  ) WHERE rn <= {PQ_SHORTLIST}
),
dots AS (
  SELECT s.query_id, s.neighbor_id, sum(a.v * b.v) AS dp
  FROM short s
  JOIN flat a ON a.vec_id = s.query_id
  JOIN flat b ON b.vec_id = s.neighbor_id AND b.i = a.i
  GROUP BY s.query_id, s.neighbor_id
),
cos AS (
  SELECT d.query_id, d.neighbor_id,
         round((CAST(d.dp AS DOUBLE) / {SCALE2!r}) / (na.nrm * nb.nrm), 6) AS cosine
  FROM dots d
  JOIN norms na ON na.vec_id = d.query_id
  JOIN norms nb ON nb.vec_id = d.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk
  FROM cos
) WHERE rnk <= {TOP_K}
"""


def ann_ivf_pq(embeddings: DataFrame) -> DataFrame:
    """The production billion-vector index shape — IVF × PQ composed
    (FAISS's IVFPQ): the inverted file prunes WHICH vectors each query
    scores (nprobe nearest cells), PQ's asymmetric-distance LUT prices
    HOW each survivor is scored (8 code gathers, no vector arithmetic),
    and only the ≤ |Q| × PQ_SHORTLIST shortlist re-reads full vectors
    for the exact-cosine rerank. Every stage is the already-gated
    machinery (_fit_centroids / _assign_cells / pq_encode) composed, and
    every distance is exact int64 — the oracle replays the full
    fit + invert + probe + encode + LUT + ADC + rerank pipeline in SQL.

    Scale shape: candidate generation is the IVF equi-join on cell id;
    the ADC column is a per-row LUT gather over the candidate set only
    (|Q| × nprobe × cell size rows), and nothing downstream of the scan
    ever moves a full vector except the fixed-size shortlist."""
    from flink_cep_task_spark.operators.cache import persisted

    base = persisted(_with_norm(embeddings))
    cents = _fit_centroids(base)
    inv_file = _assign_cells(base, cents, 1).filter(F.col("rank") == 0).drop("rank")
    probes = (
        _assign_cells(base.filter(F.col("vec_id") < N_QUERIES), cents, IVF_NPROBE)
        .drop("rank")
        .withColumnRenamed("vec_id", "query_id")
    )
    cand = (
        inv_file.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )

    seeds = sorted(
        (r["vec_id"], r["v"])
        for r in base.filter(F.col("vec_id").isin(PQ_CODEBOOK_IDS))
        .select("vec_id", "v")
        .collect()
    )
    cb_ids = [cid for cid, _ in seeds]
    cbs = (
        np.array([v for _, v in seeds], dtype=np.int64)
        .reshape(len(cb_ids), PQ_M, PQ_SUBDIM)
        .transpose(1, 0, 2)
    )
    enc = pq_encode(base, cb_ids, cbs)

    qs = sorted(
        (r["vec_id"], r["v"])
        for r in base.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "v")
        .collect()
    )
    q_ids = np.array([q for q, _ in qs], dtype=np.int64)
    Q = np.array([v for _, v in qs], dtype=np.int64).reshape(
        len(q_ids), PQ_M, PQ_SUBDIM
    )
    diffq = Q[:, :, None, :] - cbs[None, :, :, :]
    lut = np.einsum("qmkd,qmkd->qmk", diffq, diffq)
    ids_sorted = np.array(cb_ids, dtype=np.int64)

    @F.pandas_udf("long")
    def adc(query_ids: pd.Series, codes: pd.Series) -> pd.Series:
        qi = np.searchsorted(q_ids, query_ids.to_numpy(dtype=np.int64))
        ci = np.searchsorted(ids_sorted, np.array(codes.tolist(), dtype=np.int64))
        total = np.zeros(len(qi), dtype=np.int64)
        for m in range(PQ_M):
            total += lut[qi, m, ci[:, m]]
        return pd.Series(total)

    scored = cand.join(enc, "vec_id").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        adc(F.col("query_id"), F.col("codes")).alias("adc"),
    )
    short = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
            ),
        )
        .filter(F.col("rn") <= PQ_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    pairs = (
        short.join(base.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .join(F.broadcast(q), "query_id")
    )
    cos = _cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm"))
    ranked = pairs.select(
        "query_id", "neighbor_id", cos.alias("cosine")
    ).withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("cosine").desc(), F.col("neighbor_id")
            )
        ),
    )
    return ranked.filter(F.col("rnk") <= TOP_K).select(
        "query_id", "neighbor_id", "cosine", "rnk"
    )


def _ann_ivf_pq_sql() -> str:
    ctes, _cfin = _ivf_common_ctes()
    return f"""
WITH {ctes},
probes AS (
  SELECT vec_id AS query_id, cid AS cell FROM ranked_cells
  WHERE rnk <= {IVF_NPROBE} AND vec_id < {N_QUERIES}
),
cand AS (
  SELECT DISTINCT p.query_id, f.vec_id AS neighbor_id
  FROM inv_file f JOIN probes p USING (cell)
  WHERE f.vec_id <> p.query_id
),
sub AS (
  SELECT vec_id, (i - 1) // {PQ_SUBDIM} AS m, (i - 1) % {PQ_SUBDIM} AS si, v
  FROM flat
),
cb AS (
  SELECT vec_id AS cb_id, m, si, v FROM sub
  WHERE vec_id IN ({", ".join(str(i) for i in PQ_CODEBOOK_IDS)})
),
codes AS (
  SELECT vec_id, m, cb_id FROM (
    SELECT s.vec_id, s.m, c.cb_id,
           row_number() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY sum((s.v - c.v) * (s.v - c.v)), c.cb_id) AS rn
    FROM sub s JOIN cb c ON c.m = s.m AND c.si = s.si
    GROUP BY s.vec_id, s.m, c.cb_id
  ) WHERE rn = 1
),
lut AS (
  SELECT q.vec_id AS query_id, c.m, c.cb_id,
         sum((q.v - c.v) * (q.v - c.v)) AS d
  FROM sub q JOIN cb c ON c.m = q.m AND c.si = q.si
  WHERE q.vec_id < {N_QUERIES}
  GROUP BY q.vec_id, c.m, c.cb_id
),
adcd AS (
  SELECT c.query_id, c.neighbor_id, sum(l.d) AS dist
  FROM cand c
  JOIN codes co ON co.vec_id = c.neighbor_id
  JOIN lut l ON l.m = co.m AND l.cb_id = co.cb_id AND l.query_id = c.query_id
  GROUP BY c.query_id, c.neighbor_id
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY dist, neighbor_id) AS rn
    FROM adcd
  ) WHERE rn <= {PQ_SHORTLIST}
),
{_NORMS_CTE},
pair_dots AS (
  SELECT s.query_id, s.neighbor_id, sum(a.v * b.v) AS dp
  FROM short s
  JOIN flat a ON a.vec_id = s.query_id
  JOIN flat b ON b.vec_id = s.neighbor_id AND b.i = a.i
  GROUP BY s.query_id, s.neighbor_id
),
cosd AS (
  SELECT d.query_id, d.neighbor_id,
         round((CAST(d.dp AS DOUBLE) / {SCALE2!r}) / (na.nrm * nb.nrm), 6) AS cosine
  FROM pair_dots d
  JOIN norms na ON na.vec_id = d.query_id
  JOIN norms nb ON nb.vec_id = d.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk
  FROM cosd
) WHERE rnk <= {TOP_K}
"""


ANN_IVF_PQ_SQL = _ann_ivf_pq_sql()


def pq_codes(embeddings: DataFrame) -> DataFrame:
    """Gate projection of the PQ code TABLE itself — the artifact a
    production index stores (8 codeword ids standing in for 64 floats):
    (vec_id, codes_csv). Auditable independently of any query that
    consumes it, the same way embedding_quantize gates the int8 path."""
    from flink_cep_task_spark.operators.cache import persisted

    base = persisted(_with_norm(embeddings))
    seeds = sorted(
        (r["vec_id"], r["v"])
        for r in base.filter(F.col("vec_id").isin(PQ_CODEBOOK_IDS))
        .select("vec_id", "v")
        .collect()
    )
    cb_ids = [cid for cid, _ in seeds]
    cbs = (
        np.array([v for _, v in seeds], dtype=np.int64)
        .reshape(len(cb_ids), PQ_M, PQ_SUBDIM)
        .transpose(1, 0, 2)
    )
    enc = pq_encode(base, cb_ids, cbs)
    return enc.select("vec_id", F.array_join(F.col("codes"), ",").alias("codes_csv"))


PQ_CODES_SQL = f"""
WITH {_FLAT_CTE},
sub AS (
  SELECT vec_id, (i - 1) // {PQ_SUBDIM} AS m, (i - 1) % {PQ_SUBDIM} AS si, v
  FROM flat
),
cb AS (
  SELECT vec_id AS cb_id, m, si, v FROM sub
  WHERE vec_id IN ({", ".join(str(i) for i in PQ_CODEBOOK_IDS)})
),
codes AS (
  SELECT vec_id, m, cb_id FROM (
    SELECT s.vec_id, s.m, c.cb_id,
           row_number() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY sum((s.v - c.v) * (s.v - c.v)), c.cb_id) AS rn
    FROM sub s JOIN cb c ON c.m = s.m AND c.si = s.si
    GROUP BY s.vec_id, s.m, c.cb_id
  ) WHERE rn = 1
)
SELECT vec_id,
       array_to_string(list(CAST(cb_id AS VARCHAR) ORDER BY m), ',') AS codes_csv
FROM codes GROUP BY vec_id
"""
