"""Embedding similarity search over `embeddings` (vec_id, embedding
ARRAY<FLOAT>, label).

Two paths:
  * knn_bruteforce — exact top-k cosine: broadcast the (small) query set,
    stream once over all vectors. The scan side never shuffles; per-pair
    work is a zip_with/aggregate fold (built-in higher-order functions,
    JVM-side). This is the 100 TB-safe exact baseline: cost = |Q| × scan.
  * ann_lsh — random-hyperplane LSH: 8 sign-bits per vector from
    deterministic ±1 hyperplanes, bucket equi-join on the 8-bit signature,
    exact cosine only within buckets. Turns the |Q|×N pair space into
    per-bucket collisions; the bucketing is the classic SimHash-for-cosine
    scheme.

Cross-engine determinism: float components are widened to DOUBLE then cast
to DECIMAL(9,6); dot products/norms-squared are exact decimal sums (order
independent — safe under any partitioning), only the final sqrt/division is
double. Ranking orders by the ROUNDED cosine with vec_id tie-break, so both
engines rank identically. Hyperplane weights are derived from md5 in Python
and inlined as literals on BOTH sides.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_QUERIES = 10       # query set = vec_id < 10
TOP_K = 5
DIM = 64
N_PLANES = 8

VDEC = "decimal(9,6)"
ACC = "decimal(28,12)"


def _vec_dec(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double").cast(VDEC))


def _dot(a: Column, b: Column) -> Column:
    # merge must return exactly the accumulator type; decimal + grows
    # precision by 1, so cast back (lossless: |sum| < 10^16 here).
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast(ACC),
        lambda acc, x: (acc + x).cast(ACC),
    )


def _with_norm(df: DataFrame) -> DataFrame:
    v = _vec_dec(F.col("embedding"))
    return df.select(
        "vec_id",
        v.alias("v"),
        F.sqrt(_dot(v, v).cast("double")).alias("nrm"),
    )


def knn_bruteforce(embeddings: DataFrame) -> DataFrame:
    """Exact top-5 cosine neighbors for each query vector (vec_id < 10)."""
    base = _with_norm(embeddings)
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    pairs = base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = F.round(_dot(F.col("qv"), F.col("v")).cast("double") / (F.col("qn") * F.col("nrm")), 6)
    ranked = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
    ).withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
        ),
    )
    return ranked.filter(F.col("rnk") <= TOP_K).select(
        "query_id", "neighbor_id", "cosine", "rnk"
    )


KNN_SQL = f"""
WITH flat AS (
  SELECT vec_id, i, CAST(CAST(x AS DOUBLE) AS DECIMAL(9,6)) AS v
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS i FROM embeddings)
),
norms AS (SELECT vec_id, sqrt(CAST(sum(v * v) AS DOUBLE)) AS nrm FROM flat GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         CAST(sum(a.v * b.v) AS DOUBLE) AS dt
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


def _signature(v: Column) -> Column:
    bits = []
    for p in range(N_PLANES):
        w = F.array(*[F.lit(x).cast(VDEC) for x in PLANES[p]])
        s = _dot(v, w)
        bits.append(F.when(s > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def ann_lsh(embeddings: DataFrame) -> DataFrame:
    """Approximate top-5: exact cosine restricted to same-LSH-bucket
    candidates. May return <5 rows per query (sparse buckets) — by design;
    the oracle replicates the same bucketing so results still hash-match."""
    base = _with_norm(embeddings).withColumn("sig", _signature(F.col("v")))
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("sig").alias("qsig"),
    )
    cand = base.join(
        F.broadcast(q),
        (F.col("sig") == F.col("qsig")) & (F.col("vec_id") != F.col("query_id")),
    )
    cos = F.round(_dot(F.col("qv"), F.col("v")).cast("double") / (F.col("qn") * F.col("nrm")), 6)
    ranked = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
    ).withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
        ),
    )
    return ranked.filter(F.col("rnk") <= TOP_K).select(
        "query_id", "neighbor_id", "cosine", "rnk"
    )


def _ann_sql() -> str:
    values = ", ".join(
        f"({p}, {i + 1}, {PLANES[p][i]})" for p in range(N_PLANES) for i in range(DIM)
    )
    return f"""
WITH flat AS (
  SELECT vec_id, i, CAST(CAST(x AS DOUBLE) AS DECIMAL(9,6)) AS v
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS i FROM embeddings)
),
w(p, i, wt) AS (VALUES {values}),
sigbits AS (
  SELECT f.vec_id, w.p,
         CASE WHEN sum(f.v * w.wt) > 0 THEN '1' ELSE '0' END AS bit
  FROM flat f JOIN w ON w.i = f.i
  GROUP BY f.vec_id, w.p
),
sigs AS (
  SELECT vec_id, string_agg(bit, '' ORDER BY p) AS sig FROM sigbits GROUP BY vec_id
),
norms AS (SELECT vec_id, sqrt(CAST(sum(v * v) AS DOUBLE)) AS nrm FROM flat GROUP BY vec_id),
cand AS (
  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id
  FROM sigs q JOIN sigs d ON q.sig = d.sig AND d.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
),
dots AS (
  SELECT c.query_id, c.neighbor_id, CAST(sum(a.v * b.v) AS DOUBLE) AS dt
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
