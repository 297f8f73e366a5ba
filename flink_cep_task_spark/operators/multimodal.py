"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched mapInPandas.

Real multimodal pipelines carry image/audio/video as BINARY columns with a
metadata struct, and run decode/resize/feature-extract as vectorized pandas
UDFs. `decode_image` dispatches to PIL when the codec is importable and
raises NotImplementedError on codec-less containers (like this test one);
`image_dimensions` degrades per-row to NULL dims + decoder='fallback' so
the plumbing is environment-independent. `extract_features` uses a
deterministic byte-level fake — the Spark-side plumbing (schema, Arrow
batch shape, mapInPandas signature, partition behavior) is real and tested.

Scale notes: mapInPandas streams Arrow record batches — constant memory per
partition regardless of blob sizes; set spark.sql.execution.arrow.
maxRecordsPerBatch down if individual payloads are MBs. Binary payloads
should live in their own column so Parquet column pruning skips them when a
query touches only metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("checksum", StringType(), True),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Bridge: treat each document body as an opaque binary payload (the
    test stand-in for image/audio blobs)."""
    return documents.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def decode_image(payload: bytes) -> dict:
    """Decode an image payload to {width, height, mode} via PIL when the
    codec is importable in the environment; raises NotImplementedError on
    codec-less containers (this test container has no PIL — the
    NotImplementedError branch is the one its tests exercise; the PIL
    branch is covered with an injected fake module)."""
    try:
        from PIL import Image  # noqa: PLC0415 — worker-side optional codec
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires a codec library (PIL) not present in "
            "this container"
        ) from exc
    import io

    with Image.open(io.BytesIO(payload)) as im:
        return {"width": im.width, "height": im.height, "mode": im.mode}


IMAGE_DIM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("mode", StringType(), True),
        StructField("decoder", StringType(), False),
    ]
)


def image_dimensions(media: DataFrame) -> DataFrame:
    """Per-payload image dimensions through the real mapInPandas plumbing.

    Each worker probes for the codec ONCE per partition: with PIL present
    every decodable payload yields (width, height, mode, decoder='pil');
    without it (or for undecodable payloads) the row degrades to NULL
    dims with decoder='fallback' — the operator's schema, batching and
    partition behavior are identical in both environments, so pipelines
    built on it don't fork on codec availability."""

    def dims(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            decode_image(b"")  # probe: raises NotImplementedError iff no codec
            have_codec = True
        except NotImplementedError:
            have_codec = False
        except Exception:
            have_codec = True  # codec present; empty payload just isn't an image

        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in IMAGE_DIM_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w = h = mode = None
                decoder = "fallback"
                if have_codec and payload is not None:
                    try:
                        d = decode_image(payload)
                        w, h, mode = d["width"], d["height"], d["mode"]
                        decoder = "pil"
                    except Exception:
                        pass  # undecodable payload → fallback row
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mode"].append(mode)
                rows["decoder"].append(decoder)
            yield pd.DataFrame(rows)

    return media.mapInPandas(dims, schema=IMAGE_DIM_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The feature computation here is a deterministic byte-level fake
    (length + md5 checksum) standing in for a model forward pass; the
    mapInPandas contract (iterator of pandas batches in/out) is the real
    production shape.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payload.map(lambda b: len(b) if b is not None else None),
                    "checksum": payload.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                }
            )

    return media.mapInPandas(compute, schema=FEATURE_SCHEMA)


def media_feature_stats(documents: DataFrame) -> DataFrame:
    """documents → binary payloads → mapInPandas features. The md5 checksum
    and byte length are SQL-reproducible (md5/octet_length), making the
    whole Python-UDF path oracle-checkable."""
    return extract_features(documents_as_media(documents)).select(
        "doc_id", "media_type", "n_bytes", "checksum"
    )


MEDIA_FEATURES_SQL = """
SELECT doc_id,
       'text/plain' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum
FROM documents
"""


# --- frame sampling -------------------------------------------------------

FRAME_BYTES = 64     # bytes per "frame" (stand-in for a decoded video frame)
FRAME_STRIDE = 2     # keep every 2nd frame

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_offset", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("checksum", StringType(), False),
    ]
)


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame-sampling plumbing: slice each binary payload into fixed-size
    frames, keep every FRAME_STRIDE-th, emit one row per sampled frame —
    the video-pipeline shape (decode → frame grid → stride sample →
    per-frame features) with a byte-slice standing in for the codec.

    mapInPandas fan-OUT: each input row yields multiple output rows, still
    one Arrow batch stream per partition — no shuffle until something
    groups the frames."""

    def cut(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in FRAME_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, FRAME_STRIDE):
                    chunk = payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_offset"].append(i * FRAME_BYTES)
                    rows["n_bytes"].append(len(chunk))
                    rows["checksum"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(rows)

    return media.mapInPandas(cut, schema=FRAME_SCHEMA)


def media_frame_sample(documents: DataFrame) -> DataFrame:
    """documents → binary payloads → strided frame slices + per-frame
    checksums. The operator slices BYTES (that's what a codec consumes)
    while the text-based oracle slices CHARACTERS, so non-ASCII documents
    — where the two disagree — are explicitly excluded on BOTH sides
    instead of relying on the fixture being ASCII."""
    ascii_only = documents.filter(
        F.octet_length(F.encode(F.col("text"), "UTF-8")) == F.length(F.col("text"))
    )
    return sample_frames(documents_as_media(ascii_only))


MEDIA_FRAME_SQL = f"""
SELECT doc_id,
       CAST(i AS BIGINT) AS frame_idx,
       CAST(i * {FRAME_BYTES} AS BIGINT) AS frame_offset,
       CAST(length(substr(text, i * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS BIGINT) AS n_bytes,
       md5(substr(text, i * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS checksum
FROM (SELECT doc_id, text,
             CAST(ceil(length(text) / {FRAME_BYTES}.0) AS BIGINT) AS nf
      FROM documents
      WHERE octet_length(encode(text)) = length(text)),
     LATERAL (SELECT unnest(generate_series(0, nf - 1, {FRAME_STRIDE})) AS i) s
"""


# --- overlapping audio-style chunking -------------------------------------

CHUNK_BYTES = 96   # bytes per chunk (stand-in for a fixed-duration audio window)
CHUNK_HOP = 64     # hop between chunk starts — chunks OVERLAP (ASR-style)

CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("chunk_idx", LongType(), False),
        StructField("start_byte", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("checksum", StringType(), False),
    ]
)


def chunk_media(media: DataFrame) -> DataFrame:
    """Overlapping fixed-size chunking over binary payloads — the audio
    pipeline's windowing shape (ASR models consume overlapping windows so
    no utterance straddles a boundary), as opposed to sample_frames'
    disjoint stride-sampling. One chunk starts every CHUNK_HOP bytes; the
    final partial chunk is kept (real pipelines pad it). Same mapInPandas
    fan-out contract: Arrow batches in, one row per chunk out, no shuffle
    until something aggregates chunks."""

    def cut(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in CHUNK_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                idx = 0
                for start in range(0, len(payload), CHUNK_HOP):
                    chunk = payload[start : start + CHUNK_BYTES]
                    rows["doc_id"].append(doc_id)
                    rows["chunk_idx"].append(idx)
                    rows["start_byte"].append(start)
                    rows["n_bytes"].append(len(chunk))
                    rows["checksum"].append(hashlib.md5(chunk).hexdigest())
                    idx += 1
            yield pd.DataFrame(rows)

    return media.mapInPandas(cut, schema=CHUNK_SCHEMA)


def media_chunk_audio(documents: DataFrame) -> DataFrame:
    """documents → binary payloads → overlapping chunk grid + per-chunk
    checksums. ASCII-only on both sides for the byte-vs-character parity
    reason documented at media_frame_sample."""
    ascii_only = documents.filter(
        F.octet_length(F.encode(F.col("text"), "UTF-8")) == F.length(F.col("text"))
    )
    return chunk_media(documents_as_media(ascii_only))


MEDIA_CHUNK_SQL = f"""
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * {CHUNK_HOP} AS BIGINT) AS start_byte,
       CAST(length(substr(text, i * {CHUNK_HOP} + 1, {CHUNK_BYTES})) AS BIGINT) AS n_bytes,
       md5(substr(text, i * {CHUNK_HOP} + 1, {CHUNK_BYTES})) AS checksum
FROM (SELECT doc_id, text,
             CAST(ceil(length(text) / {CHUNK_HOP}.0) AS BIGINT) AS nc
      FROM documents
      WHERE octet_length(encode(text)) = length(text) AND length(text) > 0),
     LATERAL (SELECT unnest(generate_series(0, nc - 1)) AS i) s
"""


# --- media dedup (exact byte-level + embedding near-dup) -------------------

# the media fixture is exact-dup-free (every sf: |distinct payloads| ==
# |payloads|), so exact suppression would be vacuous — every MEDIA_DUP_MOD-th
# payload re-arrives re-labeled (doc_id + stride) BY CONSTRUCTION,
# identically in the engine and the oracle. Same pattern as
# dedup_stream_watermark's injected stream copies. The stride is DERIVED
# from the data (max(doc_id) + 1, a 1-row bounded collect — model
# parameter, like the k-means centroids) rather than a fixed constant: a
# fixed 10^6 offset would silently collide with real doc_ids at the
# corpus sizes the docstring claims, assigning one document another
# document's vector — and oracle parity could never catch it because the
# SQL would apply the identical transform.
MEDIA_DUP_MOD = 7


def media_dedup_report(documents: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Dedup over MEDIA payloads — the two layers a multimodal corpus
    needs, composed into one per-payload report:

    - EXACT (byte level, no codec): payloads flow through the real
      mapInPandas feature plumbing (extract_features: n_bytes + md5
      checksum), then an equi-key aggregate on the 32-byte checksum
      marks duplicates (canonical = min doc_id) and sizes each cluster.
      Identical payload bytes always dedup regardless of modality.
    - NEAR (perceptual level): decoding media to perceptual features is
      codec-blocked in this container (see decode_image), so the
      embedding path stands in — the embeddings table plays the
      image/audio-encoder output store (vec_id keyed to the source
      doc_id; an injected exact copy inherits its source's vector, as
      identical bytes produce identical encoder output). Near-dup
      partners come from dedup_embedding_cosine's LSH-bucketed
      candidate + exact-cosine-verify pairs — never an all-pairs join.

    Scale shape: one payload scan through Arrow-batched Python (the
    unavoidable feature pass), one checksum-keyed aggregate + equi-join
    (32-byte keys, uniform — skew-free), and the vector side reuses the
    bucketed pair machinery; partner counts are vector-keyed (bounded by
    the vector store, not the payload corpus) and join back on an
    equi-key."""
    from flink_cep_task_spark.operators.similarity import dedup_embedding_cosine

    stride = documents.agg(F.max("doc_id") + 1).first()[0]
    if stride is None:
        # an empty corpus would otherwise turn the copy relabeling and
        # the near-join CASE into silent NULL arithmetic
        raise ValueError("media_dedup_report: documents table is empty")
    copies = documents.filter(
        F.col("doc_id") % MEDIA_DUP_MOD == 0
    ).withColumn("doc_id", F.col("doc_id") + F.lit(stride))
    media = documents_as_media(documents.unionByName(copies))
    feats = extract_features(media).select("doc_id", "n_bytes", "checksum")
    clusters = feats.groupBy("checksum").agg(
        F.min("doc_id").alias("canon_id"),
        F.count(F.lit(1)).cast("long").alias("exact_cluster_size"),
    )
    pairs = dedup_embedding_cosine(embeddings)
    # ONE consumer of the pair pipeline: exploding [vec_a, vec_b] counts
    # both endpoints in a single pass — a two-branch union would re-run
    # the whole LSH + cosine-verify subtree per branch (measured: the
    # 64x audit's first cut cost ~2x the cosine leg for exactly this)
    near = (
        pairs.select(F.explode(F.array("vec_a", "vec_b")).alias("vec_id"))
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_near_dup_vecs"))
    )
    back = F.when(
        F.col("doc_id") >= F.lit(stride), F.col("doc_id") - F.lit(stride)
    ).otherwise(F.col("doc_id"))
    return (
        feats.join(clusters, "checksum")
        .withColumn("is_exact_dup", F.col("doc_id") != F.col("canon_id"))
        .withColumn("vec_id", back)
        .join(near, "vec_id", "left")
        .select(
            "doc_id",
            "n_bytes",
            "is_exact_dup",
            "exact_cluster_size",
            F.coalesce(F.col("n_near_dup_vecs"), F.lit(0))
            .cast("long")
            .alias("n_near_dup_vecs"),
        )
    )


def _media_dedup_sql() -> str:
    from flink_cep_task_spark.operators.similarity import COSINE_DUP_SQL

    return f"""
WITH stride AS MATERIALIZED (
  SELECT max(doc_id) + 1 AS s FROM documents
), media AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + (SELECT s FROM stride), text FROM documents
  WHERE doc_id % {MEDIA_DUP_MOD} = 0
), feats AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5(text) AS checksum
  FROM media
), clusters AS (
  SELECT checksum, min(doc_id) AS canon_id,
         CAST(count(*) AS BIGINT) AS exact_cluster_size
  FROM feats GROUP BY checksum
), pairs AS ({COSINE_DUP_SQL.strip()}
), near AS (
  SELECT vec_id, CAST(count(*) AS BIGINT) AS n_near_dup_vecs
  FROM (SELECT vec_a AS vec_id FROM pairs
        UNION ALL SELECT vec_b FROM pairs)
  GROUP BY vec_id
)
SELECT f.doc_id, f.n_bytes,
       f.doc_id <> c.canon_id AS is_exact_dup,
       c.exact_cluster_size,
       coalesce(n.n_near_dup_vecs, 0) AS n_near_dup_vecs
FROM feats f
JOIN clusters c USING (checksum)
LEFT JOIN near n
  ON n.vec_id = CASE WHEN f.doc_id >= (SELECT s FROM stride)
                     THEN f.doc_id - (SELECT s FROM stride)
                     ELSE f.doc_id END
"""


MEDIA_DEDUP_SQL = _media_dedup_sql()
