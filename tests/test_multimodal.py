"""decode_image codec dispatch + image_dimensions plumbing.

The container has no PIL, so the live branch here is the
NotImplementedError one; the PIL branch is exercised by injecting a fake
PIL module (driver-side only — worker processes still take the fallback
path, which is itself asserted end-to-end)."""

from __future__ import annotations

import sys
import types

import pytest

from flink_cep_task_spark.operators.multimodal import (
    decode_image,
    documents_as_media,
    image_dimensions,
)


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_pil_available(), reason="container has a real PIL")
def test_decode_image_raises_without_codec():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n")


def test_decode_image_dispatches_to_pil(monkeypatch):
    """With a codec importable, decode_image returns the decoded dims —
    pinned with a fake PIL so the branch runs in codec-less containers."""

    class _FakeIm:
        width, height, mode = 640, 480, "RGB"

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    fake_pil = types.ModuleType("PIL")
    fake_image = types.ModuleType("PIL.Image")
    fake_image.open = lambda fp: _FakeIm()
    fake_pil.Image = fake_image
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image)

    out = decode_image(b"anything")
    assert out == {"width": 640, "height": 480, "mode": "RGB"}


def test_image_dimensions_degrades_to_fallback_rows(spark):
    """End-to-end through mapInPandas on this codec-less container: every
    payload row survives with NULL dims and decoder='fallback' — schema
    and row count are codec-independent."""
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], ["doc_id", "text"]
    )
    rows = image_dimensions(documents_as_media(docs)).collect()
    assert len(rows) == 3
    assert {r.doc_id for r in rows} == {1, 2, 3}
    for r in rows:
        if _pil_available():
            # text payloads are not decodable images even with a codec
            assert r.decoder == "fallback"
        assert r.decoder in ("fallback", "pil")
        if r.decoder == "fallback":
            assert r.width is None and r.height is None and r.mode is None


def test_media_dedup_report_suppression_properties(spark):
    """The injected exact copies must be DETECTED (non-vacuous — the raw
    fixture is exact-dup-free): each copy is flagged is_exact_dup with
    its source as canonical (cluster size 2), every non-copied payload
    stands alone, and a copy inherits its source's near-dup partner
    count (identical bytes -> identical encoder output -> same
    vector)."""
    from pyspark.sql import functions as F

    from flink_cep_task_spark.operators.multimodal import (
        MEDIA_DUP_MOD,
        media_dedup_report,
    )
    from flink_cep_task_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    embs = load_table(spark, sf, "embeddings")
    rows = {r["doc_id"]: r.asDict() for r in media_dedup_report(docs, embs).collect()}
    n_docs = docs.count()
    stride = docs.agg(F.max("doc_id") + 1).first()[0]
    copies = [d for d in rows if d >= stride]
    assert len(rows) == n_docs + len(copies) and copies
    for cid in copies:
        src = cid - stride
        assert src % MEDIA_DUP_MOD == 0
        assert rows[cid]["is_exact_dup"] is True
        assert rows[src]["is_exact_dup"] is False
        assert rows[cid]["exact_cluster_size"] == 2
        assert rows[src]["exact_cluster_size"] == 2
        assert rows[cid]["n_near_dup_vecs"] == rows[src]["n_near_dup_vecs"]
        assert rows[cid]["n_bytes"] == rows[src]["n_bytes"]
    for d, r in rows.items():
        if d < stride and d % MEDIA_DUP_MOD != 0:
            assert r["exact_cluster_size"] == 1 and r["is_exact_dup"] is False
