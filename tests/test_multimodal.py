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
