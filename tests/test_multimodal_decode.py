"""Decode dispatch: synthetic IMGX payloads use the deterministic stub;
anything else routes to the real-codec path, which is import-guarded
(NotImplementedError without Pillow, real decode with it)."""

from __future__ import annotations

import pytest

from parquet_batch_spark.operators import multimodal as mm


def _imgx_payload(doc_id: int, body: bytes) -> bytes:
    return f"{mm._MAGIC}{doc_id:08d}".encode() + body


def test_imgx_payload_uses_stub():
    feats = mm._decode(_imgx_payload(37, b"abcd"))
    assert feats["n_body_bytes"] == 4
    assert feats["mean_byte"] == sum(b"abcd") / 4
    assert feats["width"] == 64 + 37 % 32


def test_non_imgx_without_codec_raises(monkeypatch):
    monkeypatch.setattr(mm, "_PIL_Image", None)
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm._decode(b"\x89PNG\r\n\x1a\nrest-of-a-png")


def test_real_codec_path_when_available():
    """Runs only where Pillow exists (not this container): a 2x3 PNG
    round-trips through the real decoder with true dimensions."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    img = PIL_Image.new("L", (2, 3), color=7)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    feats = mm._decode(buf.getvalue())
    assert (feats["width"], feats["height"]) == (2, 3)
    assert feats["mean_byte"] == 7.0
