"""Multimodal media kernels: schema, batch shape, decode seam.

The decode stub is the only faked piece (no codec libs in this
container); everything around it — metadata-typed schema, Arrow batch
kernels, frame fan-out, strict mode, and the import-guarded real-codec
seam — is exercised here, including a simulated installed Pillow.
"""

from __future__ import annotations

import numpy as np
import pytest

import linkgraph.multimodal.media as media_mod
from linkgraph.multimodal.media import (
    decode_images,
    extract_features,
    sample_frames,
    synthetic_media,
)


def test_synthetic_media_schema_and_metadata(spark):
    rows = synthetic_media(spark, n=30).collect()
    assert len(rows) == 30
    assert {r["kind"] for r in rows} == {"image", "audio", "video"}
    for r in rows:
        assert isinstance(r["payload"], (bytes, bytearray)) and len(r["payload"]) > 0
        if r["kind"] == "image":
            assert r["width"] and r["height"] and r["duration_ms"] is None
        if r["kind"] == "audio":
            assert r["width"] is None and r["duration_ms"]
        if r["kind"] == "video":
            assert r["width"] and r["duration_ms"]


def test_extract_features_deterministic_and_sized(spark):
    m = synthetic_media(spark, n=24)
    a = {r["media_id"]: r["feature"] for r in extract_features(m, dim=16).collect()}
    b = {r["media_id"]: r["feature"] for r in extract_features(m, dim=16).collect()}
    assert a == b
    assert len(a) == 24
    assert all(len(v) == 16 for v in a.values())


def test_decode_images_resizes(spark):
    m = synthetic_media(spark, n=12)
    n_images = sum(1 for r in m.collect() if r["kind"] == "image")
    out = decode_images(m, target_w=8, target_h=4).collect()
    assert len(out) == n_images
    assert all(len(r["pixels"]) == 32 for r in out)


def test_sample_frames_metadata_driven(spark):
    m = synthetic_media(spark, n=12)
    vids = {
        r["media_id"]: r["duration_ms"] for r in m.collect() if r["kind"] == "video"
    }
    per: dict[int, list] = {}
    for r in sample_frames(m, every_ms=1000).collect():
        per.setdefault(r["media_id"], []).append(r)
    assert set(per) == set(vids)
    for mid, rs in per.items():
        assert len(rs) == max(1, vids[mid] // 1000)
        assert sorted(x["frame_idx"] for x in rs) == list(range(len(rs)))


def test_strict_mode_raises_without_codec(spark):
    # strict never lets the stub serve: image/video raise "no codec"
    # (PIL/pyav absent here); audio's stdlib WAV branch rejects the
    # garbage payload with a real decode error ("RIFF"). Either way
    # the stub cannot silently satisfy strict=True.
    m = synthetic_media(spark, n=3)
    with pytest.raises(Exception, match="no codec|RIFF|WAV"):
        extract_features(m, strict=True).collect()


def test_real_codec_path_via_injected_decoder(monkeypatch):
    # simulate an installed Pillow: open().convert('L') -> 2x3 grayscale
    class _Img:
        def convert(self, mode):
            assert mode == "L"
            return np.arange(6, dtype=np.uint8).reshape(2, 3)

    class _PIL:
        @staticmethod
        def open(buf):
            assert buf.read(4) == b"\x00\x01\x02\x03"
            return _Img()

    monkeypatch.setattr(media_mod, "_PIL_IMAGE", _PIL)
    out = media_mod._decode_payload(b"\x00\x01\x02\x03", "image", strict=True)
    assert out.shape == (6,)
    assert np.allclose(out, np.arange(6) / 255.0)

    # strict propagates real decode errors instead of faking
    class _PILBoom:
        @staticmethod
        def open(buf):
            raise ValueError("broken image")

    monkeypatch.setattr(media_mod, "_PIL_IMAGE", _PILBoom)
    with pytest.raises(ValueError, match="broken image"):
        media_mod._decode_payload(b"x", "image", strict=True)
    # non-strict falls back to the deterministic stub
    sig = media_mod._decode_payload(b"x", "image", strict=False)
    assert sig.shape == (64,)
