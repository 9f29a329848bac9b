"""Multimodal binary-column plumbing (SURVEY L5): binaryFile scan →
media schema → mapInPandas feature extraction with the stubbed codec."""

from __future__ import annotations

import pytest

import hashlib
import os
import tempfile

from jobhouse_spark.sources.multimodal import (
    decode_stub,
    extract_features,
    read_binary_dir,
)


def _make_media_dir() -> tuple[str, dict[str, bytes]]:
    d = tempfile.mkdtemp(prefix="jh_media_")
    files = {}
    for i in range(8):
        name = f"img_{i:03d}.bin"
        payload = bytes([i] * (100 + i * 37))
        with open(os.path.join(d, name), "wb") as f:
            f.write(payload)
        files[name] = payload
    return d, files


@pytest.mark.campaign  # round-15 verdict task 1: driver verify-window
def test_binary_scan_and_feature_extraction(spark):
    d, files = _make_media_dir()
    media = read_binary_dir(spark, d, "image")
    rows = {r.media_id: r for r in media.collect()}
    assert set(rows) == set(files)
    assert rows["img_000.bin"].meta.size_bytes == 100
    assert bytes(rows["img_003.bin"].content) == files["img_003.bin"]

    feats = {r.media_id: r for r in extract_features(media).collect()}
    for name, payload in files.items():
        r = feats[name]
        assert r.size_bytes == len(payload)
        assert r.content_sha256 == hashlib.sha256(payload).hexdigest()
        expected = decode_stub(payload)
        assert (r.width, r.height, r.n_frames) == (
            expected["width"],
            expected["height"],
            expected["n_frames"],
        )
        assert 64 <= r.width < 256 and 1 <= r.n_frames <= 32


def test_decode_stub_is_deterministic():
    payload = b"same bytes"
    assert decode_stub(payload) == decode_stub(payload)
    assert decode_stub(None) == {"width": None, "height": None, "n_frames": None}


def test_resize_media_plumbing(spark):
    from jobhouse_spark.sources.multimodal import resize_media, resize_stub

    d, files = _make_media_dir()
    media = read_binary_dir(spark, d, "image")
    out = {r.media_id: r for r in resize_media(media, 32, 16).collect()}
    assert set(out) == set(files)
    for name, payload in files.items():
        r = out[name]
        assert (r.width, r.height) == (32, 16)
        assert len(bytes(r.content)) == 32 * 16
        assert bytes(r.content) == resize_stub(payload, 32, 16)


def test_sample_frames_expands_rows_deterministically(spark):
    import hashlib as hl

    from jobhouse_spark.sources.multimodal import sample_frames

    d, files = _make_media_dir()
    media = read_binary_dir(spark, d, "video")
    frames = sample_frames(media, stride=4).collect()
    by_id: dict[str, list] = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r)
    for name, payload in files.items():
        n = decode_stub(payload)["n_frames"]
        expect_idx = list(range(0, n, 4))
        got = sorted(by_id.get(name, []), key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in got] == expect_idx
        base = hl.sha256(payload).hexdigest()
        assert got[0].frame_sha256 == hl.sha256(f"{base}:0".encode()).hexdigest()
