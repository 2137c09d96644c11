"""Multimodal plumbing: Arrow batch shape, schema, determinism of the
stubbed decode, geometry/frame-sampling stubs."""

from __future__ import annotations

import hashlib
import struct

from node_crawler_spark.functions.multimodal import (
    extract_media_features,
    fake_decode_header,
    frame_sample_stub,
    resize_stub,
    synthetic_media,
)


def test_fake_decode_is_deterministic():
    payload = struct.pack(">II", 640, 480) + b"pixels" * 10
    a = fake_decode_header(payload)
    b = fake_decode_header(payload)
    assert a == b
    assert a[0] == 640 and a[1] == 480
    digest = hashlib.sha256(payload).digest()
    assert a[3] == int.from_bytes(digest[4:12], "big", signed=True)


def test_extract_media_features(spark):
    media = synthetic_media(spark, 50).persist()
    feats = extract_media_features(media).collect()
    assert len(feats) == 50
    by_id = {r.media_id: r for r in feats}
    rows = {r.media_id: r for r in media.collect()}
    for mid, r in by_id.items():
        src = rows[mid]
        # width/height decoded from the payload header must match meta
        assert r.width == src.meta.width
        assert r.height == src.meta.height
        assert r.n_bytes == len(src.payload)
        assert 0.0 <= r.mean_luma <= 255.0
    # re-running yields identical features (partition-independent)
    feats2 = {r.media_id: r for r in
              extract_media_features(media.repartition(7)).collect()}
    assert {m: (f.phash64, f.mean_luma) for m, f in by_id.items()} == {
        m: (f.phash64, f.mean_luma) for m, f in feats2.items()
    }
    media.unpersist()


def test_resize_and_frame_sample(spark):
    media = synthetic_media(spark, 30)
    rs = {r.media_id: r for r in resize_stub(media, 256).collect()}
    for r in rs.values():
        assert max(r.target_w, r.target_h) <= 256
        assert r.target_w >= 0 and r.target_h >= 0
    frames = frame_sample_stub(media, 40000).collect()
    assert all(f.sample_ms % 40000 == 0 for f in frames)
    assert len(frames) >= media.where("kind = 'video'").count()
