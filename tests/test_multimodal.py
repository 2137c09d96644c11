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


def test_vectorized_batch_matches_scalar_fake():
    """The numpy batch kernel is value-identical to mapping
    fake_decode_header row by row (including None / short payloads)."""
    import pandas as pd

    from node_crawler_spark.functions.multimodal import (
        _fake_batch,
        _rowwise_batch,
    )

    payloads = [
        struct.pack(">II", 640, 480) + b"pixels" * 10,
        struct.pack(">II", 17, 4242) + b"\x00\xff" * 33,
        None,
        b"short",
        struct.pack(">II", 1, 1),
    ]
    pdf = pd.DataFrame({
        "media_id": range(len(payloads)),
        "kind": ["image"] * len(payloads),
        "payload": payloads,
    })
    vec = _fake_batch(pdf)
    ref = _rowwise_batch(pdf, fake_decode_header)
    assert vec.columns.tolist() == ref.columns.tolist()
    for col in vec.columns:
        assert vec[col].tolist() == ref[col].tolist(), col
    # empty batch keeps the schema
    empty = _fake_batch(pdf.iloc[0:0])
    assert empty.columns.tolist() == ref.columns.tolist()
    assert len(empty) == 0


def test_real_decoder_path_with_stub_pil(monkeypatch):
    """_decode_image_real is auto-picked when PIL imports and honors
    the (w, h, luma, phash) contract — exercised against a stub PIL
    (codecs aren't in this container)."""
    import sys
    import types

    from node_crawler_spark.functions import multimodal as mm

    class _Img:
        size = (3, 2)

        def convert(self, mode):
            assert mode == "L"
            return self

        def getdata(self):
            return [10, 20, 30, 40, 50, 60]

    pil = types.ModuleType("PIL")
    pil.Image = types.SimpleNamespace(open=lambda buf: _Img())
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil.Image)

    assert mm._pick_decoder() is mm._decode_image_real
    payload = b"fakejpegbytes"
    w, h, luma, phash = mm._decode_image_real(payload)
    assert (w, h) == (3, 2)
    assert luma == sum([10, 20, 30, 40, 50, 60]) / 6.0
    digest = hashlib.sha256(payload).digest()
    assert phash == int.from_bytes(digest[4:12], "big", signed=True)
    # without the stub, the pick falls back to the deterministic fake
    monkeypatch.delitem(sys.modules, "PIL")
    monkeypatch.delitem(sys.modules, "PIL.Image")
    assert mm._pick_decoder() is mm.fake_decode_header


def test_resize_and_frame_sample(spark):
    media = synthetic_media(spark, 30)
    rs = {r.media_id: r for r in resize_stub(media, 256).collect()}
    for r in rs.values():
        assert max(r.target_w, r.target_h) <= 256
        assert r.target_w >= 0 and r.target_h >= 0
    frames = frame_sample_stub(media, 40000).collect()
    assert all(f.sample_ms % 40000 == 0 for f in frames)
    assert len(frames) >= media.where("kind = 'video'").count()
