"""Multimodal (image/audio/video) column plumbing.

Training-data pipelines carry media as opaque ``binary`` columns with
typed metadata; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each executor streams record batches without ever
building a row-at-a-time Python loop over the driver.

The actual codecs (PIL / torchaudio / ffmpeg) are NOT in this
container, so the decode kernels are STUBBED: ``_decode_image_real``
raises ``NotImplementedError`` unless PIL is importable, and the
pipeline ships a clearly-marked deterministic fake
(``fake_decode_header``) so the Spark-side contract — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested.
Swap ``DECODER`` for the real kernel on a cluster with codecs
installed; nothing else changes.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),      # image | audio | video
        T.StructField("payload", T.BinaryType()),   # opaque encoded bytes
        T.StructField("meta", T.StructType([
            T.StructField("format", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.IntegerType()),
        ])),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("phash64", T.LongType()),
    ]
)


def _decode_image_real(payload: bytes):
    """Real codec path — same (w, h, luma, phash) contract as the
    fake; auto-selected at import when PIL resolves (see
    ``_pick_decoder``)."""
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image codecs not available in this container; "
            "use fake_decode_header or install PIL"
        ) from exc
    if payload is None:
        return 0, 0, 0.0, 0
    img = Image.open(io.BytesIO(payload))
    w, h = img.size
    luma = sum(img.convert("L").getdata()) / float(w * h)
    digest = hashlib.sha256(payload).digest()
    phash = int.from_bytes(digest[4:12], "big", signed=True)
    return int(w), int(h), float(luma), phash


def fake_decode_header(payload: bytes):
    """Deterministic FAKE decode — stands in for the codec.

    Treats the first 8 bytes as a big-endian (width, height) header
    (the synthetic generator writes exactly that) and derives a fake
    luma + perceptual hash from the payload digest, so every value is
    reproducible across executors/partitions/runs.
    """
    if payload is None or len(payload) < 8:
        return 0, 0, 0.0, 0
    w, h = struct.unpack(">II", payload[:8])
    digest = hashlib.sha256(payload).digest()
    luma = int.from_bytes(digest[:4], "big") / 2**32 * 255.0
    phash = int.from_bytes(digest[4:12], "big", signed=True)
    return int(w), int(h), luma, phash


def _pick_decoder():
    """Auto-use the real codec when PIL imports; the deterministic
    fake otherwise. Evaluated on import — workers re-import this
    module, so the pick is consistent per environment."""
    try:
        import PIL  # noqa: F401

        return _decode_image_real
    except ImportError:
        return fake_decode_header


DECODER = _pick_decoder()

_FEATURE_COLS = ["media_id", "kind", "n_bytes", "width", "height",
                 "mean_luma", "phash64"]


def _fake_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized fake decode: numpy over the whole Arrow batch —
    value-identical to mapping ``fake_decode_header`` per row (pinned
    by test). Only the sha256 digests remain per-item (the stand-in
    for the inherently per-item codec); headers, luma, and phash are
    batch ops."""
    import numpy as np

    payloads = pdf["payload"].tolist()
    n = len(payloads)
    valid = [p is not None and len(p) >= 8 for p in payloads]
    n_bytes = np.fromiter(
        (0 if p is None else len(p) for p in payloads), dtype=np.int64, count=n
    )
    hdr = b"".join(
        p[:8] if ok else b"\0" * 8 for p, ok in zip(payloads, valid)
    )
    wh = (
        np.frombuffer(hdr, dtype=">u4").reshape(-1, 2).astype(np.int64)
        if n else np.zeros((0, 2), dtype=np.int64)
    )
    dig = b"".join(
        hashlib.sha256(p).digest()[:12] if ok else b"\0" * 12
        for p, ok in zip(payloads, valid)
    )
    luma = (
        np.frombuffer(dig, dtype=">u4")[0::3].astype(np.float64)
        / 2**32 * 255.0
        if n else np.zeros(0)
    )
    d = (
        np.frombuffer(dig, dtype=np.uint8).reshape(-1, 12)
        if n else np.zeros((0, 12), dtype=np.uint8)
    )
    phash = np.frombuffer(
        np.ascontiguousarray(d[:, 4:12]).tobytes(), dtype=">i8"
    ).astype(np.int64)
    return pd.DataFrame({
        "media_id": pdf["media_id"].to_numpy(),
        "kind": pdf["kind"].to_numpy(),
        "n_bytes": n_bytes.astype(np.int32),
        "width": wh[:, 0].astype(np.int32),
        "height": wh[:, 1].astype(np.int32),
        "mean_luma": luma,
        "phash64": phash,
    }, columns=_FEATURE_COLS)


def _rowwise_batch(pdf: pd.DataFrame, decoder) -> pd.DataFrame:
    """Per-item decode (real codecs are inherently per-item); still
    inside the Arrow batch, never a driver loop."""
    rows = [
        (mid, kind, 0 if payload is None else len(payload),
         *decoder(payload))
        for mid, kind, payload in zip(
            pdf["media_id"], pdf["kind"], pdf["payload"]
        )
    ]
    return pd.DataFrame(rows, columns=_FEATURE_COLS)


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over Arrow record batches.

    Partitioning contract: payloads are large, so upstream should
    repartition by media_id range (or rely on parquet split sizing) —
    the kernel is embarrassingly parallel per batch.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if DECODER is fake_decode_header:
                yield _fake_batch(pdf)
            else:
                yield _rowwise_batch(pdf, DECODER)

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, FEATURE_SCHEMA
    )


def resize_stub(media: DataFrame, max_side: int) -> DataFrame:
    """Resize plumbing: computes the target geometry JVM-side from
    meta (no decode needed); the pixel work would happen in the same
    mapInPandas kernel as extract_media_features."""
    scale = F.when(
        F.greatest("meta.width", "meta.height") > max_side,
        max_side / F.greatest("meta.width", "meta.height").cast("double"),
    ).otherwise(F.lit(1.0))
    return media.select(
        "media_id",
        (F.col("meta.width") * scale).cast("int").alias("target_w"),
        (F.col("meta.height") * scale).cast("int").alias("target_h"),
        scale.alias("scale"),
    )


def frame_sample_stub(media: DataFrame, every_ms: int) -> DataFrame:
    """Video frame-sampling plumbing: explodes deterministic sample
    timestamps from duration metadata; frame decode itself is the
    stubbed kernel."""
    n = F.greatest(
        (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n - 1)).alias("frame_idx"),
    ).withColumn("sample_ms", F.col("frame_idx") * every_ms)


def synthetic_media(spark, n: int) -> DataFrame:
    """Deterministic media table: payload = 8-byte (w,h) header +
    hash-derived body bytes. Generated executor-side."""
    g = spark.range(0, n)
    w = (F.pmod(F.xxhash64("id"), F.lit(1920)) + 16).cast("int")
    h = (F.pmod(F.xxhash64(F.col("id") + 7), F.lit(1080)) + 16).cast("int")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    header = F.concat(
        _be32(w), _be32(h)
    )
    body = F.encode(F.repeat(F.md5(F.col("id").cast("string")), 4), "utf-8")
    return g.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.concat(header, body).alias("payload"),
        F.struct(
            F.lit("synthetic").alias("format"),
            w.alias("width"),
            h.alias("height"),
            (F.pmod(F.xxhash64(F.col("id") + 13), F.lit(600000))
             .cast("int")).alias("duration_ms"),
        ).alias("meta"),
    )


def _be32(col):
    """Big-endian uint32 bytes of an int column, JVM-side."""
    hexstr = F.lpad(F.hex(col.cast("bigint")), 8, "0")
    return F.to_binary(hexstr, F.lit("hex"))
