"""Multimodal column plumbing (beyond-reference): image/audio/video as
opaque ``binary`` columns + typed metadata, processed by Arrow-batched
Pandas UDFs over ``mapInPandas``.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_image_batch`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (md5-seeded
dimensions/features) exercises the full Spark-side contract — schema,
batch shape, partitioning — which is the part that matters at scale.

Scale design: mapInPandas streams Arrow record batches through one
Python worker per core; binary payloads never materialize on the driver.
For 100 TB of media, store payloads in parquet binary columns (or
pointers to object storage) partitioned by content shard; decode cost
dominates, so repartition to cores × executors before the map and keep
batches ~64 MB (`spark.sql.execution.arrow.maxRecordsPerBatch`).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),    # opaque bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real image decoder: md5-seeded
    dimensions and an 8-dim feature vector."""
    digest = hashlib.md5(payload or b"").digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feature = [round(b / 255.0, 6) for b in digest[2:10]]
    return width, height, feature


def decode_image_batch(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract an image table (MEDIA_SCHEMA) into
    IMAGE_FEATURES_SCHEMA via mapInPandas.

    Real decoding requires an imaging library not present in this
    container — pass ``fake=True`` for the deterministic stub, which
    keeps the distributed plumbing (schema, Arrow batching, partition
    mapping) fully real and testable.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library (e.g. Pillow) not "
            "available in this environment; call with fake=True to run "
            "the deterministic stub decoder"
        )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib as _h

        import pandas as pd

        for pdf in batches:
            out = {
                "media_id": [],
                "width": [],
                "height": [],
                "n_bytes": [],
                "content_hash": [],
                "feature": [],
            }
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                w, h, feat = _fake_decode(raw)
                out["media_id"].append(media_id)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(raw))
                out["content_hash"].append(_h.md5(raw).hexdigest())
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: expands (media_id, n_frames meta)
    into one row per sampled frame index — pure Column algebra; the
    frame decode itself would be another mapInPandas stage."""
    n_frames = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(0)
    )
    # media with zero/missing n_frames yields NO rows (a frameless
    # image must not emit a phantom frame_idx=0 for the decoder) —
    # the same guard shape as audio_window_plan's n_samples filter
    return (
        df.select("media_id", n_frames.alias("__nf"))
        .filter(F.col("__nf") > 0)
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("__nf") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (payload bytes are
    md5-derived from the id)."""
    rows = []
    for i in range(n):
        payload = hashlib.md5(f"media:{i}".encode()).digest() * (1 + i % 7)
        rows.append(
            (
                i,
                "image" if i % 3 else "video",
                "image/png" if i % 3 else "video/mp4",
                bytearray(payload),
                {"n_frames": str(90 + i)} if i % 3 == 0 else {},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)


def resize_batch(df: DataFrame, max_side: int = 64, fake: bool = False) -> DataFrame:
    """Thumbnail/resize stage: decode → scale longest side to
    ``max_side`` (aspect preserved, never upscale) → re-encode. The
    pixel work is stubbed like :func:`decode_image_batch` (no imaging
    libs in this container): dimensions come from the deterministic
    fake decoder and the 'thumbnail' payload is an md5 of
    (payload, out dims) — the Spark-side contract (mapInPandas Arrow
    batches, binary in/binary out, schema) is exactly what a real
    PIL/libvips resize would use, and output size math is real.
    """
    if not fake:
        raise NotImplementedError(
            "real image resize needs an imaging library (PIL/libvips) — "
            "not installed in this container; pass fake=True for the "
            "deterministic stub"
        )
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, _ = _fake_decode(bytes(payload or b""))
                scale = min(1.0, max_side / max(w, h))
                ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
                thumb = hashlib.md5(
                    bytes(payload or b"") + f":{ow}x{oh}".encode()
                ).digest()
                out.append((media_id, w, h, ow, oh, bytearray(thumb)))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height",
                    "out_width", "out_height", "thumb",
                ],
            )

    return df.select("media_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


def audio_window_plan(
    df: DataFrame, win_samples: int = 16000, hop_samples: int = 8000
) -> DataFrame:
    """Audio windowing *plan*: expands (media_id, sample_rate/n_samples
    meta) into one row per analysis window [start, start+win) with hop
    ``hop_samples`` — pure Column algebra (sequence + explode), the
    audio twin of :func:`frame_sample_plan`. The per-window feature
    extraction (fbank/MFCC) would be a mapInPandas stage consuming
    these (media_id, win_start) rows joined back to the payload."""
    n_samples = F.coalesce(
        F.element_at(F.col("meta"), "n_samples").cast("long"), F.lit(0)
    )
    last_start = F.greatest(n_samples - win_samples, F.lit(0))
    return (
        df.where(n_samples >= F.lit(win_samples))
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), last_start, F.lit(hop_samples))
            ).alias("win_start"),
        )
    )
