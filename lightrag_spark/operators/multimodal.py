"""Multimodal column plumbing: binary payloads + typed metadata.

The reference ingests docx/pdf sidecar blocks (tables/drawings/equations)
through its parser package and injects "multimodal entities" during
extraction (operate.py sidecar handling; lightrag/parser/*).  At corpus
scale the equivalent is: media as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched UDFs.

The image/audio decode libraries are not present in this container, so the
decode kernel is STUBBED — ``decode_image_meta`` raises
NotImplementedError unless ``fake=True``, in which case it derives
deterministic pseudo-metadata from the bytes.  Everything around the stub —
schema, partitioning, UDF signature, Arrow batch shape — is real and
tested, so swapping in PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)


def _pil_image():
    """Import-gated PIL (the tiktoken pattern): the kernels self-upgrade
    to real decode the moment the library exists in the environment; the
    fake path stays the deterministic CI twin."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_image_meta(payload: bytes, fake: bool = False) -> dict:
    """Decode image metadata.  With PIL present the real decode runs;
    without it, ``fake=True`` derives deterministic pseudo-dimensions from
    the payload hash so the distributed plumbing is exercised end-to-end,
    and ``fake=False`` raises rather than silently degrading."""
    if not fake:
        Image = _pil_image()
        if Image is None:
            raise NotImplementedError(
                "image decode requires PIL/libvips, not available in this container"
            )
        import io

        with Image.open(io.BytesIO(payload)) as im:
            return {
                "width": int(im.width),
                "height": int(im.height),
                "format": (im.format or "").lower() or None,
            }
    h = hashlib.md5(payload).hexdigest()
    return {
        "width": 64 + int(h[:4], 16) % 1984,
        "height": 64 + int(h[4:8], 16) % 1984,
        "format": ["png", "jpeg", "webp"][int(h[8], 16) % 3],
    }


def extract_media_metadata(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    kind_col: str = "kind",
    fake_decode: bool = False,
) -> DataFrame:
    """media(media_id, kind, payload binary) -> typed metadata table.

    One ``mapInPandas`` pass; payload bytes never leave the executor, and
    only the (small) metadata rows shuffle.
    """
    fake = fake_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {f.name: [] for f in MEDIA_META_SCHEMA.fields}
            for mid, kind, payload in zip(pdf[id_col], pdf[kind_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                meta = decode_image_meta(payload, fake=fake) if kind == "image" else {
                    "width": None, "height": None, "format": None,
                }
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_bytes"].append(len(payload))
                out["content_hash"].append(hashlib.md5(payload).hexdigest())
                out["width"].append(meta["width"])
                out["height"].append(meta["height"])
                out["format"].append(meta["format"])
            yield pd.DataFrame(out)

    return media.select(id_col, kind_col, payload_col).mapInPandas(
        batches, schema=MEDIA_META_SCHEMA
    )


def dedup_media_by_hash(meta: DataFrame) -> DataFrame:
    """Exact media dedup on the payload hash (binary-safe)."""
    return (
        meta.groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min("media_id").alias("first_media_id"))
        .filter(F.col("dup_count") > 1)
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_kernel(payload: bytes, target_w: int, target_h: int, fake: bool = False) -> bytes:
    """Resize an image payload.  With PIL present the real resize runs
    (PNG re-encode); without it, ``fake=True`` returns a deterministic
    surrogate whose length scales with the target area so batch-shape and
    size accounting are exercised for real."""
    if not fake:
        Image = _pil_image()
        if Image is None:
            raise NotImplementedError(
                "image resize requires PIL/libvips, not available in this container"
            )
        import io

        with Image.open(io.BytesIO(payload)) as im:
            out = io.BytesIO()
            im.resize((target_w, target_h)).save(out, format="PNG")
            return out.getvalue()
    h = hashlib.md5(payload).digest()
    rep = max(1, (target_w * target_h) // (16 * len(h)))
    return (h * rep)[: max(16, target_w * target_h // 16)]


def resize_images(
    media: DataFrame,
    target_w: int = 256,
    target_h: int = 256,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake_decode: bool = False,
) -> DataFrame:
    """media -> resized payloads, one mapInPandas pass (payload bytes stay
    on executors; Arrow moves them between JVM and Python in batches —
    spark.sql.execution.arrow.maxRecordsPerBatch bounds batch memory for
    large images)."""
    fake = fake_decode
    w, h = target_w, target_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "width": [], "height": [], "payload": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["payload"].append(resize_kernel(payload, w, h, fake=fake))
            yield pd.DataFrame(out)

    return media.select(id_col, payload_col).mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("frame_hash", StringType()),
    ]
)


def sample_video_frames(
    media: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 16,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fake_decode: bool = False,
) -> DataFrame:
    """Video -> sampled frame rows (frame_idx, ts_ms, frame content hash).
    STUB kernel (ffmpeg absent): ``fake_decode=True`` derives a
    deterministic duration and per-frame hashes from the payload so the
    explode shape (one media row -> N frame rows) is exercised for real.
    A real deployment replaces the inner loop with ffmpeg frame extraction
    — the operator's schema, batching, and fan-out contract are unchanged.
    """
    fake = fake_decode
    step, cap = every_ms, max_frames

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame_hash": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                if not fake:
                    raise NotImplementedError(
                        "video decode requires ffmpeg, not available in this container"
                    )
                dur_ms = 500 + int(hashlib.md5(payload).hexdigest()[:6], 16) % 30_000
                n = min(cap, max(1, dur_ms // step))
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * step)
                    out["frame_hash"].append(
                        hashlib.md5(payload + i.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media.select(id_col, payload_col).mapInPandas(batches, schema=FRAMES_SCHEMA)
