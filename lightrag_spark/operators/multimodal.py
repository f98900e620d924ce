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


def decode_image_meta(payload: bytes, fake: bool = False) -> dict:
    """Decode image metadata.  STUB: real decode needs PIL/libvips (absent
    here); ``fake=True`` derives deterministic pseudo-dimensions from the
    payload hash so the distributed plumbing can be exercised end-to-end."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/libvips, not available in this container"
        )
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
