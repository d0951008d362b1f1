"""Multimodal decode / feature-extract kernels over opaque binary columns.

Spark-side plumbing is real (Arrow-batched ``mapInPandas`` over ``binary``,
stable output schema, map-only plan — no shuffle of payload bytes); the
codec layer is swappable:

- ``_decode_real``: PIL / soundfile / ffmpeg path — **stubbed**: those libs
  are not in this container, so it raises ``NotImplementedError`` with a
  clear marker. At 100 TB this is where a vectorized decoder goes; nothing
  else changes.
- ``_decode_fake``: deterministic byte-level features (length, header,
  checksum) — exercised by tests and by the driver's DuckDB oracle, since
  the fake payloads are md5-hex bytes reproducible in SQL.

Batch-shape note: payloads ride Arrow binary arrays; one output row per
input row, so Spark can pipeline batches without buffering a partition.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

__all__ = ["MEDIA_FEATURES_SCHEMA", "extract_media_features",
           "decode_image", "sample_video_frames"]

MEDIA_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("header", StringType()),
    StructField("checksum", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])


def decode_image(payload: bytes) -> "object":
    """Real image decode — STUB: PIL/libjpeg are not in this container.

    Marked per the build contract; swap in `PIL.Image.open(BytesIO(payload))`
    on a cluster image that ships codecs.
    """
    raise NotImplementedError(
        "real image decode requires PIL/libjpeg (not in this sandbox); "
        "use the deterministic byte-feature path instead")


def sample_video_frames(payload: bytes, every_ms: int = 1000) -> "object":
    """Real frame sampling — STUB: ffmpeg is not in this container."""
    raise NotImplementedError(
        "real frame sampling requires ffmpeg (not in this sandbox)")


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real resize — STUB: PIL is not in this container. The Spark-side
    plumbing (binary in → binary out inside the same mapInPandas batch) is
    what :func:`extract_media_features` exercises."""
    raise NotImplementedError(
        "real image resize requires PIL (not in this sandbox)")


def _features_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        ids = b["media_id"].tolist()
        kinds = b["kind"].tolist()
        payloads = b["payload"].tolist()
        widths = b["width"].tolist()
        heights = b["height"].tolist()
        rows = {"media_id": ids, "kind": kinds,
                "n_bytes": [], "header": [], "checksum": [],
                "width": widths, "height": heights}
        for p in payloads:
            raw = bytes(p) if p is not None else b""
            rows["n_bytes"].append(len(raw))
            rows["header"].append(raw[:8].decode("utf-8", errors="replace"))
            rows["checksum"].append(hashlib.md5(raw).hexdigest())
        yield pd.DataFrame(rows)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Byte-level feature extraction (map-only, Arrow-batched).

    Projects the payload plus the typed metadata the kernel passes through;
    column pruning upstream means a 2-column consumer never pays for the
    bytes it doesn't read.
    """
    pruned = media.select(
        "media_id", "kind", "payload",
        media["meta.width"].alias("width"),
        media["meta.height"].alias("height"),
    )
    return pruned.mapInPandas(_features_batch, MEDIA_FEATURES_SCHEMA)
