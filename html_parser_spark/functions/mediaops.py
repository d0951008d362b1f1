"""Multimodal decode / feature-extract kernels over opaque binary columns.

Spark-side plumbing is real (Arrow-batched ``mapInPandas`` over ``binary``,
stable output schema, map-only plan — no shuffle of payload bytes); the
codec layer is swappable:

- ``_decode_real``: PIL / soundfile / ffmpeg path — **stubbed**: those libs
  are not in this container, so it raises ``NotImplementedError`` with a
  clear marker. At 100 TB this is where a vectorized decoder goes; nothing
  else changes. One real, dependency-free branch exists so the sandbox can
  test an actual codec: uncompressed 24-bit BMP (``_decode_bmp``).
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
           "decode_image", "encode_bmp", "sample_video_frames"]

MEDIA_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("header", StringType()),
    StructField("checksum", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])


def decode_image(payload: bytes) -> dict:
    """Image decode. One REAL branch the sandbox can test — uncompressed
    24-bit BMP, decoded in pure Python (fixed public format: BITMAPFILE-
    HEADER + BITMAPINFOHEADER, little-endian, BGR rows bottom-up with
    4-byte padding) — all other formats stay stubbed: PIL/libjpeg are not
    in this container; swap in ``PIL.Image.open(BytesIO(payload))`` on a
    cluster image that ships codecs.

    Returns {"width", "height", "mode": "RGB", "pixels"} with pixels as a
    top-down list of rows of (r, g, b) tuples.
    """
    raw = bytes(payload)
    if raw[:2] == b"BM":
        return _decode_bmp(raw)
    raise NotImplementedError(
        "real non-BMP image decode requires PIL/libjpeg (not in this "
        "sandbox); use the deterministic byte-feature path instead")


def _decode_bmp(raw: bytes) -> dict:
    import struct
    if len(raw) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", raw, 10)[0]
    width, height = struct.unpack_from("<ii", raw, 18)
    bpp = struct.unpack_from("<H", raw, 28)[0]
    compression = struct.unpack_from("<I", raw, 30)[0]
    if compression != 0 or bpp != 24:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError(f"invalid BMP dimensions {width}x{height}")
    row_size = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    if data_off + row_size * height > len(raw):
        raise ValueError("truncated BMP pixel data")
    rows = []
    for r in range(height):
        src = r if top_down else height - 1 - r
        base = data_off + src * row_size
        row = [(raw[base + 3 * c + 2], raw[base + 3 * c + 1],
                raw[base + 3 * c]) for c in range(width)]  # BGR -> RGB
        rows.append(row)
    return {"width": width, "height": height, "mode": "RGB",
            "pixels": rows}


def encode_bmp(pixels: list) -> bytes:
    """Inverse of :func:`_decode_bmp` for tests/tools: top-down RGB rows →
    uncompressed 24-bit bottom-up BMP bytes."""
    import struct
    height = len(pixels)
    width = len(pixels[0]) if height else 0
    row_size = (width * 3 + 3) & ~3
    data = bytearray()
    for row in reversed(pixels):
        line = bytearray()
        for (r, g, b) in row:
            line += bytes((b, g, r))
        line += b"\x00" * (row_size - len(line))
        data += line
    pix_off = 14 + 40
    file_size = pix_off + len(data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pix_off)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(data), 2835, 2835, 0, 0)
    return bytes(header + dib + data)


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
