"""Multimodal decode / feature-extract kernels over opaque binary columns.

Spark-side plumbing is real (Arrow-batched ``mapInPandas`` over ``binary``,
stable output schema, map-only plan — no shuffle of payload bytes); the
codec layer is swappable:

- ``_decode_real``: PIL / soundfile / ffmpeg path — **stubbed**: those libs
  are not in this container, so it raises ``NotImplementedError`` with a
  clear marker. At 100 TB this is where a vectorized decoder goes; nothing
  else changes. Real, dependency-free branches exist so the sandbox can
  test actual codecs: uncompressed 24-bit BMP (``_decode_bmp``), 8-bit
  truecolor PNG with all five scanline filters (``_decode_png``, stdlib
  zlib), PCM WAV audio (``decode_wav``, stdlib wave), and header-only
  dimension sniffing for BMP/PNG/GIF/JPEG (``image_dimensions``).
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
           "decode_image", "encode_bmp", "encode_png", "decode_wav",
           "encode_wav", "image_dimensions", "sample_video_frames"]

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
    if raw[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(raw)
    raise NotImplementedError(
        "real JPEG/GIF pixel decode requires PIL/libjpeg (not in this "
        "sandbox); BMP and PNG decode are real — use image_dimensions() "
        "for header-only metadata on JPEG/GIF")


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


def _decode_png(raw: bytes) -> dict:
    """Pure-Python PNG decode (stdlib zlib): 8-bit-depth truecolor RGB
    (color type 2) or RGBA (type 6), non-interlaced — the overwhelmingly
    common web-PNG shape — with all five scanline filters (None/Sub/Up/
    Average/Paeth, PNG spec §9). Palette/grayscale/16-bit/Adam7 raise
    ``NotImplementedError`` so unsupported inputs can't decode silently
    wrong."""
    import struct
    import zlib

    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(raw):
        length, ctype = struct.unpack_from(">I4s", raw, pos)
        data = raw[pos + 8:pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError(f"PNG IHDR length {length} != 13")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + CRC
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or color not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit RGB/RGBA non-interlaced PNG supported "
            f"(depth={depth}, color_type={color}, interlace={interlace})")
    bpp = 3 if color == 2 else 4
    stride = width * bpp
    try:  # missing IDAT / corrupt deflate must keep the ValueError
        flat = zlib.decompress(bytes(idat))  # contract of this module
    except zlib.error as e:
        raise ValueError(f"PNG pixel stream undecodable: {e}") from e
    if len(flat) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    prev = bytearray(stride)
    rows = []
    for r in range(height):
        base = r * (stride + 1)
        ftype = flat[base]
        line = bytearray(flat[base + 1:base + 1 + stride])
        if ftype == 1:    # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif ftype != 0:
            raise ValueError(f"invalid PNG filter type {ftype}")
        rows.append([tuple(line[i:i + bpp]) for i in range(0, stride, bpp)])
        prev = line
    return {"width": width, "height": height,
            "mode": "RGB" if color == 2 else "RGBA", "pixels": rows}


def encode_png(pixels: list) -> bytes:
    """Inverse of :func:`_decode_png` for tests/tools: top-down rows of
    RGB or RGBA tuples → 8-bit truecolor PNG (filter 0 scanlines)."""
    import struct
    import zlib

    height = len(pixels)
    width = len(pixels[0]) if height else 0
    bpp = len(pixels[0][0]) if width else 3
    color = 2 if bpp == 3 else 6

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    flat = bytearray()
    for row in pixels:
        flat.append(0)
        for px in row:
            flat += bytes(px)
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8,
                                         color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(flat)))
            + chunk(b"IEND", b""))


def image_dimensions(payload: bytes) -> dict:
    """Header-only (width, height, format) — the cheap metadata pass a
    100 TB media table runs before any pixel decode: BMP and PNG read
    their fixed-offset headers, GIF87a/89a the logical screen descriptor,
    JPEG a scan for the first frame (SOFn) marker. Pure stdlib, no
    decompression — O(header) per payload."""
    import struct

    raw = bytes(payload)
    if raw[:2] == b"BM" and len(raw) >= 26:
        w, h = struct.unpack_from("<ii", raw, 18)
        return {"format": "bmp", "width": w, "height": abs(h)}
    if raw[:8] == b"\x89PNG\r\n\x1a\n" and len(raw) >= 24:
        w, h = struct.unpack_from(">II", raw, 16)
        return {"format": "png", "width": w, "height": h}
    if raw[:6] in (b"GIF87a", b"GIF89a") and len(raw) >= 10:
        w, h = struct.unpack_from("<HH", raw, 6)
        return {"format": "gif", "width": w, "height": h}
    if raw[:2] == b"\xff\xd8":  # JPEG SOI; scan for a frame header
        pos = 2
        while pos + 4 <= len(raw):
            if raw[pos] != 0xFF:
                break
            marker = raw[pos + 1]
            if marker == 0xFF:  # spec B.1.1.2: 0xFF fill bytes pad markers
                pos += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            seglen = struct.unpack_from(">H", raw, pos + 2)[0]
            # SOF0-15 except DHT/JPG/DAC (C4, C8, CC) carry dimensions.
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if pos + 9 <= len(raw):
                    h, w = struct.unpack_from(">HH", raw, pos + 5)
                    return {"format": "jpeg", "width": w, "height": h}
                break
            pos += 2 + seglen
        raise ValueError("JPEG frame header not found")
    raise NotImplementedError(
        f"unrecognized image magic {raw[:8]!r}")


def decode_wav(payload: bytes) -> dict:
    """Real audio decode — pure stdlib (``wave`` + ``struct``): PCM WAV →
    sample rate, channels, sample width, frame count, duration, and
    peak/RMS amplitude of the first channel (16-bit or 8-bit PCM). The
    audio analog of the BMP/PNG branches: a genuinely decodable format so
    the media path has a non-fake audio test; compressed formats (mp3/
    aac/ogg) still need ffmpeg and stay stubbed."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        nch, sw, rate, nframes = (w.getnchannels(), w.getsampwidth(),
                                  w.getframerate(), w.getnframes())
        frames = w.readframes(nframes)
    if sw == 2:
        samples = struct.unpack(f"<{len(frames) // 2}h", frames)[::nch]
    elif sw == 1:  # 8-bit WAV is unsigned, centered at 128
        samples = tuple(b - 128 for b in frames[::nch])
    else:
        raise NotImplementedError(f"PCM sample width {sw} not supported")
    peak = max((abs(s) for s in samples), default=0)
    rms = ((sum(s * s for s in samples) / len(samples)) ** 0.5
           if samples else 0.0)
    return {"n_channels": nch, "sample_width": sw, "sample_rate": rate,
            "n_frames": nframes,
            "duration_ms": round(nframes * 1000 / rate, 3) if rate else 0.0,
            "peak": peak, "rms": round(rms, 6)}


def encode_wav(samples: list, sample_rate: int = 16000) -> bytes:
    """Inverse of :func:`decode_wav` for tests/tools: mono 16-bit PCM."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


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
