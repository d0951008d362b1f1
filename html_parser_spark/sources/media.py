"""Multimodal media table: image/audio/video as opaque ``binary`` columns
with typed metadata (SURVEY-adjacent training-data op; no counterpart in the
reference, which is text/HTML-only).

The sandbox has no image/audio codecs, so payloads are *deterministic fakes*
derived from ``documents.doc_id`` (md5-hex bytes — reproducible in ANSI SQL,
which is what lets the driver's DuckDB oracle check the Spark plumbing
end-to-end). The schema, partitioning, and batch shape are exactly what a
real WARC-media table would use: the decode kernel in
``functions/mediaops.py`` swaps to PIL/ffmpeg behind an import guard without
touching the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["MEDIA_KINDS", "media_from_documents"]

MEDIA_KINDS = ["image", "audio", "video"]


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive the media table: one row per document.

    payload  = utf-8 bytes of md5(doc_id) repeated (1 + doc_id % 4) times
    kind     = round-robin image/audio/video on doc_id % 3
    meta     = typed struct (format, width, height, duration_ms) — the
               "typed metadata" carried alongside the opaque bytes
    """
    did = F.col("doc_id")
    hex_ = F.md5(F.encode(did.cast("string"), "utf-8"))
    payload = F.encode(F.repeat(hex_, (did % 4 + 1).cast("int")), "utf-8")
    kind = (
        F.when(did % 3 == 0, F.lit("image"))
        .when(did % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    meta = F.struct(
        F.when(kind == "image", F.lit("png"))
        .when(kind == "audio", F.lit("wav"))
        .otherwise(F.lit("mp4")).alias("format"),
        (16 * (did % 64 + 1)).cast("int").alias("width"),
        (16 * (did % 48 + 1)).cast("int").alias("height"),
        (250 * (did % 240 + 1)).cast("int").alias("duration_ms"),
    )
    return docs.select(
        did.alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("meta"),
    )
