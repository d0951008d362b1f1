"""Minimal from-scratch PDF text extraction (north_star PDF-layout branch).

The reference has no PDF path (SURVEY.md §7.6 — north_star addition). This
implements the narrow, deterministic subset our corpus generates and common
simple PDFs use: FlateDecode / plain content streams, BT..ET text blocks,
``(...) Tj`` and ``[(..)..] TJ`` show-text operators, standard escapes and
octal sequences. Anything outside that subset degrades to returning whatever
text operators are recognizable — never raises.

Real-world PDF decoding (fonts, ToUnicode CMaps, encryption, image OCR) is
out of scope for this container and is stubbed behind
:func:`extract_pdf_layout`'s ``NotImplementedError`` branch markers.
"""

from __future__ import annotations

import re
import zlib
from typing import Optional

__all__ = ["is_pdf", "extract_pdf_text"]

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_TJ_RE = re.compile(rb"\(((?:\\.|[^\\()])*)\)\s*Tj")
_TJ_ARRAY_RE = re.compile(rb"\[((?:\\.|[^\]])*)\]\s*TJ", re.DOTALL)
# Combined show-text scan: one pass keeps Tj and TJ in document order
# (separate finditer passes would emit all Tj lines before any TJ line).
_SHOW_RE = re.compile(
    rb"\(((?:\\.|[^\\()])*)\)\s*Tj|\[((?:\\.|[^\]])*)\]\s*TJ", re.DOTALL)
_STR_RE = re.compile(rb"\(((?:\\.|[^\\()])*)\)")
_ESC_RE = re.compile(rb"\\([nrtbf()\\]|[0-7]{1,3})")

_ESC_MAP = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def is_pdf(data: bytes) -> bool:
    return data[:5] == b"%PDF-"


def _unescape(raw: bytes) -> bytes:
    def sub(m: "re.Match[bytes]") -> bytes:
        g = m.group(1)
        if g in _ESC_MAP:
            return _ESC_MAP[g]
        return bytes([int(g, 8) & 0xFF])
    return _ESC_RE.sub(sub, raw)


def extract_pdf_text(data: bytes) -> str:
    """Text of all recognizable show-text ops, one line per Tj/TJ."""
    lines: list[str] = []
    for m in _STREAM_RE.finditer(data):
        payload = m.group(1)
        try:
            content = zlib.decompress(payload)
        except zlib.error:
            content = payload  # uncompressed stream
        for tm in _SHOW_RE.finditer(content):
            if tm.group(1) is not None:                       # (…) Tj
                lines.append(_unescape(tm.group(1)).decode("latin-1"))
            else:                                             # […] TJ
                parts = [_unescape(s.group(1)).decode("latin-1")
                         for s in _STR_RE.finditer(tm.group(2))]
                if parts:
                    lines.append("".join(parts))
    return "\n".join(ln for ln in lines if ln.strip())
