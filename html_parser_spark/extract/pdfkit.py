"""Minimal from-scratch PDF text extraction (north_star PDF-layout branch).

The reference has no PDF path (SURVEY.md §7.6 — north_star addition). This
implements the narrow, deterministic subset our corpus generates and common
simple PDFs use: FlateDecode / plain content streams, ``(...) Tj`` and
``[(..)..] TJ`` show-text operators with balanced-paren literal strings,
standard escapes, octal sequences and backslash line continuations.
Anything outside that subset (hex strings, ``'``/``"`` quote operators,
fonts, ToUnicode CMaps, encryption, image OCR) degrades to returning
whatever show-text operators are recognizable — never raises.
"""

from __future__ import annotations

import re
import zlib
from typing import Optional

__all__ = ["is_pdf", "extract_pdf_text"]

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
# Escape handling per PDF spec §7.3.4.2: named escapes, 1-3 digit octal,
# backslash-EOL line continuation (joins the line: backslash AND EOL
# dropped), and REVERSE SOLIDUS before any other char is ignored (the char
# itself survives).
_ESC_RE = re.compile(rb"\\(\r\n|\r|\n|[0-7]{1,3}|.)", re.DOTALL)

_ESC_MAP = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}

# Jump scan: next byte that can start a string, array bracket, or operator.
_NEXT_RE = re.compile(rb"[()\[\]A-Za-z]")
_OP_RE = re.compile(rb"[A-Za-z']+\*?")


def is_pdf(data: bytes) -> bool:
    return data[:5] == b"%PDF-"


def _unescape(raw: bytes) -> bytes:
    def sub(m: "re.Match[bytes]") -> bytes:
        g = m.group(1)
        if g in _ESC_MAP:
            return _ESC_MAP[g]
        if g in (b"\r\n", b"\r", b"\n"):
            return b""                       # line continuation
        if g.isdigit() and all(48 <= b <= 55 for b in g):
            return bytes([int(g, 8) & 0xFF])
        return g                             # unknown escape: drop backslash
    return _ESC_RE.sub(sub, raw)


def _string_at(content: bytes, i: int) -> tuple[bytes, int]:
    """Scan the literal string starting at ``content[i] == '('`` with
    BALANCED unescaped parens (legal per spec and common in real writers —
    a regex class cannot express this). Returns (raw-with-escapes, next
    index past the closing paren)."""
    n = len(content)
    j = i + 1
    depth = 1
    buf = bytearray()
    while j < n:
        b = content[j]
        if b == 0x5C and j + 1 < n:          # backslash: keep escape pair
            buf += content[j:j + 2]
            j += 2
            continue
        if b == 0x28:                        # (
            depth += 1
        elif b == 0x29:                      # )
            depth -= 1
            if depth == 0:
                return bytes(buf), j + 1
        buf.append(b)
        j += 1
    return bytes(buf), n                     # unterminated: best effort


def _show_text_lines(content: bytes) -> list[str]:
    """One pass over a content stream: every ``(…) Tj`` line and every
    ``[ … ] TJ`` array (strings concatenated, kern numbers ignored), in
    document order."""
    lines: list[str] = []
    arr_parts: Optional[list[str]] = None    # inside [ … ] when not None
    last_str: Optional[str] = None
    n = len(content)
    i = 0
    search = _NEXT_RE.search
    while i < n:
        m = search(content, i)
        if m is None:
            break
        i = m.start()
        c = content[i]
        if c == 0x28:                        # ( literal string
            raw, i = _string_at(content, i)
            txt = _unescape(raw).decode("latin-1")
            if arr_parts is not None:
                arr_parts.append(txt)
            else:
                last_str = txt
        elif c == 0x5B:                      # [
            arr_parts = []
            i += 1
        elif c == 0x5D:                      # ] — emit on a following TJ
            closed, arr_parts = arr_parts, None
            i += 1
            om = _OP_RE.search(content, i)
            if (om is not None and om.group(0) == b"TJ" and closed
                    and not content[i:om.start()].strip()):
                lines.append("".join(closed))
                i = om.end()
        else:                                # operator word
            om = _OP_RE.match(content, i)
            if om.group(0) == b"Tj" and last_str is not None:
                lines.append(last_str)
                last_str = None
            i = om.end()
    return lines


def extract_pdf_text(data: bytes) -> str:
    """Text of all recognizable show-text ops, one line per Tj/TJ."""
    lines: list[str] = []
    for m in _STREAM_RE.finditer(data):
        payload = m.group(1)
        content = None
        # The lazy stream regex can steal a payload-final 0x0D (or 0x0D0A)
        # into its EOL-before-endstream match — ~1/256 deflate payloads end
        # in 0x0D (adler32 low byte) and would otherwise silently extract
        # as ''. Retry with the candidate stolen bytes re-appended.
        for tail in (b"", b"\r", b"\r\n"):
            try:
                content = zlib.decompress(payload + tail)
                break
            except zlib.error:
                continue
        if content is None:
            content = payload                # uncompressed stream
        lines.extend(_show_text_lines(content))
    return "\n".join(ln for ln in lines if ln.strip())
