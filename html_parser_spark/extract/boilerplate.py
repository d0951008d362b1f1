"""Main-content extraction for pages with no site rule (north_star).

Boilerpipe/trafilatura-style scoring (Kohlschütter et al., WSDM 2010
"Boilerplate Detection using Shallow Text Features" — public method) over the
flat node arrays: segment the page into text *lines* (same block segmentation
as TEXT-SPEC v1), score each line by text length and link-character density,
and keep content-like lines. No per-node Python objects: one forward pass
computes under-link / under-boilerplate-container flags using the
parents-before-children property of the flat array (parent[i] < i always).

BOILER-SPEC v1 (deterministic, pinned for goldens):
  * Lines inside nav/footer/header/aside/form subtrees are boilerplate.
  * A line is content iff link_density < 0.34 AND text length ≥ 25 chars,
    OR (length ≥ 8, zero link chars, and adjacent to a content line —
    one-pass "continuation" smoothing, applied forward then backward).
  * Output = content lines joined with "\\n".
"""

from __future__ import annotations

import re

from ..htmlkit.tokenizer import COMMENT, TEXT, FlatDOM
from ..htmlkit.text import BLOCK_TAGS, EXCLUDED_TAGS

__all__ = ["score_lines", "main_text"]

_BOILER_CONTAINERS = frozenset("nav footer header aside form".split())
_WS_RE = re.compile(r"\s+")

MIN_CONTENT_CHARS = 25
MAX_LINK_DENSITY = 0.34
MIN_CONT_CHARS = 8


def score_lines(dom: FlatDOM) -> list[tuple[str, int, int, bool]]:
    """Segment into lines → (text, n_chars, n_link_chars, in_boiler_container)."""
    n = len(dom)
    tags = dom.tags
    depth = dom.depth
    parent = dom.parent
    texts = dom.texts

    # Forward flag propagation (parents precede children in the array).
    under_a = bytearray(n)
    under_boiler = bytearray(n)
    under_excl = bytearray(n)
    for i in range(1, n):
        p = parent[i]
        t = tags[i]
        under_a[i] = under_a[p] or t == "a"
        under_boiler[i] = under_boiler[p] or t in _BOILER_CONTAINERS
        under_excl[i] = under_excl[p] or t in EXCLUDED_TAGS

    lines: list[tuple[str, int, int, bool]] = []
    buf: list[str] = []
    buf_link = 0
    buf_boiler = False
    stack: list[tuple[int, bool]] = []  # (depth, is_block)

    def flush() -> None:
        nonlocal buf_link, buf_boiler
        if buf:
            line = _WS_RE.sub(" ", "".join(buf)).strip()
            if line:
                lines.append((line, len(line), min(buf_link, len(line)), buf_boiler))
            del buf[:]
            buf_link = 0
            buf_boiler = False

    for i in range(1, n):
        d = depth[i]
        while stack and stack[-1][0] >= d:
            _, was_block = stack.pop()
            if was_block:
                flush()
        t = tags[i]
        if t == TEXT:
            if not under_excl[i]:
                piece = texts[i] or ""
                buf.append(piece)
                stripped = _WS_RE.sub(" ", piece).strip()
                if under_a[i]:
                    buf_link += len(stripped)
                if under_boiler[i] and stripped:
                    buf_boiler = True
        elif t == COMMENT:
            continue
        elif t == "br":
            flush()
        else:
            is_block = t in BLOCK_TAGS
            if is_block:
                flush()
            stack.append((d, is_block))
    while stack:
        _, was_block = stack.pop()
        if was_block:
            flush()
    flush()
    return lines


def main_text(dom: FlatDOM) -> str:
    """BOILER-SPEC v1 content selection."""
    lines = score_lines(dom)
    n = len(lines)
    keep = [False] * n
    for i, (txt, chars, link_chars, boiler) in enumerate(lines):
        if boiler:
            continue
        if chars >= MIN_CONTENT_CHARS and link_chars / max(chars, 1) < MAX_LINK_DENSITY:
            keep[i] = True
    # Continuation smoothing: short linkless lines adjacent to content.
    changed = True
    while changed:
        changed = False
        for i, (txt, chars, link_chars, boiler) in enumerate(lines):
            if keep[i] or boiler or link_chars or chars < MIN_CONT_CHARS:
                continue
            if (i > 0 and keep[i - 1]) or (i + 1 < n and keep[i + 1]):
                keep[i] = True
                changed = True
    return "\n".join(lines[i][0] for i in range(n) if keep[i])
