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

__all__ = ["score_lines", "main_text", "text_and_scored", "select_content"]

_BOILER_CONTAINERS = frozenset("nav footer header aside form".split())
_WS_RE = re.compile(r"\s+")

MIN_CONTENT_CHARS = 25
MAX_LINK_DENSITY = 0.34
MIN_CONT_CHARS = 8


def score_lines(dom: FlatDOM) -> list[tuple[str, int, int, bool]]:
    """Segment into lines → (text, n_chars, n_link_chars, in_boiler_container).

    One pass; ancestry flags (under <a> / boiler container / excluded) are
    tracked as counters on the open-element stack instead of per-node flag
    arrays — no O(n) pre-pass, and the whitespace-collapse on text pieces is
    only computed when a flag is actually set (link/boiler text is a small
    minority of content bytes on real pages).
    """
    n = len(dom)
    tags = dom.tags
    depth = dom.depth
    texts = dom.texts

    lines: list[tuple[str, int, int, bool]] = []
    buf: list[str] = []
    buf_link = 0
    buf_boiler = False
    # (depth, is_block, d_a, d_boiler, d_excl) — d_* are 0/1 contributions.
    stack: list[tuple[int, bool, int, int, int]] = []
    in_a = in_boiler = in_excl = 0

    def flush() -> None:
        nonlocal buf_link, buf_boiler
        if buf:
            line = "".join(buf)
            if (not line.isascii() or "  " in line or "\n" in line
                    or "\t" in line or "\r" in line or "\f" in line
                    or "\v" in line):
                line = _WS_RE.sub(" ", line)
            line = line.strip()
            if line:
                lines.append((line, len(line), min(buf_link, len(line)), buf_boiler))
            del buf[:]
            buf_link = 0
            buf_boiler = False

    for i in range(1, n):
        d = depth[i]
        while stack and stack[-1][0] >= d:
            _, was_block, d_a, d_boiler, d_excl = stack.pop()
            in_a -= d_a
            in_boiler -= d_boiler
            in_excl -= d_excl
            if was_block:
                flush()
        t = tags[i]
        if t == TEXT:
            if not in_excl:
                piece = texts[i] or ""
                buf.append(piece)
                if in_a or in_boiler:
                    stripped = _WS_RE.sub(" ", piece).strip()
                    if in_a:
                        buf_link += len(stripped)
                    if in_boiler and stripped:
                        buf_boiler = True
        elif t == COMMENT:
            continue
        elif t == "br":
            flush()
        else:
            is_block = t in BLOCK_TAGS
            if is_block:
                flush()
            d_a = 1 if t == "a" else 0
            d_boiler = 1 if t in _BOILER_CONTAINERS else 0
            d_excl = 1 if t in EXCLUDED_TAGS else 0
            in_a += d_a
            in_boiler += d_boiler
            in_excl += d_excl
            stack.append((d, is_block, d_a, d_boiler, d_excl))
    while stack:
        _, was_block, d_a, d_boiler, d_excl = stack.pop()
        in_a -= d_a
        in_boiler -= d_boiler
        in_excl -= d_excl
        if was_block:
            flush()
    flush()
    return lines


def text_and_scored(dom: FlatDOM) -> tuple[str, list[tuple[str, int, int, bool]]]:
    """One traversal producing BOTH the TEXT-SPEC v1 text and the
    BOILER-SPEC v1 scored lines.

    ``extract_text`` and ``score_lines`` walk the same arrays with slightly
    different flush disciplines (TEXT-SPEC ignores excluded-block
    boundaries; BOILER-SPEC flushes on them) — running them separately
    costs a second full traversal per page (~10% of the kernel). This
    merged pass keeps two line buffers and is verified equivalent to the
    two single-purpose functions by tests/test_extract.py."""
    n = len(dom)
    tags = dom.tags
    depth = dom.depth
    texts = dom.texts

    t_lines: list[str] = []
    s_lines: list[tuple[str, int, int, bool]] = []
    buf_t: list[str] = []
    buf_s: list[str] = []
    buf_link = 0
    buf_boiler = False
    stack: list[tuple[int, bool, bool, int, int]] = []
    in_a = in_boiler = excluded = 0
    ws_sub = _WS_RE.sub

    def _collapse(line: str) -> str:
        if (not line.isascii() or "  " in line or "\n" in line
                or "\t" in line or "\r" in line or "\f" in line
                or "\v" in line):
            line = ws_sub(" ", line)
        return line.strip()

    def flush_t() -> None:
        if buf_t:
            line = _collapse("".join(buf_t))
            del buf_t[:]
            if line:
                t_lines.append(line)

    def flush_s() -> None:
        nonlocal buf_link, buf_boiler
        if buf_s:
            line = _collapse("".join(buf_s))
            del buf_s[:]
            if line:
                s_lines.append((line, len(line), min(buf_link, len(line)),
                                buf_boiler))
            buf_link = 0
            buf_boiler = False

    # Both buffers receive identical text pieces; they diverge only when a
    # boundary flushes the scored side alone (excluded block). While they
    # are byte-identical (`same`), a joint flush collapses ONCE and feeds
    # both outputs — on content-heavy pages this halves the collapse work.
    # Equivalence to the two single-purpose walks stays pinned by
    # tests/test_extract.py (incl. hypothesis fuzz).
    same = True

    def flush_pair(do_t: bool) -> None:
        nonlocal same, buf_link, buf_boiler
        if do_t and same:
            if buf_s:
                line = _collapse("".join(buf_s))
                del buf_s[:]
                del buf_t[:]
                if line:
                    s_lines.append((line, len(line),
                                    min(buf_link, len(line)), buf_boiler))
                    t_lines.append(line)
                buf_link = 0
                buf_boiler = False
            return
        if buf_s:
            flush_s()
        if do_t:
            if buf_t:
                flush_t()
            same = True
        else:
            same = not buf_t

    for i in range(1, n):
        d = depth[i]
        while stack and stack[-1][0] >= d:
            _, was_block, was_excl, d_a, d_boiler = stack.pop()
            in_a -= d_a
            in_boiler -= d_boiler
            if was_excl:
                excluded -= 1
            if was_block and (buf_s or buf_t):
                flush_pair(not was_excl and not excluded)
        t = tags[i]
        if t == TEXT:
            if not excluded:
                piece = texts[i] or ""
                buf_t.append(piece)
                buf_s.append(piece)
                if in_a or in_boiler:
                    stripped = ws_sub(" ", piece).strip()
                    if in_a:
                        buf_link += len(stripped)
                    if in_boiler and stripped:
                        buf_boiler = True
        elif t == COMMENT:
            continue
        elif t == "br":
            (buf_s or buf_t) and flush_pair(not excluded)
        else:
            is_excl = t in EXCLUDED_TAGS
            is_block = t in BLOCK_TAGS
            if is_block and (buf_s or buf_t):
                flush_pair(not is_excl and not excluded)
            d_a = 1 if t == "a" else 0
            d_boiler = 1 if t in _BOILER_CONTAINERS else 0
            in_a += d_a
            in_boiler += d_boiler
            if is_excl:
                excluded += 1
            stack.append((d, is_block, is_excl, d_a, d_boiler))
    while stack:
        _, was_block, was_excl, d_a, d_boiler = stack.pop()
        in_a -= d_a
        in_boiler -= d_boiler
        if was_excl:
            excluded -= 1
        if was_block and (buf_s or buf_t):
            flush_pair(not was_excl and not excluded)
    (buf_s or buf_t) and flush_pair(True)
    return "\n".join(t_lines), s_lines


def select_content(lines: list[tuple[str, int, int, bool]]) -> str:
    """BOILER-SPEC v1 content selection over scored lines."""
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


def main_text(dom: FlatDOM) -> str:
    """BOILER-SPEC v1 content selection."""
    return select_content(score_lines(dom))
