"""Byte-exact plain-text extraction over a FlatDOM.

The reference strips tags with ``soup.get_text()``
(/root/reference/1.samsclub/parse_samsclub.py:45-50,
bedbathbeyond/parse_bedbathbeyond.py:87-89). That function's whitespace
behavior is bs4-defined; since goldens here are produced by our own oracle
(SURVEY.md §5.2), we pin an explicit spec — **TEXT-SPEC v1** — implemented
twice: here over flat arrays (engine) and in ``tests/oracle.py`` over stdlib
``html.parser`` events (independent check).

TEXT-SPEC v1
============
1. Subtrees under ``script style template noscript iframe svg head`` and
   comment nodes contribute no text.
2. Text nodes accumulate into the current line buffer (entity-decoded).
3. Opening OR closing a *block* element (``_BLOCK_TAGS``) or ``<br>``
   terminates the current line: the buffer is concatenated, runs of
   whitespace collapsed to a single space, stripped; non-empty results are
   emitted as one line.
4. Output = lines joined with ``"\\n"``.
"""

from __future__ import annotations

import re

from .tokenizer import COMMENT, TEXT, FlatDOM

__all__ = ["extract_text", "BLOCK_TAGS", "EXCLUDED_TAGS"]

EXCLUDED_TAGS = frozenset(
    "script style template noscript iframe svg head".split()
)

BLOCK_TAGS = frozenset(
    """address article aside blockquote body caption dd details div dl dt
    fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hr html
    li main menu nav ol optgroup option p pre section select table tbody td
    tfoot th thead tr ul""".split()
)
_BLOCK_TAGS = BLOCK_TAGS

_WS_RE = re.compile(r"\s+")


def extract_text(dom: FlatDOM) -> str:
    """TEXT-SPEC v1 extraction over the flat node arrays, one pass."""
    tags = dom.tags
    depth = dom.depth
    texts = dom.texts
    n = len(tags)

    lines: list[str] = []
    buf: list[str] = []
    # Stack of (depth, is_block) for open elements we care about; plus an
    # exclusion counter driven by the same stack.
    stack: list[tuple[int, bool, bool]] = []  # (depth, is_block, is_excluded)
    excluded = 0

    def flush() -> None:
        if buf:
            line = "".join(buf)
            del buf[:]
            # Fast path: collapse only when a whitespace run can exist —
            # most content lines carry single spaces only, and the C
            # substring scans are ~free next to the regex sub.
            if (not line.isascii() or "  " in line or "\n" in line
                    or "\t" in line or "\r" in line or "\f" in line
                    or "\v" in line):
                line = _WS_RE.sub(" ", line)
            line = line.strip()
            if line:
                lines.append(line)

    for i in range(1, n):
        d = depth[i]
        # Close any elements whose subtree ended before node i.
        while stack and stack[-1][0] >= d:
            _, was_block, was_excluded = stack.pop()
            if was_excluded:
                excluded -= 1
            elif was_block and not excluded:
                # blocks INSIDE an excluded subtree contribute no line
                # boundary either (TEXT-SPEC rule 1; matches the oracle)
                flush()
        tag = tags[i]
        if tag == TEXT:
            if not excluded:
                buf.append(texts[i] or "")
        elif tag == COMMENT:
            continue
        else:
            is_excl = tag in EXCLUDED_TAGS
            is_block = tag in _BLOCK_TAGS
            if tag == "br":
                if not excluded:
                    flush()
                continue  # void: no stack entry
            if is_excl:
                excluded += 1
                stack.append((d, is_block, True))
            else:
                if is_block and not excluded:
                    flush()
                stack.append((d, is_block, False))

    # Drain remaining opens.
    while stack:
        _, was_block, was_excluded = stack.pop()
        if was_excluded:
            excluded -= 1
        elif was_block and not excluded:
            flush()
    flush()
    return "\n".join(lines)
