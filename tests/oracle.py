"""Independent TEXT-SPEC v1 oracle built on stdlib ``html.parser``.

Deliberately a *different* implementation from the engine's regex tokenizer
(html_parser_spark/htmlkit/text.py): the pipeline's extracted text must match
this byte-for-byte per url (BASELINE.json input_hint), which catches
tokenizer bugs the engine couldn't find by agreeing with itself.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from html_parser_spark.htmlkit.text import BLOCK_TAGS, EXCLUDED_TAGS

_WS_RE = re.compile(r"\s+")


class _TextOracle(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.lines: list[str] = []
        self.buf: list[str] = []
        self.excl = 0

    def _flush(self) -> None:
        if self.buf:
            line = _WS_RE.sub(" ", "".join(self.buf)).strip()
            del self.buf[:]
            if line:
                self.lines.append(line)

    def handle_starttag(self, tag, attrs):
        if tag == "br":
            if not self.excl:
                self._flush()
            return
        if tag in EXCLUDED_TAGS:
            self.excl += 1
        elif tag in BLOCK_TAGS and not self.excl:
            self._flush()

    def handle_startendtag(self, tag, attrs):
        if tag == "br" or (tag in BLOCK_TAGS and not self.excl):
            if not self.excl:
                self._flush()

    def handle_endtag(self, tag):
        if tag in EXCLUDED_TAGS:
            if self.excl:
                self.excl -= 1
        elif tag in BLOCK_TAGS and not self.excl:
            self._flush()

    def handle_data(self, data):
        if not self.excl:
            self.buf.append(data)


def oracle_text(html: str) -> str:
    p = _TextOracle()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    p._flush()
    return "\n".join(p.lines)
