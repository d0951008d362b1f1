"""Independent TEXT-SPEC v1 oracle built on stdlib ``html.parser``.

Deliberately a *different* implementation from the engine's regex tokenizer
(html_parser_spark/htmlkit/text.py): the pipeline's extracted text must match
this byte-for-byte per url (BASELINE.json input_hint), which catches
tokenizer bugs the engine couldn't find by agreeing with itself.

Tag-soup semantics mirrored from HTML5 (and pinned by fuzz in
tests/test_adversarial.py):
- textarea/title are RCDATA: their content is text (markup not parsed),
  entities decoded — stdlib's default CDATA set is only script/style, so
  both are added here and their data entity-decoded to match;
- an unmatched close tag is ignored (no line boundary), EXCEPT '</p>',
  which HTML5 turns into an empty paragraph (a block boundary);
- a matched close pops every element above it; popped blocks flush only
  when not inside an excluded subtree at pop time.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

from html_parser_spark.htmlkit.text import BLOCK_TAGS, EXCLUDED_TAGS
from html_parser_spark.htmlkit.tokenizer import VOID_ELEMENTS

_WS_RE = re.compile(r"\s+")

_RCDATA = ("textarea", "title")


class _TextOracle(HTMLParser):
    CDATA_CONTENT_ELEMENTS = ("script", "style") + _RCDATA

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.lines: list[str] = []
        self.buf: list[str] = []
        self.excl = 0
        self.stack: list[str] = []

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
        if tag not in VOID_ELEMENTS:
            self.stack.append(tag)

    def handle_startendtag(self, tag, attrs):
        if tag == "br" or (tag in BLOCK_TAGS and not self.excl):
            if not self.excl:
                self._flush()

    def handle_endtag(self, tag):
        # Pop to the matching open (engine tokenizer semantics); an
        # unmatched close is ignored except the HTML5 '</p>' empty-
        # paragraph rule.
        for k in range(len(self.stack) - 1, -1, -1):
            if self.stack[k] == tag:
                popped = self.stack[k:]
                del self.stack[k:]
                for t in reversed(popped):   # top-down, like the engine
                    if t in EXCLUDED_TAGS:
                        if self.excl:
                            self.excl -= 1
                    elif t in BLOCK_TAGS and not self.excl:
                        self._flush()
                return
        if tag == "p" and not self.excl:
            self._flush()                    # empty paragraph boundary

    def handle_data(self, data):
        if not self.excl:
            if self.cdata_elem in _RCDATA:
                data = unescape(data)        # RCDATA decodes entities
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
