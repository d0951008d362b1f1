"""From-scratch streaming HTML tokenizer + flat DOM builder.

This replaces the reference's ``BeautifulSoup(html, "html.parser")`` full-tree
parse (see /root/reference/1.samsclub/parse_samsclub.py:207,
costco/parse_costco.py:37, bestbuy/parse_bestbuy_detai.py:17-18) with a
single-pass tokenizer whose output is a **flattened DOM node array** —
parallel arrays (tag id, parent, depth, text, attrs) instead of per-node
Python objects — so downstream selector matching and boilerplate scoring run
as vectorized kernels over numpy arrays inside Arrow/pandas UDF batches.

Design notes (scale):
  * The hot loop is one compiled master regex (``_TOKEN_RE``) driven by
    ``finditer`` — the per-character work happens in CPython's C regex
    engine, not in Python bytecode.
  * Raw-text elements (script/style/textarea/title) are skipped to their
    closing tag with a single ``str.find`` — no tokenization of JS payloads,
    which on real retail pages is >80% of the bytes.
  * Entity decoding (``html.unescape``) is applied lazily: only to text that
    actually contains ``&`` and only for text nodes / attribute values.
"""

from __future__ import annotations

import re
from html import unescape
from typing import Optional

import numpy as np

__all__ = ["FlatDOM", "tokenize", "TEXT", "COMMENT"]

# Sentinel tag names for non-element nodes.
TEXT = "#text"
COMMENT = "#comment"

# Void elements never take children (HTML5 spec list).
VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Raw-text elements: content is not markup; runs to the matching close tag.
RAWTEXT_ELEMENTS = frozenset(("script", "style", "textarea", "title"))

# Block-ish elements used for implied-close of <p> (subset of HTML5 spec).
_P_CLOSERS = frozenset(
    "address article aside blockquote details div dl fieldset figcaption figure "
    "footer form h1 h2 h3 h4 h5 h6 header hr main menu nav ol p pre section "
    "table ul".split()
)

# Implied sibling closes: opening `key` closes an open `value` element.
_SIBLING_CLOSERS = {
    "li": frozenset(("li",)),
    "tr": frozenset(("tr", "td", "th")),
    "td": frozenset(("td", "th")),
    "th": frozenset(("td", "th")),
    "option": frozenset(("option",)),
    "dd": frozenset(("dd", "dt")),
    "dt": frozenset(("dd", "dt")),
    "thead": frozenset(("tr", "td", "th")),
    "tbody": frozenset(("tr", "td", "th", "thead")),
    "tfoot": frozenset(("tr", "td", "th", "tbody")),
}

# Union of tags that can trigger ANY implied close — checked inline in the
# hot loop so _implied_closes is only called when it could matter.
_IMPLIED_TRIGGERS = _P_CLOSERS | frozenset(_SIBLING_CLOSERS)

_TOKEN_RE = re.compile(
    r"""
      <!--(?P<comment>.*?)(?:-->|\Z)
    | <!\[CDATA\[(?P<cdata>.*?)(?:\]\]>|\Z)
    | <!(?P<decl>[^>]*)>
    | <\?(?P<pi>[^>]*)>?
    | </\s*(?P<close>[a-zA-Z][a-zA-Z0-9:_-]*)\s*[^>]*>
    | <(?P<open>[a-zA-Z][a-zA-Z0-9:_-]*)
        (?P<attrs>(?:"[^"]*"|'[^']*'|[^>"'])*)
      (?P<selfclose>/?)>
    """,
    re.DOTALL | re.VERBOSE,
)

_ATTR_RE = re.compile(
    r"""([a-zA-Z_:@][-a-zA-Z0-9_:.@]*)
        (?:\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]*)))?""",
    re.VERBOSE,
)



class FlatDOM:
    """Flattened DOM: parallel arrays over nodes in document order.

    Node 0 is a synthetic root. Element nodes carry ``attrs`` dicts; text
    and comment nodes carry ``texts`` payloads. Numpy views (``parent_arr``,
    ``depth_arr``) back the vectorized selector / boilerplate kernels.
    """

    __slots__ = ("tags", "parent", "depth", "attrs", "texts", "script_ids",
                 "_parent_arr", "_depth_arr", "_children", "_tag_index")

    def __init__(self) -> None:
        self.tags: list[str] = ["#root"]
        self.parent: list[int] = [-1]
        self.depth: list[int] = [0]
        self.attrs: list[Optional[dict]] = [None]
        self.texts: list[Optional[str]] = [None]
        # <script> element ids recorded during tokenization so carrier
        # dispatch (collect_scripts) never re-scans the whole node array.
        self.script_ids: list[int] = []
        self._parent_arr: Optional[np.ndarray] = None
        self._depth_arr: Optional[np.ndarray] = None
        self._children: Optional[list[list[int]]] = None
        # tag -> element ids (doc order), built lazily on first select();
        # turns each selector scan from O(nodes) into O(candidates).
        self._tag_index: Optional[dict] = None

    # -- construction ------------------------------------------------------
    def _add(self, tag: str, parent: int, depth: int,
             attrs: Optional[dict] = None, text: Optional[str] = None) -> int:
        self.tags.append(tag)
        self.parent.append(parent)
        self.depth.append(depth)
        self.attrs.append(attrs)
        self.texts.append(text)
        return len(self.tags) - 1

    # -- array views -------------------------------------------------------
    def __len__(self) -> int:
        return len(self.tags)

    @property
    def parent_arr(self) -> np.ndarray:
        if self._parent_arr is None or len(self._parent_arr) != len(self.parent):
            self._parent_arr = np.asarray(self.parent, dtype=np.int32)
        return self._parent_arr

    @property
    def depth_arr(self) -> np.ndarray:
        if self._depth_arr is None or len(self._depth_arr) != len(self.depth):
            self._depth_arr = np.asarray(self.depth, dtype=np.int32)
        return self._depth_arr

    def children(self, i: int) -> list[int]:
        if self._children is None:
            ch: list[list[int]] = [[] for _ in range(len(self.tags))]
            for node, par in enumerate(self.parent):
                if par >= 0:
                    ch[par].append(node)
            self._children = ch
        return self._children[i]

    # -- convenience accessors (used by rules, not hot loops) --------------
    def attrs_of(self, i: int) -> Optional[dict]:
        """Attr dict for node i, parsing the raw attribute substring on
        first access (lazy: most elements' attrs are never read, so the
        tokenizer stores the raw string and we memoize the parse here)."""
        a = self.attrs[i]
        if type(a) is str:
            a = _parse_attrs(a)
            self.attrs[i] = a
        return a

    def attr(self, i: int, name: str) -> Optional[str]:
        a = self.attrs_of(i)
        return a.get(name) if a else None

    def node_text(self, i: int) -> str:
        """Concatenated descendant text of node i (whitespace as-is)."""
        out: list[str] = []
        stack = [i]
        while stack:
            n = stack.pop()
            if self.tags[n] == TEXT:
                out.append(self.texts[n] or "")
            else:
                stack.extend(reversed(self.children(n)))
        return "".join(out)

    def child_texts(self, i: int) -> list[str]:
        """Direct text-node children of i — lxml's ``node/text()`` list
        (each entry one contiguous text run, whitespace preserved)."""
        return [self.texts[k] or "" for k in self.children(i)
                if self.tags[k] == TEXT]

    def descendant_texts(self, i: int) -> list[str]:
        """All text nodes in the subtree of i, document order — lxml's
        ``node//text()`` list."""
        return [self.texts[n] or "" for n in self.iter_descendants(i)
                if self.tags[n] == TEXT]

    def iter_descendants(self, i: int):
        """Yield node ids strictly inside the subtree rooted at i, in doc order."""
        n = len(self.tags)
        d = self.depth[i]
        j = i + 1
        depth = self.depth
        parent = self.parent
        # Document order == array order; subtree ends at first node with
        # depth <= d whose ancestry leaves i. Since siblings may appear at
        # equal depth, walk until depth[j] <= d.
        while j < n and depth[j] > d:
            yield j
            j += 1


def _parse_attrs(raw: str) -> dict:
    if not raw or raw.isspace():
        return {}
    out: dict = {}
    for m in _ATTR_RE.finditer(raw):
        name = m.group(1)
        if not name.islower():
            name = name.lower()
        if name in out:
            continue  # first occurrence wins (browser behavior)
        if m.group(2) is None:
            out[name] = ""
        else:
            # Exactly one of groups 3/4/5 matched; "" collapses harmlessly.
            val = m.group(3) or m.group(4) or m.group(5) or ""
            out[name] = unescape(val) if "&" in val else val
    return out


def tokenize(html: str) -> FlatDOM:
    """Single-pass tokenize + tree build. Never raises on malformed input.

    Hot-loop notes: the five parallel-array appends are inlined at each
    node-emission site onto locally-bound ``list.append`` (a helper call per
    node costs ~15% of tokenize); the open-element stack carries
    (node_id, tag, depth) so no array lookups are needed to place children;
    tag names skip ``.lower()`` when already lowercase (the overwhelmingly
    common case in real markup).
    """
    dom = FlatDOM()
    tags_app = dom.tags.append
    parent_app = dom.parent.append
    depth_app = dom.depth.append
    attrs_app = dom.attrs.append
    texts_app = dom.texts.append
    unesc = unescape

    # Open-element stack of (node_id, tag, depth).
    stack = [(0, "#root", 0)]
    top = stack[-1]
    pos = 0
    n = len(html)
    find = _TOKEN_RE.search
    node_count = 1  # root

    while pos < n:
        m = find(html, pos)
        if m is None:
            raw = html[pos:]
            tags_app(TEXT)
            parent_app(top[0])
            depth_app(top[2] + 1)
            attrs_app(None)
            texts_app(unesc(raw) if "&" in raw else raw)
            node_count += 1
            break
        start, end = m.span()
        if start > pos:
            raw = html[pos:start]
            tags_app(TEXT)
            parent_app(top[0])
            depth_app(top[2] + 1)
            attrs_app(None)
            texts_app(unesc(raw) if "&" in raw else raw)
            node_count += 1
        pos = end

        # Branch on lastindex — one C call replaces up to five named
        # m.group() probes per token (groups: 1 comment, 2 cdata, 3 decl,
        # 4 pi, 5 close; 8 = selfclose, which always participates for an
        # open tag, so lastindex==8 <=> open).
        li = m.lastindex
        if li == 8:
            open_tag, raw_attrs, selfclose = m.group(6, 7, 8)
            tag = open_tag if open_tag.islower() else open_tag.lower()
            if tag in _IMPLIED_TRIGGERS and len(stack) > 1:
                # _implied_closes inlined (hot: fires on every p/div/li/…).
                closers = _SIBLING_CLOSERS.get(tag)
                if closers:
                    while len(stack) > 1 and stack[-1][1] in closers:
                        stack.pop()
                elif stack[-1][1] == "p":  # tag is in _P_CLOSERS
                    stack.pop()
                top = stack[-1]
            pdepth = top[2]
            tags_app(tag)
            parent_app(top[0])
            depth_app(pdepth + 1)
            attrs_app(raw_attrs if raw_attrs else {})  # lazy: see attrs_of
            texts_app(None)
            node = node_count
            node_count += 1
            if tag == "script":
                dom.script_ids.append(node)
            if not (selfclose or tag in VOID_ELEMENTS):
                if tag in RAWTEXT_ELEMENTS:
                    # Raw text: skip to the matching close tag with str.find.
                    idx = _find_ci(html, "</" + tag, pos)
                    if idx == -1:
                        raw = html[pos:]
                        pos = n
                    else:
                        raw = html[pos:idx]
                        gt = html.find(">", idx)
                        pos = n if gt == -1 else gt + 1
                    if raw:
                        tags_app(TEXT)
                        parent_app(node)
                        depth_app(pdepth + 2)
                        attrs_app(None)
                        if tag in ("script", "style"):
                            texts_app(raw)
                        else:
                            texts_app(unesc(raw) if "&" in raw else raw)
                        node_count += 1
                else:
                    top = (node, tag, pdepth + 1)
                    stack.append(top)
            continue

        if li == 5:
            close_tag = m.group(5)
            tag = close_tag if close_tag.islower() else close_tag.lower()
            # Pop to the matching open tag; ignore unmatched closes —
            # except '</p>', which HTML5 turns into an empty paragraph
            # (a block boundary the text spec must see; stray '</p>' is
            # ubiquitous in real tag soup).
            for k in range(len(stack) - 1, 0, -1):
                if stack[k][1] == tag:
                    del stack[k:]
                    top = stack[-1]
                    break
            else:
                if tag == "p":
                    tags_app("p")
                    parent_app(top[0])
                    depth_app(top[2] + 1)
                    attrs_app({})
                    texts_app(None)
                    node_count += 1
            continue

        if li == 1:
            tags_app(COMMENT)
            parent_app(top[0])
            depth_app(top[2] + 1)
            attrs_app(None)
            texts_app(m.group(1))
            node_count += 1
            continue

        # CDATA sections, doctype, processing instructions: dropped
        # (HTML5 treats CDATA outside foreign content as bogus comment).

    return dom


def _find_ci(haystack: str, needle: str, start: int) -> int:
    """Case-insensitive find without lowering the whole page repeatedly."""
    idx = haystack.find(needle, start)
    if idx != -1:
        return idx
    # Fallback: case-insensitive scan (rare: '</SCRIPT>' etc.)
    m = re.compile(re.escape(needle), re.IGNORECASE).search(haystack, start)
    return m.start() if m else -1


def _implied_closes(stack: list, tag: str) -> None:
    """HTML5-ish implied end tags: <li><li>, <p><div>, table cells, …"""
    if not stack or len(stack) == 1:
        return
    top = stack[-1][1]
    closers = _SIBLING_CLOSERS.get(tag)
    if closers:
        while len(stack) > 1 and stack[-1][1] in closers:
            stack.pop()
        return
    if tag in _P_CLOSERS and top == "p":
        stack.pop()
