"""Adversarial robustness: the tokenizer never raises on arbitrary input,
and the Spark pipeline returns a status row for every junk page instead of
failing the job (SURVEY.md §2.8 error tolerance; north_rule "never fail").
"""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import given, settings, strategies as st

from html_parser_spark.htmlkit.tokenizer import tokenize, TEXT
from html_parser_spark.htmlkit.text import extract_text
from html_parser_spark.extract.carriers import collect_scripts
from html_parser_spark.rules.profiles import extract_page


# Mix plain unicode with HTML-ish punctuation so tag/attr/entity state
# transitions get hammered, not just escaped text.
_htmlish = st.text(
    alphabet=st.one_of(
        st.characters(blacklist_categories=("Cs",)),
        st.sampled_from(list('<>="&;/!-[]' + "'")),
    ),
    max_size=400,
)


class TestTokenizerFuzz:
    @given(_htmlish)
    @settings(max_examples=300, deadline=None)
    def test_never_raises_and_arrays_consistent(self, s):
        dom = tokenize(s)
        n = len(dom)
        assert len(dom.tags) == len(dom.parent) == len(dom.depth) == n
        assert len(dom.attrs) == len(dom.texts) == n
        # Parent pointers are valid and acyclic (parent strictly earlier).
        for i in range(1, n):
            assert -1 <= dom.parent[i] < i
            assert dom.depth[i] == dom.depth[dom.parent[i]] + 1
        # Text extraction and selection never raise either.
        extract_text(dom)
        collect_scripts(dom)

    @given(_htmlish)
    @settings(max_examples=100, deadline=None)
    def test_extract_page_never_raises(self, s):
        dom = tokenize(s)
        profile, env = extract_page(dom, collect_scripts(dom), "http://x/")
        assert profile is None or isinstance(profile, str)
        assert env is None or isinstance(env, dict)

    @given(st.binary(max_size=300))
    @settings(max_examples=100, deadline=None)
    def test_arbitrary_bytes_decode_path(self, raw):
        # The pipeline decodes with errors="replace"; mirror that here.
        dom = tokenize(raw.decode("utf-8", errors="replace"))
        assert len(dom) >= 1
        assert dom.tags[0] == "#root"


def test_junk_rows_all_get_status(spark):
    """Verify-skill adversarial probe: junk rows through the real
    mapInArrow pipeline — every row must come back with a status."""
    from html_parser_spark.job import pipeline as P

    ts = datetime(2025, 1, 1, tzinfo=timezone.utc)
    rows = [
        ("http://j/1", ts, b"\xff\xfe\x00junk\x80\x81", None, None),
        ("http://j/2", ts, b"", None, "en"),
        ("http://j/3", ts, None, None, "en"),
        ("http://j/4", ts, b"<div>" * 5000, None, "en"),          # deep nest
        ("http://j/5", ts,
         b'<script id="__NEXT_DATA__" type="application/json">'
         b'{"props": {"pageProps": {"initialData": {"data": {"produ',
         None, "en"),                                             # truncated
        ("http://j/6", ts, b"%PDF-1.4\ngarbage-not-really-pdf", None, "en"),
        ("http://j/7", ts, "<p>café ✓</p>".encode(), None, "en"),
    ]
    df = spark.createDataFrame(rows, schema=P.PAGES_SCHEMA)
    out = P.extract_pages(df).collect()
    assert len(out) == len(rows)
    assert all(r.status in ("ok", "no_rule", "error") for r in out)
    by_url = {r.url: r for r in out}
    assert by_url["http://j/3"].status == "error"       # null html
    assert by_url["http://j/4"].status in ("no_rule", "error", "ok")
    assert by_url["http://j/7"].status in ("no_rule", "ok")


# -- well-formed document fuzz: engine text must equal the stdlib oracle ----
#
# The generator only emits HTML5-STABLE nesting (no block inside <p>, no
# implied-close triggers like li/tr/td): the engine applies HTML5 implied
# end tags while the oracle is deliberately naive, so tag-soup inputs
# diverge by design; the spec parity claim is over stable documents (the
# synthetic corpus test covers the realistic-markup side).

_BLOCKISH = "div article section nav footer h1 noscript svg".split()
_INLINE = "span b i a strong em".split()
# Rawtext elements take no child MARKUP: an inner </script> would terminate
# them early and strand stray close tags (tag-soup, out of scope here).
_RAWTEXT = "script style textarea".split()
_words = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"),
                           whitelist_characters=" "),
    min_size=0, max_size=30)


@st.composite
def _well_formed(draw, depth=0, inline_only=False):
    n = draw(st.integers(0, 3 if depth < 3 else 0))
    parts = [draw(_words)]
    for _ in range(n):
        if inline_only:
            tag = draw(st.sampled_from(_INLINE))
        else:
            tag = draw(st.sampled_from(_BLOCKISH + _INLINE + _RAWTEXT + ["p"]))
        if tag in _RAWTEXT:
            inner = draw(_words)
        else:
            inner = draw(_well_formed(depth + 1,
                                      inline_only=inline_only or tag == "p"))
        parts.append(f"<{tag}>{inner}</{tag}>")
        # Tag soup the spec now pins: an occasional stray close tag
        # (ignored, except the HTML5 '</p>' empty-paragraph boundary).
        if draw(st.booleans()) and draw(st.booleans()):
            parts.append(f"</{draw(st.sampled_from(['p', 'div', 'b']))}>")
        parts.append(draw(_words))
    return "".join(parts)


class TestTextOracleFuzz:
    @given(_well_formed())
    @settings(max_examples=200, deadline=None)
    def test_engine_matches_stdlib_oracle(self, html):
        from html_parser_spark.htmlkit.text import extract_text
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from oracle import oracle_text
        from html_parser_spark.extract.boilerplate import text_and_scored
        dom = tokenize(html)
        t1 = extract_text(dom)
        assert t1 == oracle_text(html)
        t2, _ = text_and_scored(dom)
        assert t2 == t1
