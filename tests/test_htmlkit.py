"""Unit tests: tokenizer, text spec, selectors (SURVEY.md §5.2 item 2)."""

from __future__ import annotations

import pytest

from html_parser_spark.htmlkit.tokenizer import tokenize, TEXT
from html_parser_spark.htmlkit.text import extract_text
from html_parser_spark.htmlkit import selectors as S

from .oracle import oracle_text


class TestTokenizer:
    def test_basic_tree(self):
        dom = tokenize("<div><p>a</p><p>b</p></div>")
        assert dom.tags[1:] == ["div", "p", TEXT, "p", TEXT]
        assert dom.parent[2] == 1 and dom.parent[4] == 1

    def test_void_elements(self):
        dom = tokenize("<div><img src='x.png'><br><p>t</p></div>")
        i = dom.tags.index("p")
        assert dom.parent[i] == dom.tags.index("div")

    def test_rawtext_script_not_parsed(self):
        dom = tokenize("<script>if (a<b) { x = '<div>'; }</script><p>ok</p>")
        assert "div" not in dom.tags
        s = dom.tags.index("script")
        kid = dom.children(s)[0]
        assert "<div>" in dom.texts[kid]

    def test_entities(self):
        dom = tokenize("<p>&amp;&lt;x&gt; &#65;&nbsp;</p>")
        t = dom.texts[dom.tags.index(TEXT)]
        assert t == "&<x> A\xa0"

    def test_attr_forms(self):
        dom = tokenize('<a href="u" data-x=\'y\' checked id=z class="c1 c2">t</a>')
        a = dom.attrs_of(1)
        assert a == {"href": "u", "data-x": "y", "checked": "", "id": "z",
                     "class": "c1 c2"}

    def test_implied_close_li(self):
        dom = tokenize("<ul><li>a<li>b</ul>")
        lis = [i for i, t in enumerate(dom.tags) if t == "li"]
        ul = dom.tags.index("ul")
        assert [dom.parent[i] for i in lis] == [ul, ul]

    def test_implied_close_p(self):
        dom = tokenize("<p>a<div>b</div>")
        d = dom.tags.index("div")
        p = dom.tags.index("p")
        assert dom.parent[d] != p

    def test_malformed_never_raises(self):
        for bad in ["<", "<x", "<<<>>>", "<p <div>", "a<b>c</b", "<!--",
                    "<script>x", "</nope>", "<p></p></p>", "\x00<p>\x00</p>"]:
            tokenize(bad)  # must not raise

    def test_unmatched_close_ignored(self):
        dom = tokenize("<div><p>a</span></p></div>")
        assert extract_text(dom) == "a"

    def test_comment_not_text(self):
        assert extract_text(tokenize("<p>a<!-- hidden -->b</p>")) == "ab"

    def test_case_insensitive_tags(self):
        dom = tokenize("<DIV><P>a</P></DIV>")
        assert "div" in dom.tags and "p" in dom.tags


class TestTextSpec:
    CASES = [
        "<div><p>one</p><p>two</p></div>",
        "<p>Hello <b>World</b>!</p>",
        "<ul><li>a<li>b</ul>after",
        "<script>skip()</script><style>p{}</style><p>keep</p>",
        "<head><title>skip</title></head><body>keep</body>",
        "<p>a</p>tail<br>line2",
        "<table><tr><td>k</td><td>v</td></tr></table>",
        "<p>  spaces   collapse  </p>",
        "<p>&amp; &lt;tag&gt; &#1071;</p>",
        "<div>a<div>b<div>c</div>d</div>e</div>",
        "text only, no tags",
        "<noscript>gone</noscript><p>here</p>",
        "<p>a<p>b<p>c",
        "<div><span>in</span><span>line</span></div>",
    ]

    @pytest.mark.parametrize("html", CASES)
    def test_matches_stdlib_oracle(self, html):
        assert extract_text(tokenize(html)) == oracle_text(html)

    def test_synthetic_corpus_matches_oracle(self):
        from html_parser_spark.sources import synth
        for idx in range(0, 120):
            if synth.profile_for(idx) == "pdf":
                continue
            html = synth.render_page(idx).decode("utf-8", errors="replace")
            assert extract_text(tokenize(html)) == oracle_text(html), idx


class TestSelectors:
    DOC = """
    <html><body>
      <div id="main" class="wrap outer">
        <h1 class="title">T</h1>
        <ul class="list"><li>one</li><li class="sel">two</li></ul>
        <div class="inner"><p data-k="v">deep</p></div>
      </div>
      <p>outside</p>
      <script id="__NEXT_DATA__" type="application/json">{}</script>
    </body></html>"""

    @pytest.fixture(scope="class")
    def dom(self):
        return tokenize(self.DOC)

    def test_by_tag(self, dom):
        assert len(S.select(dom, "p")) == 2

    def test_by_id(self, dom):
        n = S.select_one(dom, "#main")
        assert n is not None and dom.tags[n] == "div"

    def test_by_class(self, dom):
        n = S.select_one(dom, ".sel")
        assert n is not None and dom.tags[n] == "li"

    def test_compound(self, dom):
        assert S.select_one(dom, "div.wrap.outer") is not None
        assert S.select_one(dom, "div.wrap.missing") is None

    def test_attr_selectors(self, dom):
        assert S.select_one(dom, '[data-k]') is not None
        assert S.select_one(dom, 'p[data-k="v"]') is not None
        assert S.select_one(dom, 'p[data-k="w"]') is None
        assert S.select_one(dom, 'script[type="application/json"]') is not None

    def test_descendant(self, dom):
        assert S.select_one(dom, "#main p") is not None
        assert S.select_one(dom, ".list p") is None

    def test_child_combinator(self, dom):
        assert S.select_one(dom, "ul > li") is not None
        assert S.select_one(dom, "#main > p") is None  # p is 2 levels down
        assert S.select_one(dom, "div.inner > p") is not None

    def test_select_one_is_first_in_doc_order(self, dom):
        lis = S.select(dom, "li")
        assert S.select_one(dom, "li") == lis[0]

    def test_union(self, dom):
        assert len(S.select(dom, "h1, li")) == 3

    def test_xpath_subset(self, dom):
        css = S.xpath_to_css('//div[@class="inner"]/p/text()')
        assert S.select_one(dom, css) is not None
        css2 = S.xpath_to_css("//ul//li")
        assert len(S.select(dom, css2)) == 2

    def test_xpath_contains_and_attr_tail(self):
        # The bestbuy forms (parse_bestbuy_detai.py:45,60-66), verbatim.
        assert (S.xpath_to_css('//img[@draggable="false"]/@src')
                == 'img[draggable="false"]')
        assert (S.xpath_to_css(
            '//div[contains(@class, "ugc-ratings-reviews")]'
            '//span[contains(@class, "ugc-c-review-average")]/text()')
            == 'div[class*="ugc-ratings-reviews"] '
               'span[class*="ugc-c-review-average"]')
        # exact-match attr values may contain spaces
        css = S.xpath_to_css(
            '//div[@class="priceView-hero-price priceView-customer-price"]'
            '/span/text()')
        assert css == ('div[class="priceView-hero-price '
                       'priceView-customer-price"] > span')
        import pytest as _pytest
        with _pytest.raises(ValueError):
            S.xpath_to_css('//div[starts-with(@id, "x")]')


def test_chain_backtracks_over_descendant_steps():
    """'article > div span': the nearest div ancestor of span fails the
    '>' step, but a higher div satisfies it — requires backtracking."""
    from html_parser_spark.htmlkit import selectors as S
    from html_parser_spark.htmlkit.tokenizer import tokenize
    dom = tokenize("<article><div><section><div><span>x</span>"
                   "</div></section></div></article>")
    hits = S.select(dom, "article > div span")
    assert len(hits) == 1
    assert dom.tags[hits[0]] == "span"


def test_rcdata_and_stray_close_text_semantics():
    """Reviewer-found engine↔oracle divergences, pinned to HTML5 behavior
    on BOTH sides: textarea/title are RCDATA (markup not parsed, entities
    decoded); an unmatched block close is ignored except '</p>', which
    becomes an empty-paragraph line boundary."""
    import os
    import sys
    from html_parser_spark.htmlkit.text import extract_text
    from html_parser_spark.htmlkit.tokenizer import tokenize
    sys.path.insert(0, os.path.dirname(__file__))
    from oracle import oracle_text

    cases = {
        "<div><textarea><b>x</b></textarea></div>": "<b>x</b>",
        "<div><textarea>a &amp; b</textarea></div>": "a & b",
        "a</p>b<br>c": "a\nb\nc",      # stray </p>: boundary (HTML5)
        "a</div>b": "ab",              # stray </div>: ignored
        "<div>a</div></p>b": "a\nb",
    }
    for html, expected in cases.items():
        got = extract_text(tokenize(html))
        assert got == expected, (html, got)
        assert oracle_text(html) == expected, (html, oracle_text(html))
