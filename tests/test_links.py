"""Outlink extraction (extract/links.py): anchor discovery through the
real tokenizer, rel token semantics, the never-fail kernel, and the
host-graph aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from html_parser_spark.extract.links import (
    extract_links, host_link_graph, links_of)


def test_links_of_basic_and_nested():
    html = ('<html><body>'
            '<a href="https://a.example/x">plain</a>'
            '<a href="/relative"><b>bold</b> and <i>nested</i> text</a>'
            '<a>no href at all</a>'
            '<a href="">empty href skipped</a>'
            '<p>not a link</p>'
            '</body></html>')
    got = links_of(html)
    assert [(l["href"], l["anchor"]) for l in got] == [
        ("https://a.example/x", "plain"),
        ("/relative", "bold and nested text"),
    ]


def test_links_of_rel_is_token_list_not_substring():
    html = ('<a href="u1" rel="nofollowme">a</a>'
            '<a href="u2" rel="external NOFOLLOW sponsored">b</a>'
            '<a href="u3" rel="nofollow">c</a>'
            '<a href="u4">d</a>')
    got = {l["href"]: l["nofollow"] for l in links_of(html)}
    assert got == {"u1": False, "u2": True, "u3": True, "u4": False}


def test_links_of_whitespace_collapse():
    got = links_of('<a href="u">  spread \n\t over   lines </a>')
    assert got[0]["anchor"] == "spread over lines"


def test_extract_links_never_fails_and_parses_synth(spark):
    from html_parser_spark.job import pipeline as P
    pages = P.synthesize_pages(spark, 12)
    junk = spark.createDataFrame(
        [("http://junk.example/", None, b"\x00\xff\xfe garbage <a",
          None, None)], P.PAGES_SCHEMA)
    rows = extract_links(pages.unionByName(junk)).collect()
    # junk page contributes nothing; synth pages parse without error
    assert all(r.src_url != "http://junk.example/" or r.href
               for r in rows)
    assert all(r.href for r in rows)


def test_host_link_graph_aggregation(spark):
    rows = [
        ("https://s1.example/a", "https://d1.example/x", "t", "", False),
        ("https://s1.example/b", "https://d1.example/y", "t", "", False),
        ("https://s1.example/c", "https://d2.example/z", "t",
         "nofollow", True),
        ("https://s1.example/d", "/relative/path", "t", "", False),
        ("https://s2.example/e", "https://s2.example/self", "t", "",
         False),
        ("https://s1.example/f", "HTTPS://D1.EXAMPLE/caps", "t", "",
         False),
    ]
    links = spark.createDataFrame(
        rows, "src_url string, href string, anchor string, rel string, "
              "nofollow boolean")
    got = {(r.src_host, r.dst_host): r.n_links
           for r in host_link_graph(links).collect()}
    # nofollow dropped, relative dropped, hosts lowercased, self-loop kept
    assert got == {("s1.example", "d1.example"): 3,
                   ("s2.example", "s2.example"): 1}
    with_nf = {(r.src_host, r.dst_host): r.n_links
               for r in host_link_graph(links,
                                        drop_nofollow=False).collect()}
    assert with_nf[("s1.example", "d2.example")] == 1
