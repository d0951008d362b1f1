"""Rule-level tests for URL canonicalization (functions/urlops.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from html_parser_spark.functions import urlops


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [r.c for r in
            df.select(urlops.canonicalize_url("url").alias("c")).collect()]


def test_case_port_slash_fragment_collapse(spark):
    spellings = [
        "https://www.acme.example.com/cat/item-1",
        "HTTPS://WWW.ACME.example.com/cat/item-1",
        "https://www.acme.example.com:443/cat/item-1/",
        "https://www.acme.example.com/cat/item-1#reviews",
        "https://www.acme.example.com/cat/item-1//",
    ]
    out = set(_canon(spark, spellings))
    assert out == {"https://www.acme.example.com/cat/item-1"}


def test_query_sort_and_tracking_strip(spark):
    spellings = [
        "https://h.example.com/p?b=2&a=1",
        "https://h.example.com/p?a=1&b=2&utm_source=feed&gclid=x",
        "https://h.example.com/p?utm_campaign=sale&b=2&fbclid=y&a=1",
    ]
    out = set(_canon(spark, spellings))
    assert out == {"https://h.example.com/p?a=1&b=2"}


def test_tracking_only_query_drops_entirely(spark):
    [c] = _canon(spark, ["https://h.example.com/p?utm_source=feed&ref=rss"])
    assert c == "https://h.example.com/p"


def test_nondefault_port_and_userinfo(spark):
    # non-default port is MEANINGFUL and survives; userinfo never does
    [a, b] = _canon(spark, [
        "https://user@h.example.com:8080/x",
        "http://h.example.com:80/x",
    ])
    assert a == "https://h.example.com:8080/x"
    assert b == "http://h.example.com/x"


def test_empty_path_becomes_root(spark):
    [c] = _canon(spark, ["https://h.example.com"])
    assert c == "https://h.example.com/"


def test_url_dedup_groups(spark):
    df = spark.createDataFrame(
        [("https://h.example.com/p?b=2&a=1",),
         ("HTTPS://h.example.com/p/?a=1&b=2&utm_source=x",),
         ("https://h.example.com/other",)], ["url"])
    out = {r.canonical_url: r for r in urlops.url_dedup(df).collect()}
    assert out["https://h.example.com/p?a=1&b=2"].n_variants == 2
    assert out["https://h.example.com/other"].n_variants == 1
    # representative is the min raw spelling (deterministic re-fetch key)
    assert (out["https://h.example.com/p?a=1&b=2"].representative_url
            == "HTTPS://h.example.com/p/?a=1&b=2&utm_source=x")
