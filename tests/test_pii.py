"""Rule-level tests for PII detection/scrubbing (functions/pii.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from html_parser_spark.functions import pii


def _scrub(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["doc_id", "text"])
    return pii.pii_scrub_table(df).orderBy("doc_id").collect()


def test_each_kind_detected_and_scrubbed(spark):
    rows = _scrub(spark, [
        "write to jane.doe+spam@mail.example.com for details",
        "call 555-867-5309 or 555.867.5309 today",
        "served from 192.168.254.1 at noon",
    ])
    assert (rows[0].n_email, rows[0].n_phone, rows[0].n_ipv4) == (1, 0, 0)
    assert rows[0].scrubbed == "write to <EMAIL> for details"
    assert (rows[1].n_email, rows[1].n_phone, rows[1].n_ipv4) == (0, 2, 0)
    assert rows[1].scrubbed == "call <PHONE> or <PHONE> today"
    assert (rows[2].n_email, rows[2].n_phone, rows[2].n_ipv4) == (0, 0, 1)
    assert rows[2].scrubbed == "served from <IP> at noon"


def test_email_not_half_eaten_by_later_rules(spark):
    # an address full of digits/dots must be consumed by the email rule
    # FIRST, not partially matched as a phone/ip afterwards
    [r] = _scrub(spark, ["ping 10.20.30.40 or mail 123.456@h7.example.org"])
    assert (r.n_email, r.n_ipv4) == (1, 1)
    assert r.scrubbed == "ping <IP> or mail <EMAIL>"


def test_boundaries_do_not_overmatch(spark):
    [r] = _scrub(spark, [
        "version 1.2.3.4000 and order #123-456-78901 are not PII"])
    assert (r.n_email, r.n_phone, r.n_ipv4) == (0, 0, 0)
    assert r.scrubbed == "version 1.2.3.4000 and order #123-456-78901 are not PII"


def test_clean_text_untouched(spark):
    [r] = _scrub(spark, ["just ordinary prose with numbers like 2026"])
    assert r.scrubbed == "just ordinary prose with numbers like 2026"
    assert (r.n_email, r.n_phone, r.n_ipv4) == (0, 0, 0)
