"""Crawl URL hygiene (functions/web.py).

Strongest available checks: value parity of the Spark normalizer
against an INDEPENDENT pure-Python reference implementing the same
documented spec (urllib-based — a different parser lineage than
Spark's parse_url), an edge-case battery with pinned expectations,
registrable-domain pins, and the map-only plan contract.
"""

import re
from urllib.parse import urlsplit

import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.functions import web
from anomalyzer_spark.plans import assert_plan

_TRACK = re.compile(r"^(utm_.*|fbclid|gclid|msclkid|mc_eid|igshid|"
                    r"ref|ref_src)$")


def ref_normalize(u, strip_www=True):
    """Independent reference for the module's normalization spec."""
    if u is None:
        return None
    try:
        s = urlsplit(u)
        port = s.port
    except ValueError:
        return None
    host = s.hostname
    if not host or not s.scheme:
        return None
    host = re.sub(r"\.+$", "", host)
    if strip_www:
        host = re.sub(r"^www\.", "", host)
    scheme = s.scheme.lower()
    pstr = "" if port is None or (scheme, port) in (
        ("http", 80), ("https", 443)) else str(port)
    path = re.sub("/+$", "", s.path)
    params = sorted(p for p in s.query.split("&")
                    if p and not _TRACK.match(p.split("=", 1)[0].lower()))
    qs = "&".join(params)
    return (f"{scheme}://{host}" + (f":{pstr}" if pstr else "")
            + path + (f"?{qs}" if qs else ""))


BATTERY = [
    "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
    "https://example.com:443/",
    "https://example.com:8443/x/",
    "http://sub.shop.example.co.uk/p?gclid=1",
    "http://example.com./x",
    "http://user:pw@example.com/x",
    "http://example.com/a//b///",
    "http://example.com?fbclid=abc",
    "http://example.com/x?a=2&a=1&z=9&K=0",
    "ftp://files.example.org/pub/",
    "https://www.bbc.co.uk/news?x=1&utm_medium=z",
    "http://a.b.c.example.com/x",
    "http://localhost:8080/x",
    "https://example.com.au/x",
    "https://example.com/search?q=a+b&utm_campaign=2024&ref=home",
    None,
]


def test_normalize_url_matches_reference(spark):
    df = spark.createDataFrame([(u,) for u in BATTERY], "url string")
    got = [r["n"] for r in df.select(
        web.normalize_url("url").alias("n")).collect()]
    want = [ref_normalize(u) for u in BATTERY]
    assert got == want
    # and the spot values are what the spec promises
    assert got[0] == "http://example.com/a/b?a=1&b=2"
    assert got[1] == "https://example.com"
    assert got[2] == "https://example.com:8443/x"
    assert got[7] == "http://example.com"
    assert got[8] == "http://example.com/x?K=0&a=1&a=2&z=9"
    assert got[-1] is None


def test_normalize_url_keep_www(spark):
    df = spark.createDataFrame(
        [("https://www.example.com/x",)], "url string")
    got = df.select(web.normalize_url(
        "url", strip_www=False).alias("n")).collect()[0]["n"]
    assert got == "https://www.example.com/x"
    assert got == ref_normalize("https://www.example.com/x",
                                strip_www=False)


def test_unparseable_urls_are_null(spark):
    bad = ["not a url", "/relative/only", "", "https://", "http:///x"]
    df = spark.createDataFrame([(u,) for u in bad], "url string")
    out = df.select(web.normalize_url("url").alias("n"),
                    web.host_of("url").alias("h")).collect()
    assert all(r["n"] is None and r["h"] is None for r in out)


def test_registrable_domain(spark):
    cases = {
        "http://a.b.c.example.com/x": "example.com",
        "https://www.bbc.co.uk/news": "bbc.co.uk",
        "https://example.com.au/x": "example.com.au",
        "http://localhost:8080/x": "localhost",
        "https://deep.ac.jp/x": "deep.ac.jp",
        "https://example.org/": "example.org",
        "not a url": None,
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = [r["d"] for r in df.select(
        web.registrable_domain("url").alias("d")).collect()]
    assert got == list(cases.values())
    # host-typed input skips the parse
    hdf = spark.createDataFrame([("news.bbc.co.uk",)], "h string")
    assert hdf.select(web.registrable_domain(
        "h", is_host=True).alias("d")).collect()[0]["d"] == "bbc.co.uk"


def test_domain_stats(spark):
    rows = [
        ("https://a.example.com/1", 10),
        ("https://b.example.com/2?utm_source=x", 20),
        ("https://example.org/3", 5),
        ("not a url", 7),
    ]
    df = spark.createDataFrame(rows, "url string, n_toks int")
    got = {r["domain"]: (r["n_pages"], r["n_hosts"], r["n_tokens"])
           for r in web.domain_stats(df, "url",
                                     token_col="n_toks").collect()}
    assert got["example.com"] == (2, 2, 30)
    assert got["example.org"] == (1, 1, 5)
    assert got[None] == (1, 0, 7)  # unparseable rows stay visible


def test_normalize_plan_is_map_only(spark):
    df = spark.range(0, 100).select(
        F.concat(F.lit("https://h"), F.col("id"),
                 F.lit(".example.com/p?a=1")).alias("url"))
    out = df.select(web.normalize_url("url").alias("n"),
                    web.registrable_domain("url").alias("d"))
    assert_plan(out, max_exchanges=0,
                forbids=("BatchEvalPython", "ArrowEvalPython", "Exchange"))
