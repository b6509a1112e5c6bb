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


# ---------------------------------------------------------------- HTML

_BLOCK = ("p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote|section"
          "|article|header|footer|pre|form|hr")
_ENTS = (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
         ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&"))


def ref_extract(html):
    """Independent reference for web.extract_text's documented spec."""
    if html is None:
        return None
    h = re.sub(r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", "", html)
    h = re.sub(r"(?is)<(script|style)\b[^>]*>.*", "", h)
    h = re.sub(r"(?s)<!--.*?-->", "", h)
    h = re.sub(rf"(?i)</?({_BLOCK})\b[^>]*>", "\n", h)
    h = re.sub(r"(?s)<[^>]*>", " ", h)
    for ent, rep in _ENTS:
        h = h.replace(ent, rep)
    h = re.sub(r"[ \t\x0b\f\r]+", " ", h)
    h = re.sub(r" ?\n ?", "\n", h)
    h = re.sub(r"\n{2,}", "\n", h)
    return re.sub(r"^[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+$", "", h)


HTML_BATTERY = [
    "<html><head><title>T</title><style>p{color:red}</style>"
    "<script>var x = '<p>not text</p>';</script></head>"
    "<body><h1>Head</h1><p>One &amp; two &lt;three&gt;.</p>"
    "<div>Four<br>five</div><!-- hidden --></body></html>",
    "Plain text, no markup at all.",
    "<p>unclosed <script>alert(1); trailing garbage",
    "<ul><li>a</li><li>b</li></ul>",
    "A&nbsp;B &quot;C&quot; &#39;D&#39; &unknown; &amp;lt;",
    "<DIV CLASS='x'>upper <B>bold</B></DIV>",
    "<p>multi\n\n\nline   spacing\t\ttabs</p>",
    "",
    None,
]


def test_extract_text_matches_reference(spark):
    df = spark.createDataFrame([(h,) for h in HTML_BATTERY], "html string")
    got = [r["t"] for r in df.select(
        web.extract_text("html").alias("t")).collect()]
    want = [ref_extract(h) for h in HTML_BATTERY]
    assert got == want
    # and spot semantics: script/style/comment content never leaks
    assert "not text" not in got[0] and "color:red" not in got[0]
    assert "hidden" not in got[0]
    assert got[0] == "T\nHead\nOne & two <three>.\nFour\nfive"
    assert got[1] == "Plain text, no markup at all."
    assert "alert" not in got[2]  # unclosed script swallows to end
    assert got[3] == "a\nb"
    assert got[4] == 'A B "C" \'D\' &unknown; &lt;'


def test_markup_stats(spark):
    rows = [(HTML_BATTERY[0],), ("Plain prose with no tags at all.",)]
    df = spark.createDataFrame(rows, "html string")
    out = [r["m"] for r in df.select(
        web.markup_stats("html").alias("m")).collect()]
    html, prose = out
    assert html["is_html"] and html["n_tags"] > 10
    assert not prose["is_html"] and prose["n_tags"] == 0
    assert prose["visible_ratio"] == 1.0
    assert 0 < html["visible_ratio"] < 0.5


def test_extract_text_plan_is_map_only(spark):
    df = spark.range(0, 10).select(
        F.concat(F.lit("<p>x"), F.col("id"), F.lit("</p>")).alias("html"))
    out = df.select(web.extract_text("html").alias("t"),
                    web.markup_stats("html").alias("m"))
    assert_plan(out, max_exchanges=0,
                forbids=("BatchEvalPython", "ArrowEvalPython", "Exchange"))
