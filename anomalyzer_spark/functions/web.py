"""Crawl URL hygiene — canonicalization, host/domain extraction, and
per-domain corpus statistics, all as pure column expressions.

Web-crawl curation is keyed by URLs: exact-duplicate pages hide behind
trivially different URLs (tracking params, fragments, default ports,
trailing slashes), and domain-level policies (caps, quality priors,
blocklists) need a stable registrable-domain key. At 100 TB these must
be MAP-ONLY column expressions — a per-URL Python round trip would put
a slow path on every row of every crawl scan. Everything here compiles
to ``parse_url`` + string/array builtins inside whole-stage codegen;
zero UDFs, zero shuffles (``domain_stats``'s single aggregate aside).

Normalization spec (deterministic, documented here because the value
IS the contract — dedup keys must not drift between releases):

* scheme and host lowercased; trailing dots stripped from the host;
  optional ``www.`` stripping (default on — crawl frontiers treat
  www/apex as one site);
* userinfo and fragment dropped; explicit default ports (``:80`` http,
  ``:443`` https) dropped, other ports kept;
* trailing slashes stripped from the path (root ``/`` becomes empty);
* query parameters split on ``&``, tracking params dropped
  (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``, ``mc_eid``,
  ``igshid``, ``ref``, ``ref_src``), the rest SORTED byte-wise and
  rejoined — parameter order never splits a dedup group;
* no host (malformed / relative input) → NULL, so bad rows fall out of
  joins instead of forming a garbage group.

``registrable_domain`` is the standard last-N-labels heuristic with a
small generic-second-level list (``example.co.uk`` → ``example.co.uk``,
``a.b.example.com`` → ``example.com``) — NOT the full Public Suffix
List, which is a data file, not an algorithm; pass
``second_level_suffixes`` to extend it where precision matters.

Value parity against an independent pure-Python reference normalizer
plus plan pins in tests/test_web.py. No reference analogue (the
reference is a univariate stats library).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["url_parts", "normalize_url", "host_of",
           "registrable_domain", "domain_stats",
           "host_suffixes", "filter_by_domains",
           "extract_text", "markup_stats"]

#: query parameters that identify a CLICK, not a PAGE
_TRACKING_RE = "^(utm_.*|fbclid|gclid|msclkid|mc_eid|igshid|ref|ref_src)$"

#: generic second-level labels under 2-letter ccTLDs (co.uk, com.au, ...)
_GENERIC_SLD = ("com", "net", "org", "co", "ac", "gov", "edu", "mil", "sch")


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def host_of(url: str | Column, *, strip_www: bool = True) -> Column:
    """Lowercased host of the URL (no port, no userinfo), trailing dots
    stripped, ``www.`` stripped by default. NULL when the URL has no
    parseable host."""
    h = F.regexp_replace(F.lower(F.try_parse_url(_col(url), F.lit("HOST"))),
                         r"\.+$", "")
    if strip_www:
        h = F.regexp_replace(h, r"^www\.", "")
    return F.when(h == "", F.lit(None).cast("string")).otherwise(h)


def url_parts(url: str | Column, *, strip_www: bool = True) -> Column:
    """Struct of (scheme, host, port, path, query) — the raw parsed
    pieces (lowercased scheme/host, no normalization beyond that).
    ``port`` is a string, empty when implicit."""
    u = _col(url)
    auth = F.try_parse_url(u, F.lit("AUTHORITY"))
    return F.struct(
        F.lower(F.try_parse_url(u, F.lit("PROTOCOL"))).alias("scheme"),
        host_of(u, strip_www=strip_www).alias("host"),
        F.regexp_extract(auth, r":(\d+)$", 1).alias("port"),
        F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit("")).alias("path"),
        F.coalesce(F.try_parse_url(u, F.lit("QUERY")), F.lit("")).alias("query"),
    )


def normalize_url(url: str | Column, *, strip_www: bool = True) -> Column:
    """The canonical URL under the module spec (see module docstring) —
    the crawl dedup key. NULL for inputs with no parseable host."""
    p = url_parts(_col(url), strip_www=strip_www)
    scheme, host = p["scheme"], p["host"]
    port = F.when(
        ((p["scheme"] == "http") & (p["port"] == "80"))
        | ((p["scheme"] == "https") & (p["port"] == "443")),
        F.lit("")).otherwise(p["port"])
    path = F.regexp_replace(p["path"], "/+$", "")
    params = F.array_sort(F.filter(
        F.split(p["query"], "&"),
        lambda x: (x != "") & ~F.lower(
            F.substring_index(x, "=", 1)).rlike(_TRACKING_RE)))
    qs = F.array_join(params, "&")
    out = F.concat(
        scheme, F.lit("://"), host,
        F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)))
    return F.when(host.isNull() | (F.coalesce(scheme, F.lit("")) == ""),
                  F.lit(None).cast("string")).otherwise(out)


def registrable_domain(
    url_or_host: str | Column,
    *,
    is_host: bool = False,
    second_level_suffixes: tuple[str, ...] = _GENERIC_SLD,
) -> Column:
    """The site-level grouping key: the host's last two labels, or last
    THREE when the second-to-last is a generic label under a 2-letter
    ccTLD (``bbc.co.uk``, ``example.com.au``). A heuristic, not the
    Public Suffix List — see module docstring. Pass ``is_host=True``
    when the column already holds hosts (skips the URL parse)."""
    h = _col(url_or_host) if is_host else host_of(_col(url_or_host))
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2),
                        F.element_at(labels, -1))
    last3 = F.concat_ws(".", F.element_at(labels, -3), F.element_at(
        labels, -2), F.element_at(labels, -1))
    use3 = ((n >= 3)
            & F.element_at(labels, -2).isin(*second_level_suffixes)
            & (F.length(F.element_at(labels, -1)) == 2))
    return F.when(h.isNull(), F.lit(None).cast("string")) \
        .when(n <= 2, h).when(use3, last3).otherwise(last2)


#: named entities decoded by extract_text; ``&amp;`` deliberately LAST
#: so already-decoded sequences are not re-decoded (&amp;lt; -> &lt;,
#: never <). Other entities pass through verbatim (documented choice:
#: arbitrary-codepoint decode is a data table, not an expression).
_ENTITIES = (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
             ("&amp;", "&"))

#: tags whose boundaries imply a line break in the visible text
_BLOCK_TAGS = ("p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote|section"
               "|article|header|footer|pre|form|hr")


def extract_text(html: str | Column) -> Column:
    """Visible text of an HTML payload — the crawl step between fetch
    and every text operator in this engine, as a pure regexp_replace
    chain (whole-stage codegen; no parser library, no Python).

    The spec, in order (the value is the contract — extraction must
    not drift between releases; an independent reference implements
    the same spec in tests/test_web.py):

    1. ``<script>``/``<style>`` elements removed WITH their contents
       (case-insensitive, dot-matches-newline, non-greedy);
    2. HTML comments removed;
    3. block-level tag boundaries become newlines (``p div br li`` …);
    4. every remaining tag becomes a space;
    5. the basic named entities decode (``&amp;`` last — see
       ``_ENTITIES``); unknown entities pass through verbatim;
    6. horizontal whitespace collapses to single spaces, blank-ish
       lines collapse, and the result is trimmed.

    NOT a sanitizer and NOT a browser: malformed nesting degrades
    gracefully (an unclosed ``<script`` swallows to end of input, the
    conservative reading for boilerplate removal). NULL in, NULL out.
    """
    h = _col(html)
    h = F.regexp_replace(h, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", "")
    h = F.regexp_replace(h, r"(?is)<(script|style)\b[^>]*>.*", "")
    h = F.regexp_replace(h, r"(?s)<!--.*?-->", "")
    h = F.regexp_replace(h, rf"(?i)</?({_BLOCK_TAGS})\b[^>]*>", "\n")
    h = F.regexp_replace(h, r"(?s)<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        h = F.regexp_replace(h, ent, rep)
    h = F.regexp_replace(h, r"[ \t\x0b\f\r]+", " ")
    h = F.regexp_replace(h, r" ?\n ?", "\n")
    h = F.regexp_replace(h, r"\n{2,}", "\n")
    # explicit ASCII class, not \s (Java \s is ASCII, Python \s is
    # Unicode — the reference must mirror exactly) and not F.trim
    # (space-only: would leave boundary newlines)
    return F.regexp_replace(h, r"^[ \t\n\x0b\f\r]+|[ \t\n\x0b\f\r]+$", "")


def markup_stats(html: str | Column) -> Column:
    """Struct of markup-shape signals for format sniffing and crawl
    quality gates: ``n_tags``, ``tag_density`` (tags per 100 chars),
    ``visible_ratio`` (extracted length / raw length), ``is_html``
    (structural evidence: a doctype/html/body/div/p tag exists AND
    tags are non-trivially dense). Pure column math — compose into
    ``checks.satisfies`` bounds or a ``where`` before extraction."""
    h = _col(html)
    n_tags = F.size(F.regexp_extract_all(h, F.lit(r"(?s)<[^>]*>"), 0))
    length = F.greatest(F.length(h), F.lit(1))
    density = F.round(n_tags * F.lit(100.0) / length, 4)
    structural = h.rlike(
        r"(?is)<!doctype\s+html|<html[\s>]|<body[\s>]|<div[\s>]|<p[\s>]")
    return F.struct(
        n_tags.alias("n_tags"),
        density.alias("tag_density"),
        F.round(F.length(extract_text(h)) / length, 4)
        .alias("visible_ratio"),
        (structural & (density > 0.2)).alias("is_html"),
    )


def domain_stats(
    df: DataFrame,
    url_col: str,
    *,
    token_col: str | None = None,
    domain_col: str = "domain",
) -> DataFrame:
    """Per-registrable-domain corpus statistics: ``(domain, n_pages,
    n_hosts`` [, ``n_tokens``]) — the frame domain policies consume
    (``sampling.cap_stratum_share`` / ``cap_stratum_tokens`` take its
    ``domain`` as the stratum; blocklists anti-join it). One hash
    aggregate; NULL-host rows are reported under domain NULL rather than
    silently dropped — a surge of unparseable URLs is a crawl bug worth
    seeing."""
    aggs = [
        F.count(F.lit(1)).alias("n_pages"),
        F.count_distinct(host_of(F.col(url_col))).alias("n_hosts"),
    ]
    if token_col is not None:
        aggs.append(F.sum(token_col).cast("long").alias("n_tokens"))
    return (df.groupBy(registrable_domain(F.col(url_col))
                       .alias(domain_col)).agg(*aggs))


def host_suffixes(url: str | Column, *, strip_www: bool = True) -> Column:
    """Array of the host's dot-suffix chain, most-specific first —
    ``a.b.example.com`` → [a.b.example.com, b.example.com, example.com,
    com]. The membership unit of domain-list policies: an entry
    ``example.com`` must govern every subdomain (the UT1/abuse-list
    convention), so matching is "any suffix ∈ list", not host equality.
    Bounded by the host's label count (handfuls); empty for NULL/
    unparseable hosts."""
    h = host_of(url, strip_www=strip_www)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    return F.when(h.isNull(), F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), n),
                    lambda i: F.array_join(F.slice(parts, i, n), ".")))


def filter_by_domains(
    df: DataFrame,
    domains: DataFrame,
    url_col: str,
    *,
    id_col: str = "doc_id",
    mode: str = "block",
    domain_col: str = "domain",
    strip_www: bool = True,
) -> DataFrame:
    """Domain-list gate with SUBDOMAIN INHERITANCE — the crawl-intake
    step every published pipeline runs against category blocklists
    (UT1-style: adult/malware/fraud) or source allowlists: a row hits
    the list when ANY dot-suffix of its URL's host equals a listed
    domain (entry ``example.com`` governs ``a.b.example.com``; a bare
    TLD entry governs the whole TLD — list what you mean).

    ``mode="block"`` drops hit rows (NULL/unparseable hosts are KEPT —
    they're a crawl-hygiene signal, not a category hit; filter them
    explicitly if unwanted); ``mode="allow"`` keeps ONLY hit rows
    (fail-closed: NULL hosts are dropped).

    Plan shape (the 100 TB read): one map-only suffix explode (bounded
    by the host's label count) + ONE semi/anti equi-join against the
    list — broadcast while the list frame is small (the usual megabyte
    blocklist; Catalyst/AQE decide), never a cartesian; the gate itself
    is a semi/anti join back on ``id_col``, so row multiplicity is
    untouched. Normalize list entries like hosts: lowercase, no
    trailing dot, no leading ``www.`` (entries are matched verbatim
    against the suffix chain)."""
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    sfx = df.select(
        F.col(id_col),
        F.explode(host_suffixes(F.col(url_col), strip_www=strip_www))
        .alias("_sfx"))
    hits = sfx.join(
        domains.select(F.col(domain_col).alias("_sfx")), "_sfx",
        "left_semi")
    how = "left_anti" if mode == "block" else "left_semi"
    return df.join(hits.select(id_col), id_col, how)
