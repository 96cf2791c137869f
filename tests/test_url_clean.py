"""Golden ports of the reference URL-toolkit specs.

Cases from /root/reference/src/kermit/util/tools.spec.coffee:5-43
(uri.cleanAll and uri.toLocalPath). These run both the pure-pandas
implementation and the Spark pandas UDF path.
"""

from __future__ import annotations

import pandas as pd
import pytest

from kermit_spark.functions.urls import (
    _clean_one,
    _normalize_one,
    _to_local_path_one,
    clean_url_series,
    clean_urls,
)

BASE = "http://kermit.cc/base/"

CLEAN_CASES = [
    ("javascript:alert(0);", None),
    ("mailto:hello@kermit.cc", None),
    ("#inpage-anchor", None),
    ("/", None),
    ("", None),
    (None, None),
    ("//kermit.cc/other/path/not/under/base", "http://kermit.cc/other/path/not/under/base"),
    ("/relative/path/to/base", "http://kermit.cc/relative/path/to/base"),
    ("some/page/under/base/index.html", "http://kermit.cc/base/some/page/under/base/index.html"),
    (
        "some/page/under/base/index.html?q=includesQueryWithParams&param=value",
        "http://kermit.cc/base/some/page/under/base/index.html?q=includesQueryWithParams&param=value",
    ),
    # entity decoding (reference tools.coffee:11-16) + dot-segment resolution
    ("/a/b/../c?x=1&amp;y=2", "http://kermit.cc/a/c?x=1&y=2"),
    ("../up/path", "http://kermit.cc/up/path"),
]

LOCAL_PATH_CASES = [
    ("http://example.co.uk", "/tmp/co.uk/example/index.html"),
    ("http://example.co.uk/somepage", "/tmp/co.uk/example/somepage/index.html"),
    ("https://medialize.github.io/URI.js/docs.html#accessors-tld", "/tmp/io/github/medialize/URI.js/docs.html"),
    ("http://github.com/some/other/../directory/help.html", "/tmp/com/github/some/directory/help.html"),
    (
        "https://raw.githubusercontent.com/moll/js-must/master/lib/es6.js",
        "/tmp/com/githubusercontent/raw/moll/js-must/master/lib/es6.js",
    ),
    (
        "https://github.com/moll/js-must/blob/v0.13.0-beta2/lib/index.js",
        "/tmp/com/github/moll/js-must/blob/v0.13.0-beta2/lib/index.js",
    ),
    ("https://en.wikipedia.org/wiki/Web_scraping", "/tmp/org/wikipedia/en/wiki/Web_scraping/index.html"),
    (
        "http://upload.wikimedia.org/wikipedia/commons/thumb/b/bd/Ambox_globe_content.svg/48px-Ambox_globe_content.svg.png",
        "/tmp/org/wikimedia/upload/wikipedia/commons/thumb/b/bd/Ambox_globe_content.svg/48px-Ambox_globe_content.svg.png",
    ),
    (
        "http://en.wikipedia.org/wiki/index.php?title=Web_scraping&amp;action=edit&amp;section=1",
        "/tmp/org/wikipedia/en/wiki/index[title=Web_scraping&action=edit&section=1].php",
    ),
    ("http://en.wikipedia.org/wiki/Talk:Web_scraping", "/tmp/org/wikipedia/en/wiki/Talk:Web_scraping/index.html"),
    (
        "http://en.wikipedia.org/wiki/EBay vs. Bidder%27s Edge",
        "/tmp/org/wikipedia/en/wiki/EBay vs. Bidder's Edge/index.html",
    ),
    ("https://en.wikipedia.org/wiki/Nokogiri_(software)", "/tmp/org/wikipedia/en/wiki/Nokogiri_(software)/index.html"),
    (
        "https://en.wikipedia.org/wiki/Yahoo!_Query_Language",
        "/tmp/org/wikipedia/en/wiki/Yahoo!_Query_Language/index.html",
    ),
]


@pytest.mark.parametrize("href,expected", CLEAN_CASES)
def test_clean_golden(href, expected):
    assert _clean_one(BASE, href) == expected


@pytest.mark.parametrize("url,expected", LOCAL_PATH_CASES)
def test_to_local_path_golden(url, expected):
    assert _to_local_path_one("/tmp", url) == expected


def test_clean_series_vectorized():
    hrefs = pd.Series([c[0] for c in CLEAN_CASES])
    bases = pd.Series([BASE] * len(hrefs))
    got = clean_url_series(bases, hrefs)
    assert list(got) == [c[1] for c in CLEAN_CASES]


def test_normalize_idempotent_and_defaults():
    assert _normalize_one("HTTP://Example.COM:80/a/./b/../c") == "http://example.com/a/c"
    u = "https://example.com/a%20b?q=1"
    assert _normalize_one(_normalize_one(u)) == _normalize_one(u)


def test_clean_udf_on_spark(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(BASE, c[0]) for c in CLEAN_CASES], ["base", "href"]
    )
    out = df.select(clean_urls(F.col("base"), F.col("href")).alias("clean")).collect()
    assert [r.clean for r in out] == [c[1] for c in CLEAN_CASES]


def test_ext_mime_parity_with_reference_table():
    """EXT_MIME carries the reference's full public ext→mime registry
    (util/mimetypes.coffee:5): every reference extension resolves, and agrees
    with the reference's first-listed type except where a deliberate curated
    override modernizes a stale 2015 entry."""
    import os
    import re

    from kermit_spark.functions.mimetypes import REFERENCE_EXT_MIME
    from kermit_spark.functions.urls import _CURATED_EXT_MIME, EXT_MIME

    assert len(REFERENCE_EXT_MIME) == 1223
    for ext, mime in REFERENCE_EXT_MIME.items():
        assert ext in EXT_MIME
        if ext not in _CURATED_EXT_MIME:
            assert EXT_MIME[ext] == mime, ext
    # spot parity against the reference SOURCE when available (regen check)
    src = "/root/reference/src/kermit/util/mimetypes.coffee"
    if os.path.exists(src):
        rows = dict(
            re.findall(r"^\s*'([^']+)'\s*:\s*\[\s*'([^']+)'", open(src).read(), re.M)
        )
        sample = ["3dm", "aiff", "tex", "vrml", "zip", "hqx", "sgml", "midi"]
        for ext in sample:
            assert REFERENCE_EXT_MIME[ext] == rows[ext], ext


def test_content_type_fallback_long_tail_ext(spark):
    """Long-tail extensions from the grown table resolve JVM-side; unknown
    ones still default to octet-stream; real header always wins."""
    from pyspark.sql import functions as F

    from kermit_spark.functions.urls import content_type_fallback

    df = spark.createDataFrame(
        [
            ("http://x.test/a.texi", None),          # long-tail: texinfo
            ("http://x.test/b.vrml", ""),            # long-tail: model
            ("http://x.test/c.zzzz", None),          # unknown ext
            ("http://x.test/d.css", "text/html"),    # real header wins
        ],
        ["url", "ct"],
    )
    got = dict(
        df.select("url", content_type_fallback(F.col("url"), F.col("ct")).alias("out")).collect()
    )
    assert got["http://x.test/a.texi"] == "application/x-texinfo"
    assert got["http://x.test/b.vrml"] == "application/x-vrml"
    assert got["http://x.test/c.zzzz"] == "application/octet-stream"
    assert got["http://x.test/d.css"] == "text/html"


IDN_CASES = [
    # urijs punycode.toASCII parity: Unicode hosts → IDNA ASCII
    ("http://münchen.de/straße", "http://xn--mnchen-3ya.de/stra%C3%9Fe"),
    ("http://例え.jp/", "http://xn--r8jz45g.jp/"),
    ("https://bücher.example.com:8443/x", "https://xn--bcher-kva.example.com:8443/x"),
    # ASCII hosts untouched; mixed-case IDN lowercased first
    ("http://Example.COM/a", "http://example.com/a"),
]


def test_normalize_idn_punycode():
    from kermit_spark.functions.urls import _normalize_one

    for url, expected in IDN_CASES:
        assert _normalize_one(url) == expected


def test_clean_resolves_idn_relative_links():
    """Discovered relative links on an IDN page absolutize against the
    PUNYCODED base — the seen-set and fetch layer only ever see ASCII
    hosts, so one site never splits into a Unicode and an ASCII identity."""
    from kermit_spark.functions.urls import _clean_one

    assert (
        _clean_one("http://münchen.de/a/", "b.html")
        == "http://xn--mnchen-3ya.de/a/b.html"
    )
    # absolute IDN href punycodes too
    assert (
        _clean_one("http://kermit.cc/", "http://例え.jp/p")
        == "http://xn--r8jz45g.jp/p"
    )


def test_idn_invalid_host_kept_verbatim():
    from kermit_spark.functions.urls import _idna_host

    bad = "ex..ämple.com"  # empty label — idna codec rejects
    assert _idna_host(bad) == bad
    assert _idna_host("plain.example.com") == "plain.example.com"


def test_query_escaping_preserves_existing_percent_escapes():
    """Raw RFC 3986-illegal query bytes are percent-encoded, but existing
    %-escapes must pass through UNDECODED: an unquote/quote round trip
    would conflate ?q=a%26b (literal '&' in one value) with ?q=a&b (two
    parameters) — two distinct URLs collapsing to one frontier row and a
    semantically different fetch."""
    from kermit_spark.functions.urls import _normalize_one

    esc = _normalize_one("http://a.test/s?q=a%26b")
    raw = _normalize_one("http://a.test/s?q=a&b")
    assert esc == "http://a.test/s?q=a%26b"
    assert raw == "http://a.test/s?q=a&b"
    assert esc != raw
    assert _normalize_one("http://a.test/s?q=a%3Db") == "http://a.test/s?q=a%3Db"
    # illegal raw bytes DO get encoded ('>' space quote), others untouched
    assert _normalize_one('http://a.test/s?a>b c"d') == "http://a.test/s?a%3Eb%20c%22d"
    assert _normalize_one("http://a.test/s?x=1&y=2") == "http://a.test/s?x=1&y=2"
