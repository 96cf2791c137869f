"""Port of the URL-filter specs (core.filter.spec.coffee:8-25; SURVEY §2.2
F1-F4): whitelist/blacklist semantics incl. the MimeTypes.CSS deny case."""

from pyspark.sql import functions as F

from kermit_spark.filters import ALL_URLS, MimeTypes, UrlFilter, by_pattern, match_any

URLS = [
    "http://www.example.com/",
    "http://www.example.com/style.css",
    "http://www.example.com/app.js",
    "http://other.org/doc.pdf",
    "http://other.org/page.html",
]


def _allowed(spark, flt: UrlFilter) -> list[str]:
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    return [r["url"] for r in df.filter(flt.expr(F.col("url"))).collect()]


def test_default_allows_everything(spark):
    assert _allowed(spark, UrlFilter()) == URLS


def test_deny_css(spark):
    flt = UrlFilter(deny=(MimeTypes.CSS,))
    got = _allowed(spark, flt)
    assert "http://www.example.com/style.css" not in got
    assert len(got) == len(URLS) - 1


def test_whitelist_requires_one_match(spark):
    flt = UrlFilter(allow=(by_pattern(r".*example\.com.*"),))
    got = _allowed(spark, flt)
    assert got == [u for u in URLS if "example.com" in u]


def test_allow_and_deny_combined(spark):
    flt = UrlFilter(
        allow=(by_pattern(r".*example\.com.*"),),
        deny=(MimeTypes.CSS, MimeTypes.JS),
    )
    assert _allowed(spark, flt) == ["http://www.example.com/"]


def test_match_any_or_semantics(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = df.filter(
        match_any([MimeTypes.CSS, MimeTypes.PDF], F.col("url"))
    ).collect()
    assert sorted(r["url"] for r in got) == [
        "http://other.org/doc.pdf",
        "http://www.example.com/style.css",
    ]
    assert df.filter(ALL_URLS.expr(F.col("url"))).count() == len(URLS)
