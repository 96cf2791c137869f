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


def test_trap_rules_classification(spark):
    """TrapRules: each heuristic fires on its shape, precedence is
    too_long > too_deep > repeat_segment > param_explosion, and clean URLs
    pass."""
    from kermit_spark.filters import TrapRules

    cases = [
        ("http://a.test/p/ok.html", "ok"),
        ("http://a.test/" + "x" * 300, "too_long"),
        ("http://a.test/" + "d/" * 15 + "leaf", "too_deep"),
        ("http://a.test/a/loop/loop/loop/p", "repeat_segment"),
        ("http://a.test/a/loop/loop/p", "ok"),          # run of 2 is fine
        ("http://a.test/a/b/a/b/a/b/p", "ok"),          # alternation is fine
        ("http://a.test/p?" + "&".join(f"k{i}=1" for i in range(9)), "param_explosion"),
        ("http://a.test/p?a=1&b=2", "ok"),
        ("http://a.test/" + "d/" * 15 + "?x=1#f", "too_deep"),  # query+fragment
        ("http://a.test/", "ok"),                       # empty path
    ]
    rules = TrapRules(max_url_len=200, max_path_depth=12, max_query_params=8)
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["reason"]
        for r in df.select("url", rules.reason_expr(F.col("url")).alias("reason")).collect()
    }
    for url, want in cases:
        assert got[url] == want, f"{url}: got {got[url]}, want {want}"
    # expr() admits exactly the 'ok' rows
    assert df.filter(rules.expr(F.col("url"))).count() == sum(
        1 for _, w in cases if w == "ok"
    )
