"""Port of the extraction specs (Extractor.spec.coffee:13-36) + the span
-ordering contract (SURVEY §2.5 X4): spans come back in document order with
0-based offsets, link/resource/media kinds carry media_ref, text spans carry
text."""

from pyspark.sql import functions as F

from kermit_spark.parse import extract_spans_one

# HTML shaped like the reference's Extractor.spec fixture: anchors with text
# and link tags, interleaved with text content.
HTML = (
    '<html><head><title>Test Page</title>'
    '<link href="/static/main.css"></head>'
    '<body><p>intro text</p>'
    '<a href="http://a.test/1.html">first link</a>'
    '<p>middle</p>'
    '<a href="/relative/2.html">second link</a>'
    '<img src="http://a.test/pic.png">'
    '<p>outro</p></body></html>'
)


def test_span_sequence_golden():
    spans = extract_spans_one(HTML)
    assert spans == [
        ("text", "Test Page", None, 0),
        ("resource", None, "/static/main.css", 1),
        ("text", "intro text", None, 2),
        ("link", "first link", "http://a.test/1.html", 3),
        ("text", "middle", None, 4),
        ("link", "second link", "/relative/2.html", 5),
        ("media", None, "http://a.test/pic.png", 6),
        ("text", "outro", None, 7),
    ]


def test_offsets_are_dense_document_order():
    spans = extract_spans_one(HTML)
    assert [s[3] for s in spans] == list(range(len(spans)))


def test_none_body_yields_none():
    assert extract_spans_one(None) is None


def test_empty_and_textless():
    assert extract_spans_one("") == []
    assert extract_spans_one("<p></p><div></div>") == []


def test_anchor_without_text():
    spans = extract_spans_one('<a href="http://x.test/">  </a>')
    assert spans == [("link", None, "http://x.test/", 0)]


def test_attribute_quoting_forms_match_html_parser_oracle():
    """Real-web HTML quotes attributes every which way; the tokenizer must
    agree with the independent html.parser oracle on all of them (cheerio
    handles these in the reference, Extractor.coffee:11-18)."""
    from tests.oracle import extract_spans_oracle

    cases = [
        "<a href='http://x/a.html'>single</a>",
        "<a href=http://x/a.html>unquoted</a>",
        '<a data-k=v href = "http://x/a.html">spaced</a>',
        "<link href=style.css><link href = 's2.css'>",
        "<img src=pic.png><img src='p3.png'>",
        "<img src=pic.png/>",  # HTML5: trailing '/' belongs to the unquoted value
        "<a hreflang=en href=/p/1.html class=nav>other attrs</a>",
        '<a data-href="nope">no real href</a>',
        'mix <a href="/a">A</a> of <link href=/c.css> forms <img src = "/i.png">',
        '<A HREF="/UP">case-insensitive</A>',
    ]
    for html in cases:
        assert extract_spans_one(html) == extract_spans_oracle(html), html


def test_unquoted_and_single_quoted_discovery():
    spans = extract_spans_one(
        "<a href=/one.html>1</a><a href='/two.html'>2</a>"
    )
    assert [(s[0], s[2]) for s in spans] == [("link", "/one.html"), ("link", "/two.html")]


def test_discovery_pipeline_on_spark(spark):
    """X3 analog: parse → explode → clean → absolute URLs with depth+1."""
    from kermit_spark.parse import SPAN_TYPE, discover_links, extract_spans

    df = spark.createDataFrame(
        [("http://a.test/base/page.html", 1, HTML)], "url string, depth int, body string"
    ).withColumn("spans", extract_spans(F.col("body")))
    got = discover_links(df).orderBy("url").collect()
    urls = [r["url"] for r in got]
    assert urls == sorted(
        [
            "http://a.test/static/main.css",
            "http://a.test/1.html",
            "http://a.test/relative/2.html",
            "http://a.test/pic.png",
        ]
    )
    assert all(r["depth"] == 2 for r in got)
    assert all(r["referer"] == "http://a.test/base/page.html" for r in got)
