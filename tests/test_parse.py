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
