"""Port of the Pipeline fan-out spec (Pipeline.spec.coffee:8-25; SURVEY §2.1
S6): one fetched stream feeds multiple guarded sinks. In the wave engine the
fetched DataFrame is cached once and each sink is a content-type-guarded
filter + write — this test asserts the routing semantics (every row reaches
exactly the sinks whose guard matches, rows with no matching sink still
complete)."""

from pyspark.sql import functions as F

from kermit_spark.filters import UrlPredicate

ROWS = [
    ("http://a.test/page.html", "text/html", "<html>x</html>"),
    ("http://a.test/style.css", "text/css", "body{}"),
    ("http://a.test/pic.png", "image/png", "PNG"),
    ("http://a.test/data.bin", "application/octet-stream", "BIN"),
]


def _fetched(spark):
    return spark.createDataFrame(ROWS, "url string, content_type string, body string")


def test_guarded_sinks_route_by_content_type(spark, tmp_path):
    fetched = _fetched(spark).cache()
    sinks = {
        "html": F.col("content_type") == "text/html",
        "assets": F.col("content_type").isin("text/css", "image/png"),
        # ContentType([/.*/]) catch-all (ext.offline.coffee:38)
        "archive": F.lit(True),
    }
    written = {}
    for name, guard in sinks.items():
        out = str(tmp_path / name)
        fetched.filter(guard).write.parquet(out)
        written[name] = {r["url"] for r in spark.read.parquet(out).collect()}
    assert written["html"] == {"http://a.test/page.html"}
    assert written["assets"] == {"http://a.test/style.css", "http://a.test/pic.png"}
    assert written["archive"] == {u for u, _, _ in ROWS}
    fetched.unpersist()


def test_row_with_no_matching_sink_still_completes(spark):
    """FETCHING→FETCHED fires even when no guard matches
    (Pipeline.coffee:55-58): the row stays in the fetched DF regardless of
    sink routing — sinks are projections, not gatekeepers."""
    fetched = _fetched(spark)
    guard = UrlPredicate(r".*\.html$")
    matched = fetched.filter(guard.expr(F.col("url")))
    assert matched.count() == 1
    assert fetched.count() == len(ROWS)  # unrouted rows not lost
