"""Monitoring aggregations: phase stats (A1/A2) + header histogram (A5/S12)."""

from pyspark.sql import functions as F

from kermit_spark.metrics import headers_histogram, phase_stats


def test_phase_stats(spark):
    items = spark.createDataFrame(
        [("FETCHED", 1.0), ("FETCHED", 3.0), ("ERROR", 5.0)],
        "phase string, duration double",
    )
    rows = {r["phase"]: r for r in phase_stats(items).collect()}
    assert rows["FETCHED"]["n"] == 2
    assert rows["FETCHED"]["min_v"] == 1.0
    assert rows["FETCHED"]["max_v"] == 3.0
    assert rows["FETCHED"]["avg_v"] == 2.0
    assert rows["ERROR"]["n"] == 1


def test_headers_histogram(spark):
    df = spark.createDataFrame(
        [
            ({"content-type": "text/html", "server": "nginx"},),
            ({"content-type": "text/html"},),
            ({"content-type": "text/css", "server": "nginx"},),
            (None,),  # synthetic 404 rows carry no headers
        ],
        "headers map<string,string>",
    )
    got = {(r["header"], r["value"]): r["n"] for r in headers_histogram(df).collect()}
    assert got[("content-type", "text/html")] == 2
    assert got[("content-type", "text/css")] == 1
    assert got[("server", "nginx")] == 2
    assert sum(got.values()) == 5


def test_headers_flow_through_corpus_fetch_to_documents(spark):
    """S12 end-to-end shape: fetcher emits the headers map and
    parse_documents carries it into the documents schema."""
    from kermit_spark.fetch import CorpusFetcher
    from kermit_spark.parse import parse_documents

    corpus = spark.createDataFrame(
        [("http://a.test/x.html", 200, "text/html", "<html><body>hi</body></html>")],
        "url string, status int, content_type string, body string",
    )
    selected = spark.createDataFrame(
        [(0, 1, "http://a.test/x.html", "a.test", 0, None, 0, 1)],
        "p int, url_hash long, url string, host string, depth int, referer string, wave int, rank int",
    )
    docs = parse_documents(CorpusFetcher(corpus).fetch(selected)).collect()
    assert len(docs) == 1
    hdrs = docs[0]["headers"]
    assert hdrs["content-type"] == "text/html"
    assert int(hdrs["content-length"]) == len("<html><body>hi</body></html>")
    got = {(r["header"], r["value"]) for r in headers_histogram(
        parse_documents(CorpusFetcher(corpus).fetch(selected))).collect()}
    assert ("content-type", "text/html") in got


def test_fairness_stats(spark):
    from kermit_spark.metrics import fairness_stats

    # perfectly fair: J = 1
    fair = spark.createDataFrame(
        [(f"h{i % 4}",) for i in range(8)], ["host"]
    )
    row = fairness_stats(fair).collect()[0]
    assert (row["n_hosts"], row["n_fetched"]) == (4, 8)
    assert row["jain"] == 1.0 and row["top_share"] == 0.25

    # one hog: counts (6,1,1) -> J = 64/(3*38) = 0.561404
    skew = spark.createDataFrame(
        [("hog",)] * 6 + [("h1",), ("h2",)], ["host"]
    )
    row = fairness_stats(skew).collect()[0]
    assert row["jain"] == 0.561404
    assert row["top_share"] == 0.75
