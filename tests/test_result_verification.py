"""Port of the verification spec (Crawler.resultverification.int.spec.coffee:
8-63; SURVEY §2.2 F10): a bad-content predicate reschedules the URL and stops
the crawler; good patterns short-circuit past bad ones; links from bad
content never enter the frontier."""

import pytest
from pyspark.sql import functions as F

from kermit_spark.catalog import SnapshotCatalog
from kermit_spark.crawler import Crawler, CrawlConfig, ResultVerification
from kermit_spark.fetch import CorpusFetcher
from kermit_spark.frontier import Limit, Politeness, SCHEDULED


def _corpus(spark):
    rows = [
        ("http://a.test/ok.html", "a.test", 200, "text/html",
         '<html><body><p>fine content</p><a href="http://a.test/next.html">n</a></body></html>'),
        ("http://a.test/bad.html", "a.test", 200, "text/html",
         '<html><body><p>ACCESS DENIED captcha</p><a href="http://a.test/poison.html">x</a></body></html>'),
        ("http://a.test/next.html", "a.test", 200, "text/html",
         "<html><body><p>leaf</p></body></html>"),
        ("http://a.test/good-denied.html", "a.test", 200, "text/html",
         '<html><body><p>whitelisted ACCESS DENIED mention</p></body></html>'),
    ]
    return spark.createDataFrame(
        rows, "url string, host string, status int, content_type string, body string"
    )


@pytest.fixture
def crawler(spark, tmp_path):
    cfg = CrawlConfig(
        num_partitions=4,
        politeness=Politeness((Limit(".*", 10),)),
        obey_robots=False,
        verification=ResultVerification(
            good=("whitelisted",), bad=("ACCESS DENIED",)
        ),
    )
    return Crawler(
        spark, SnapshotCatalog(spark, str(tmp_path / "c")), CorpusFetcher(_corpus(spark)), cfg
    )


def test_bad_content_reschedules_and_stops(spark, crawler):
    crawler.seed([
        "http://a.test/ok.html",
        "http://a.test/bad.html",
        "http://a.test/good-denied.html",
    ])
    stats = crawler.crawl(5)
    # wave 0 hit the bad page -> crawler stopped after that wave (F10)
    assert stats[0].n_verify_failed == 1
    assert stats[0].stop_requested
    assert len(stats) == 1

    frontier = {r["url"]: r["status"] for r in crawler.frontier.read().collect()}
    # bad URL back to scheduled (UrlStore.reschedule)
    assert frontier["http://a.test/bad.html"] == SCHEDULED
    # good-pattern short-circuit: the whitelisted page passed
    assert frontier["http://a.test/good-denied.html"] == "visited"
    assert frontier["http://a.test/ok.html"] == "visited"
    # link from the GOOD page was discovered...
    assert "http://a.test/next.html" in frontier
    # ...but the poison link from the bad page never entered the frontier
    assert "http://a.test/poison.html" not in frontier
    # and no document row was stored for the bad page
    docs = {r["url"] for r in crawler.documents().select("url").collect()}
    assert "http://a.test/bad.html" not in docs


def test_no_verification_config_never_stops(spark, tmp_path):
    cfg = CrawlConfig(
        num_partitions=4, politeness=Politeness((Limit(".*", 10),)), obey_robots=False
    )
    c = Crawler(
        spark, SnapshotCatalog(spark, str(tmp_path / "c2")), CorpusFetcher(_corpus(spark)), cfg
    )
    c.seed(["http://a.test/bad.html"])
    stats = c.crawl(3)
    assert all(not s.stop_requested for s in stats)
    # without verification the bad page is just a visited page
    frontier = {r["url"]: r["status"] for r in c.frontier.read().collect()}
    assert frontier["http://a.test/bad.html"] == "visited"
    assert "http://a.test/poison.html" in frontier
