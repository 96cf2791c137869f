"""Surfaced-3xx handling (CrawlConfig.follow_redirects): the Location
target is discovered at the SAME depth, the 3xx row resolves as VISITED;
off by default (reference parity: the request lib follows silently, a
surfaced 3xx is a terminal error — core.streaming.coffee:16-64)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kermit_spark.catalog import SnapshotCatalog
from kermit_spark.crawler import Crawler, CrawlConfig
from kermit_spark.fetch import CorpusFetcher
from kermit_spark.frontier import ERROR, VISITED


def _corpus(spark):
    rows = [
        ("http://r.test/start", 200, "text/html",
         '<a href="http://r.test/old">o</a>', None),
        # permanent redirect to /new (relative Location, must resolve)
        ("http://r.test/old", 301, "text/html", None, "/new"),
        ("http://r.test/new", 200, "text/html", "landed", None),
    ]
    return spark.createDataFrame(
        rows, "url string, status int, content_type string, body string, location string"
    )


def test_follow_redirects_discovers_target_same_depth(spark, tmp_path):
    cfg = CrawlConfig(num_partitions=4, sub_salts=2, follow_redirects=True, max_waves=6)
    crawler = Crawler(
        spark, SnapshotCatalog(spark, str(tmp_path)), CorpusFetcher(_corpus(spark)), cfg
    )
    crawler.seed(["http://r.test/start"])
    crawler.crawl()
    front = {
        r["url"]: (r["status"], r["depth"])
        for r in crawler.frontier.read().collect()
    }
    # /old (depth 1) resolved VISITED; /new discovered at the SAME depth 1
    assert front["http://r.test/old"] == (VISITED, 1)
    assert front["http://r.test/new"] == (VISITED, 1)
    new_doc = (
        spark.read.parquet(f"{tmp_path}/documents")
        .filter(F.col("url") == "http://r.test/new")
        .collect()
    )
    assert len(new_doc) == 1 and new_doc[0]["status"] == 200
    new_front = (
        crawler.frontier.read()
        .filter(F.col("url") == "http://r.test/new")
        .collect()[0]
    )
    assert new_front["referer"] == "http://r.test/old"


def test_redirects_off_is_reference_parity(spark, tmp_path):
    cfg = CrawlConfig(num_partitions=4, sub_salts=2, max_waves=6)
    crawler = Crawler(
        spark, SnapshotCatalog(spark, str(tmp_path)), CorpusFetcher(_corpus(spark)), cfg
    )
    crawler.seed(["http://r.test/start"])
    crawler.crawl()
    front = {r["url"]: r["status"] for r in crawler.frontier.read().collect()}
    assert front["http://r.test/old"] == ERROR
    assert "http://r.test/new" not in front


def test_followed_redirects_fire_no_error_event(spark, tmp_path):
    """ext.notifications parity: the reference NotificationCenter fires only
    for items reaching the ERROR phase. A followed 3xx resolves VISITED, so
    with follow_redirects on, the 301 row must NOT appear in (or trigger) an
    'error' event — previously any status outside (200, 304) did."""
    events: list[tuple[str, dict]] = []
    cfg = CrawlConfig(
        num_partitions=4, sub_salts=2, follow_redirects=True, max_waves=6,
        on_event=lambda ev, payload: events.append((ev, payload)),
    )
    crawler = Crawler(
        spark, SnapshotCatalog(spark, str(tmp_path)), CorpusFetcher(_corpus(spark)), cfg
    )
    crawler.seed(["http://r.test/start"])
    crawler.crawl()
    front = {r["url"]: r["status"] for r in crawler.frontier.read().collect()}
    assert front["http://r.test/old"] == VISITED  # crawl behaved as before
    errs = [p for ev, p in events if ev == "error"]
    assert errs == [], errs
    # lifecycle events still fire
    assert [ev for ev, _ in events][0] == "crawler:start"
    assert [ev for ev, _ in events][-1] == "crawler:stop"
