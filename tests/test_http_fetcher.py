"""Live-HTTP integration test against a localhost fixture server — the
analog of the reference's LocalHttpServer + Crawler.int.spec
(util/httpserver.coffee:6-22, Crawler.int.spec.coffee:10-55; SURVEY §2.1
S5/S9): the REAL HttpFetcher (urllib over mapInPandas) crawls a static site
served by stdlib http.server, robots.txt and all."""

import functools
import http.server
import os
import threading

import pytest
from pyspark.sql import functions as F

from kermit_spark.catalog import SnapshotCatalog
from kermit_spark.crawler import Crawler, CrawlConfig
from kermit_spark.fetch import HttpFetcher
from kermit_spark.frontier import Limit, Politeness

SITE = {
    "robots.txt": "User-agent: *\nDisallow: /secret/\n",
    "p/0.html": '<html><body><p>root</p><a href="/p/1.html">one</a>'
    '<a href="/p/2.html">two</a><link href="/static/s.css"></body></html>',
    "p/1.html": '<html><body><p>one</p><a href="/p/2.html">two</a>'
    '<a href="/secret/x.html">hidden</a></body></html>',
    "p/2.html": '<html><body><p>leaf</p><a href="/missing.html">gone</a></body></html>',
    "secret/x.html": "<html><body><p>should never be fetched</p></body></html>",
    "static/s.css": "body{}",
}


@pytest.fixture(scope="module")
def site_url(tmp_path_factory):
    root = tmp_path_factory.mktemp("site")
    for path, body in SITE.items():
        f = root / path
        f.parent.mkdir(parents=True, exist_ok=True)
        f.write_text(body)
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(root)
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_fetch_batch(spark, site_url):
    selected = spark.createDataFrame(
        [
            (0, 1, f"{site_url}/p/0.html", site_url.split("//")[1], 0, None, 0, 1),
            (0, 2, f"{site_url}/missing.html", site_url.split("//")[1], 0, None, 0, 2),
        ],
        "p int, url_hash long, url string, host string, depth int, referer string, wave int, rank int",
    )
    rows = {r["url"]: r for r in HttpFetcher(timeout_s=5).fetch(selected).collect()}
    ok = rows[f"{site_url}/p/0.html"]
    assert ok["status"] == 200
    assert "text/html" in ok["content_type"]
    assert "/p/1.html" in ok["body"]
    # missing file: the server answers 404; fetcher maps errors to 599 —
    # urllib raises HTTPError for 404, which the fetcher treats as a fetch
    # failure (both are non-200 error dispositions)
    assert rows[f"{site_url}/missing.html"]["status"] != 200


def test_full_crawl_over_live_http(spark, site_url, tmp_path):
    cfg = CrawlConfig(
        num_partitions=4,
        politeness=Politeness((Limit(".*", 10),)),
        obey_robots=True,
    )
    crawler = Crawler(
        spark, SnapshotCatalog(spark, str(tmp_path / "c")), HttpFetcher(timeout_s=5), cfg
    )
    crawler.seed([f"{site_url}/p/0.html"])
    crawler.crawl(4)

    frontier = {r["url"]: r["status"] for r in crawler.frontier.read().collect()}
    assert frontier[f"{site_url}/p/0.html"] == "visited"
    assert frontier[f"{site_url}/p/1.html"] == "visited"
    assert frontier[f"{site_url}/p/2.html"] == "visited"
    assert frontier[f"{site_url}/static/s.css"] == "visited"
    # robots: /secret/ blocked, never fetched
    assert frontier[f"{site_url}/secret/x.html"] == "robots_blocked"
    # dead link errored
    assert frontier[f"{site_url}/missing.html"] == "error"

    docs = {r["url"] for r in crawler.documents().filter(F.col("status") == 200).select("url").collect()}
    assert f"{site_url}/secret/x.html" not in docs
    # span extraction ran over live-fetched HTML
    spans = (
        crawler.documents()
        .filter(F.col("url") == f"{site_url}/p/0.html")
        .selectExpr("inline(spans)")
        .collect()
    )
    kinds = [s["kind"] for s in spans]
    assert "link" in kinds and "resource" in kinds and "text" in kinds
