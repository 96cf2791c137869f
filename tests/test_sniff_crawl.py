"""Magic-byte content sniffing in the crawl path
(CrawlConfig.sniff_content → parse_documents → ops.media.sniff_mime):
a server lying in Content-Type can neither hide an HTML page's links
nor feed binary to the span tokenizer. Off by default (reference
parity: header trusted with extension fallback,
extensions/core.streaming.coffee:59)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kermit_spark.catalog import SnapshotCatalog
from kermit_spark.crawler import Crawler, CrawlConfig
from kermit_spark.fetch import CorpusFetcher

PNG_BODY = bytes.fromhex("89504E470D0A1A0A").decode("latin-1") + "fakepng"


def _corpus(spark):
    rows = [
        # honest HTML page linking to both liars
        ("http://s.test/start", 200, "text/html",
         '<a href="http://s.test/liar">l</a>'
         '<a href="http://s.test/fakehtml">f</a>'),
        # LIAR 1: HTML content declared as octet-stream — its link is
        # invisible unless the body is sniffed
        ("http://s.test/liar", 200, "application/octet-stream",
         '<html><a href="http://s.test/hidden">h</a></html>'),
        ("http://s.test/hidden", 200, "text/html", "found me"),
        # LIAR 2: PNG bytes declared text/html — must NOT go through the
        # span tokenizer when sniffing is on
        ("http://s.test/fakehtml", 200, "text/html", PNG_BODY),
    ]
    return spark.createDataFrame(
        rows, "url string, status int, content_type string, body string"
    )


def _crawl(spark, tmp_path, sniff: bool):
    cfg = CrawlConfig(
        num_partitions=4, sub_salts=2, max_waves=6, sniff_content=sniff
    )
    crawler = Crawler(
        spark, SnapshotCatalog(spark, str(tmp_path)), CorpusFetcher(_corpus(spark)), cfg
    )
    crawler.seed(["http://s.test/start"])
    crawler.crawl()
    return crawler


def test_sniff_content_unmasks_lying_server(spark, tmp_path):
    crawler = _crawl(spark, tmp_path / "on", sniff=True)
    urls = {r["url"] for r in crawler.frontier.read().collect()}
    assert "http://s.test/hidden" in urls  # link behind the lying header
    docs = {
        r["url"]: r
        for r in spark.read.parquet(f"{tmp_path}/on/documents").collect()
    }
    # liar 1 re-typed text/html, parsed into spans (link present)
    liar = docs["http://s.test/liar"]
    assert liar["content_type"] == "text/html"
    assert any(s["kind"] == "link" for s in liar["spans"])
    # liar 2 re-typed image/png, NOT tokenized: single media span
    fake = docs["http://s.test/fakehtml"]
    assert fake["content_type"] == "image/png"
    assert [s["kind"] for s in fake["spans"]] == ["media"]


def test_sniff_content_off_is_reference_parity(spark, tmp_path):
    crawler = _crawl(spark, tmp_path / "off", sniff=False)
    urls = {r["url"] for r in crawler.frontier.read().collect()}
    assert "http://s.test/hidden" not in urls  # header trusted: link lost
    docs = {
        r["url"]: r
        for r in spark.read.parquet(f"{tmp_path}/off/documents").collect()
    }
    assert docs["http://s.test/liar"]["content_type"] == "application/octet-stream"
    assert [s["kind"] for s in docs["http://s.test/liar"]["spans"]] == ["media"]
