"""WARC export/import (kermit_spark/warc.py): byte-exact framing, lossless
round trip, determinism, and robustness to adversarial bodies."""

import glob

from pyspark.sql import functions as F

from kermit_spark.warc import read_warc, write_warc


def _docs(spark):
    rows = [
        ("http://a.test/1", 0, 200, "text/html", "<html>one é</html>"),
        ("http://a.test/2", 0, 404, "text/plain", ""),
        ("http://a.test/3", 1, 200, "text/html",
         "body containing\r\n\r\nWARC/1.0\r\nfake record header"),
        ("http://a.test/4", 1, 200, None, None),
    ]
    return spark.createDataFrame(
        rows, "url string, wave int, status int, content_type string, body string"
    )


def test_warc_round_trip(spark, tmp_path):
    path = str(tmp_path / "w")
    write_warc(_docs(spark).repartition(2), path)
    back = {r["url"]: r for r in read_warc(spark, path).collect()}
    assert len(back) == 4
    r1 = back["http://a.test/1"]
    assert (r1["status"], r1["content_type"], r1["body"]) == (200, "text/html", "<html>one é</html>")
    assert back["http://a.test/2"]["status"] == 404
    # a body that LOOKS like a record header parses fine (length-framed)
    assert back["http://a.test/3"]["body"].endswith("fake record header")
    assert back["http://a.test/3"]["wave"] == 1
    # null body/content-type: octet-stream default, empty body
    assert back["http://a.test/4"]["body"] == ""


def test_warc_files_are_valid_and_deterministic(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    docs = _docs(spark).repartition(1)
    write_warc(docs, a)
    write_warc(docs, b)
    fa = sorted(glob.glob(f"{a}/part-*"))
    fb = sorted(glob.glob(f"{b}/part-*"))
    assert fa and len(fa) == len(fb)
    for x, y in zip(fa, fb):
        bytes_x = open(x, "rb").read()
        assert bytes_x == open(y, "rb").read()   # identical re-run
        assert bytes_x.startswith(b"WARC/1.0\r\n")
        assert bytes_x.endswith(b"\r\n\r\n")
        # fixed date parameter, never wall clock
        assert b"WARC-Date: 2000-01-01T00:00:00Z" in bytes_x


def test_crawler_archives_waves_to_warc(spark, tmp_path):
    """CrawlConfig(warc_path=...) archives every wave's raw fetches —
    bodies included, which the documents table does not keep — as
    wave-partitioned WARC; read-back restores them."""
    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.crawler import Crawler, CrawlConfig
    from kermit_spark.fetch import CorpusFetcher
    from kermit_spark.frontier import Limit, Politeness

    corpus = spark.createDataFrame(
        [
            ("http://a.test/1.html", "a.test", 200, "text/html",
             '<html><body><a href="/2.html">n</a></body></html>'),
            ("http://a.test/2.html", "a.test", 200, "text/html",
             "<html><body><p>leaf two</p></body></html>"),
        ],
        "url string, host string, status int, content_type string, body string",
    )
    warc_dir = str(tmp_path / "archive")
    cfg = CrawlConfig(
        num_partitions=2,
        politeness=Politeness((Limit(".*", 10),)),
        obey_robots=False,
        warc_path=warc_dir,
    )
    c = Crawler(spark, SnapshotCatalog(spark, str(tmp_path / "c")),
                CorpusFetcher(corpus), cfg)
    c.seed(["http://a.test/1.html"])
    c.crawl(3)

    w0 = {r["url"]: r for r in read_warc(spark, f"{warc_dir}/wave=0").collect()}
    assert '<a href="/2.html">n</a>' in w0["http://a.test/1.html"]["body"]
    w1 = {r["url"]: r for r in read_warc(spark, f"{warc_dir}/wave=1").collect()}
    assert "leaf two" in w1["http://a.test/2.html"]["body"]
    # the documents table itself keeps spans, not bodies — the archive is
    # the only place the raw payload survives
    assert "body" not in c.documents().columns
