"""RemoteControl (S11 analog): HTTP schedule/stop/status driving a live
crawl at wave boundaries (ext.RemoteControl.coffee:6-45 re-expressed for
wave execution)."""

import json
import urllib.error
import urllib.request

import pytest

from kermit_spark.catalog import SnapshotCatalog
from kermit_spark.control import RemoteControl
from kermit_spark.corpus import CorpusSpec, build_corpus
from kermit_spark.crawler import Crawler, CrawlConfig
from kermit_spark.fetch import CorpusFetcher
from kermit_spark.frontier import Limit, Politeness


@pytest.fixture(scope="module")
def corpus_df(spark):
    df = build_corpus(spark, CorpusSpec(n_hosts=6, base_pages=20, media_id_space=30)).persist()
    df.count()
    yield df
    df.unpersist()


def _post(base, path, payload=None):
    req = urllib.request.Request(
        f"{base}{path}", data=json.dumps(payload or {}).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=5) as resp:
        return resp.status, json.loads(resp.read())


def _crawler(spark, corpus_df, tmp_path, name):
    cfg = CrawlConfig(
        num_partitions=4, politeness=Politeness((Limit(r".*", 10),)), sub_salts=4
    )
    return Crawler(
        spark, SnapshotCatalog(spark, str(tmp_path / name)), CorpusFetcher(corpus_df), cfg
    )


def test_remote_schedule_is_crawled(spark, corpus_df, tmp_path):
    crawler = _crawler(spark, corpus_df, tmp_path, "rc1")
    crawler.seed(["http://h0.test/p/0.html"])
    rc = RemoteControl(crawler)
    host, port = rc.start()
    base = f"http://{host}:{port}"
    try:
        # h5 is not reachable from the h0 seed within 2 waves — inject it
        code, body = _post(base, "/requests/schedule", {"url": "http://h5.test/p/0.html"})
        assert code == 202 and body["queued"].endswith("h5.test/p/0.html")
        crawler.crawl(2, remote=rc)
    finally:
        rc.stop_server()
    statuses = {
        r["url"]: r["status"] for r in crawler.frontier.read().collect()
    }
    assert statuses["http://h5.test/p/0.html"] == "visited"


def test_remote_stop_and_status(spark, corpus_df, tmp_path):
    crawler = _crawler(spark, corpus_df, tmp_path, "rc2")
    crawler.seed(["http://h0.test/p/0.html"])
    rc = RemoteControl(crawler)
    host, port = rc.start()
    base = f"http://{host}:{port}"
    try:
        code, body = _post(base, "/commands/stop")
        assert code == 202 and body["stopping"]
        stats = crawler.crawl(5, remote=rc)
        assert len(stats) == 1  # stopped after the current wave
        with urllib.request.urlopen(f"{base}/status", timeout=5) as resp:
            status = json.loads(resp.read())
        assert status["stop_requested"] is True
        assert status["last_wave"] == 0
    finally:
        rc.stop_server()


def test_remote_rejects_bad_requests(spark, corpus_df, tmp_path):
    crawler = _crawler(spark, corpus_df, tmp_path, "rc3")
    rc = RemoteControl(crawler, max_buffer=1)
    host, port = rc.start()
    base = f"http://{host}:{port}"
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base, "/requests/schedule", {"url": "not-a-url"})
        assert e.value.code == 400
        assert _post(base, "/requests/schedule", {"url": "http://h0.test/x"})[0] == 202
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base, "/requests/schedule", {"url": "http://h0.test/y"})
        assert e.value.code == 429  # buffer cap
    finally:
        rc.stop_server()
