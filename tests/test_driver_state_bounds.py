"""Driver-side dict bounds (r3 VERDICT #7): every host-grained driver
structure names its bound — hosts WITH a condition, never all hosts — and
enforces a cap (or spills to the table) so a hostile workload (millions of
erroring/throttling hosts) cannot inflate driver memory.

Inventory of driver dicts and their bounds:
  * Crawler._backoff          ≤ ErrorBackoff.max_hosts    (hosts over the error threshold)
  * Crawler._server_backoff   ≤ ServerBackoff.max_hosts   (hosts standing down after 429/503)
  * Crawler._adaptive_delay   ≤ AdaptivePoliteness.max_hosts (hosts with a learned delay)
  * Crawler._robots_hosts     ≤ _ROBOTS_CACHE_MAX         (cache only: misses fall back to a batch join probe)
  * Crawler._outage_hosts     ≤ _OUTAGE_LEDGER_MAX        (hosts in 5xx outage; overflow SPILLS to table scans)
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (parity with sibling tests)

from kermit_spark.catalog import SnapshotCatalog
from kermit_spark.crawler import (
    AdaptivePoliteness,
    Crawler,
    CrawlConfig,
    ErrorBackoff,
    ServerBackoff,
)
from kermit_spark.fetch import CorpusFetcher
from kermit_spark.frontier import Limit, Politeness

DDL = "url string, host string, status int, content_type string, body string"


def _crawler(spark, tmp_path, corpus, **cfg_kwargs):
    cfg = CrawlConfig(
        num_partitions=2,
        politeness=Politeness((Limit(".*", 10),)),
        **cfg_kwargs,
    )
    return Crawler(
        spark, SnapshotCatalog(spark, str(tmp_path / "cat")),
        CorpusFetcher(corpus), cfg,
    )


def _docs(spark, hosts, status):
    rows = [
        (f"http://{h}/x.html", h, status, "text/plain", None, 0)
        for h in hosts
    ]
    return spark.createDataFrame(
        rows, DDL + ", p int"
    )


def test_server_backoff_dict_bounded_by_max_hosts(spark, tmp_path):
    """_server_backoff holds only hosts standing down after a throttle
    response, and never more than ServerBackoff.max_hosts of those."""
    corpus = spark.createDataFrame([], DDL)
    c = _crawler(
        spark, tmp_path, corpus,
        server_backoff=ServerBackoff(max_hosts=3),
    )
    c._update_server_backoff(0, _docs(spark, [f"h{i}.test" for i in range(7)], 503))
    assert len(c._server_backoff) <= 3
    # a clean host never enters the dict at all
    c._update_server_backoff(1, _docs(spark, ["ok.test"], 200))
    assert "ok.test" not in c._server_backoff


def test_error_backoff_dict_bounded_by_max_hosts(spark, tmp_path):
    """_backoff holds only hosts at/above the error-rate threshold, capped
    at ErrorBackoff.max_hosts (newest cooldowns kept)."""
    corpus = spark.createDataFrame([], DDL)
    c = _crawler(
        spark, tmp_path, corpus,
        error_backoff=ErrorBackoff(max_hosts=2, threshold=0.5),
    )
    hosts = [f"e{i}.test" for i in range(6)]
    per_host = [{"p": 0, "host": h, "count": 1} for h in hosts]
    c._update_error_backoff(0, _docs(spark, hosts, 500), per_host)
    assert len(c._backoff) <= 2


def test_adaptive_delay_dict_bounded_by_max_hosts(spark, tmp_path):
    """_adaptive_delay holds only hosts with a learned AIMD delay, capped
    at AdaptivePoliteness.max_hosts (largest delays kept — they matter)."""
    corpus = spark.createDataFrame([], DDL)
    c = _crawler(
        spark, tmp_path, corpus,
        adaptive_politeness=AdaptivePoliteness(max_hosts=2),
    )
    c._update_adaptive_politeness(_docs(spark, [f"a{i}.test" for i in range(5)], 500))
    assert len(c._adaptive_delay) <= 2


def test_robots_cache_is_a_cache_not_the_truth(spark, tmp_path):
    """_robots_hosts is bounded by _ROBOTS_CACHE_MAX and is ONLY a cache:
    with the cap forced to zero the crawler still gates correctly — every
    membership miss falls through to the batch-sized table probe."""
    corpus = spark.createDataFrame(
        [
            ("http://a.test/robots.txt", "a.test", 200, "text/plain",
             "User-agent: *\nDisallow: /blocked\n"),
            ("http://a.test/ok.html", "a.test", 200, "text/html",
             '<html><body><a href="/blocked/x.html">x</a></body></html>'),
            ("http://a.test/blocked/x.html", "a.test", 200, "text/html",
             "<html>never</html>"),
        ],
        DDL,
    )
    c = _crawler(spark, tmp_path, corpus)
    c._ROBOTS_CACHE_MAX = 0  # hostile-regime simulation: cache disabled
    c.seed(["http://a.test/ok.html"])
    c.crawl(3)
    assert len(c._robots_hosts) == 0  # the cap held
    st = {r["url"]: r["status"] for r in c.frontier.read().collect()}
    assert st["http://a.test/ok.html"] == "visited"
    assert st["http://a.test/blocked/x.html"] == "robots_blocked"


def test_outage_ledger_caps_and_spills_to_table(spark, tmp_path):
    """_outage_hosts is capped at _OUTAGE_LEDGER_MAX; past the cap the
    robots table (the durable server_error markers) drives re-probes, so
    outage hosts beyond the cap still recover when their server does."""
    hosts = [f"h{i}.test" for i in range(4)]
    down = [(f"http://{h}/robots.txt", h, 503, "text/plain", None) for h in hosts]
    pages = [
        (f"http://{h}/1.html", h, 200, "text/html", "<html>x</html>")
        for h in hosts
    ]
    c = _crawler(
        spark, tmp_path, spark.createDataFrame(down + pages, DDL),
        robots_max_age_waves=1,
    )
    c._OUTAGE_LEDGER_MAX = 2  # hostile-regime simulation
    c.seed([f"http://{h}/1.html" for h in hosts])
    c.crawl(1)  # every robots probe 5xx -> 4 outage hosts, cap is 2
    assert len(c._outage_hosts) <= 2
    assert c._outage_overflow is True
    st = {r["url"]: r["status"] for r in c.frontier.read().collect()}
    assert all(st[f"http://{h}/1.html"] == "robots_blocked" for h in hosts)

    # every server recovers; overflow mode must re-probe ALL 4 hosts from
    # the table (the dict only knows 2 of them)
    up = [
        (f"http://{h}/robots.txt", h, 200, "text/plain", "User-agent: *\n")
        for h in hosts
    ]
    c.fetcher = CorpusFetcher(spark.createDataFrame(up + pages, DDL))
    c.crawl(6)
    st = {r["url"]: r["status"] for r in c.frontier.read().collect()}
    assert all(st[f"http://{h}/1.html"] == "visited" for h in hosts), st


def test_page_cap_agg_short_circuits_until_first_attempt(spark, tmp_path):
    """With max_pages_per_host set, a FRESH crawl must not pay the per-wave
    frontier-sized groupBy while nothing has ever been attempted (the agg is
    provably empty). A resumed crawler starts unknowing, resolves once with
    a cheap limit(1) probe, and then sticks with the answer."""
    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.crawler import Crawler, CrawlConfig
    from kermit_spark.fetch import CorpusFetcher
    from kermit_spark.frontier import Limit, Politeness

    corpus = spark.createDataFrame(
        [
            ("http://a.test/1.html", "a.test", 200, "text/html",
             '<html><body><a href="/2.html">x</a></body></html>'),
            ("http://a.test/2.html", "a.test", 200, "text/html",
             "<html><body>leaf</body></html>"),
        ],
        "url string, host string, status int, content_type string, body string",
    )
    root = str(tmp_path / "cat")
    cfg = CrawlConfig(
        num_partitions=2,
        politeness=Politeness((Limit(".*", 5),)),
        obey_robots=False,
        max_pages_per_host=10,
    )
    c = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus), cfg)
    c.seed(["http://a.test/1.html"])
    assert c._any_attempts is False          # seed() proves freshness
    assert c._page_cap_budgets() is None     # short-circuit: no frontier agg
    c.crawl(1)
    assert c._any_attempts is True           # wave dequeued something
    assert c._page_cap_budgets() is not None

    # resume: flag starts unknown, the probe resolves it from the frontier
    c2 = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus), cfg)
    assert c2._any_attempts is None
    assert c2._page_cap_budgets() is not None
    assert c2._any_attempts is True          # cached — no more probes

    # resume of a NEVER-crawled catalog: probe answers False and caches it
    root2 = str(tmp_path / "cat2")
    c3 = Crawler(spark, SnapshotCatalog(spark, root2), CorpusFetcher(corpus), cfg)
    c3.seed(["http://a.test/1.html"])
    c4 = Crawler(spark, SnapshotCatalog(spark, root2), CorpusFetcher(corpus), cfg)
    assert c4._any_attempts is None
    assert c4._page_cap_budgets() is None
    assert c4._any_attempts is False
