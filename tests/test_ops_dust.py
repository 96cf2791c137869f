"""DUST-style irrelevant-parameter mining (ops/dust.py).

Evidence semantics: a parameter is irrelevant only when >= min_support
variant groups agree the content never changes AND no group anywhere
contradicts it. The fixtures exercise: multi-value support, the absent
variant (a crawled URL equal to a group's rest), order-preserving rest
reconstruction, and the single-counterexample veto."""

from __future__ import annotations

from pyspark.sql import functions as F

from kermit_spark.ops.dust import (
    explode_params,
    mine_irrelevant_params,
    strip_params,
)


def _corpus(spark):
    rows = [
        # page p1: sid varies (3 values + absent), content constant
        ("http://a.test/p1?page=1", "H1"),
        ("http://a.test/p1?page=1&sid=x", "H1"),
        ("http://a.test/p1?page=1&sid=y", "H1"),
        ("http://a.test/p1?sid=z&page=1", "H1"),  # order varies
        # page p1, page=2: different content; sid still irrelevant
        ("http://a.test/p1?page=2&sid=x", "H2"),
        ("http://a.test/p1?page=2&sid=q", "H2"),
        # page p2: 'sort' CHANGES content -> violation for sort
        ("http://b.test/p2?sort=asc", "H3"),
        ("http://b.test/p2?sort=desc", "H4"),
        # 'ref' has only ONE support group -> below min_support=2
        ("http://c.test/p3?ref=1", "H5"),
        ("http://c.test/p3?ref=2", "H5"),
    ]
    return spark.createDataFrame(rows, ["url", "content_hash"])


def test_explode_params_rest_preserves_order(spark):
    df = spark.createDataFrame(
        [("http://a.test/p?x=1&y=2&z=3", "H")], ["url", "content_hash"]
    )
    rows = {
        r["param"]: r["rest"] for r in explode_params(df).collect()
    }
    assert rows == {
        "x": "http://a.test/p?y=2&z=3",
        "y": "http://a.test/p?x=1&z=3",
        "z": "http://a.test/p?x=1&y=2",
    }


def test_mine_verdicts(spark):
    out = {
        r["param"]: r.asDict()
        for r in mine_irrelevant_params(_corpus(spark), min_support=2).collect()
    }
    assert out["sid"]["irrelevant"] is True
    # sid groups: (p1?page=1, sid) with 4 variants (3 values + absent) and
    # (p1?page=2, sid) with 2 values — both single-hash
    assert out["sid"]["n_support"] == 2
    assert out["sid"]["n_violation"] == 0
    # sort changes the hash -> veto
    assert out["sort"]["irrelevant"] is False
    assert out["sort"]["n_violation"] == 1
    # ref: one support group < min_support
    assert out["ref"]["irrelevant"] is False
    assert out["ref"]["n_support"] == 1
    # page: its variant groups (rest = ...?sid=x) have differing hashes
    assert out["page"]["irrelevant"] is False
    assert out["page"]["n_violation"] >= 1


def test_absent_variant_counts(spark):
    # two values of k never co-crawled with the bare URL -> still support;
    # a single value + absent form -> also support (2 distinct variants)
    rows = [
        ("http://a.test/q", "H1"),
        ("http://a.test/q?k=1", "H1"),
    ]
    df = spark.createDataFrame(rows, ["url", "content_hash"])
    out = mine_irrelevant_params(df, min_support=1).collect()
    assert len(out) == 1 and out[0]["irrelevant"] is True


def test_strip_params(spark):
    df = spark.createDataFrame(
        [
            ("http://a.test/p?page=1&sid=x&ref=2",),
            ("http://a.test/p?sid=x",),
            ("http://a.test/bare",),
        ],
        ["url"],
    )
    got = [
        r["url"]
        for r in strip_params(df, ["sid", "ref"]).orderBy(F.length("url").desc()).collect()
    ]
    assert got == [
        "http://a.test/p?page=1",
        "http://a.test/bare",
        "http://a.test/p",
    ]


def test_crawler_strips_mined_params(spark, tmp_path):
    """CrawlConfig.strip_query_params end-to-end: seeds and discovered links
    carrying session-id variants collapse to ONE canonical frontier row each
    — the seen-set never learns the throwaway aliases."""
    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.crawler import Crawler, CrawlConfig
    from kermit_spark.fetch import CorpusFetcher
    from kermit_spark.frontier import Limit, Politeness

    rows = [
        ("http://a.test/home.html", "a.test", 200, "text/html",
         '<html><body>'
         '<a href="http://a.test/item.html?page=1&sid=111">one</a>'
         '<a href="http://a.test/item.html?page=1&sid=222">dup</a>'
         '<a href="http://a.test/item.html?page=2&sid=333">two</a>'
         '</body></html>'),
        ("http://a.test/item.html?page=1", "a.test", 200, "text/html",
         "<html><body><p>p1</p></body></html>"),
        ("http://a.test/item.html?page=2", "a.test", 200, "text/html",
         "<html><body><p>p2</p></body></html>"),
    ]
    corpus = spark.createDataFrame(
        rows, "url string, host string, status int, content_type string, body string"
    )
    cfg = CrawlConfig(
        num_partitions=4,
        politeness=Politeness((Limit(".*", 10),)),
        obey_robots=False,
        strip_query_params=["sid"],
    )
    crawler = Crawler(
        spark, SnapshotCatalog(spark, str(tmp_path / "c")), CorpusFetcher(corpus), cfg
    )
    # the seed itself carries a session id too
    crawler.seed(["http://a.test/home.html?sid=seed0"])
    stats = crawler.crawl(3)
    # single-host waves are perfectly fair by definition (WaveStats
    # jain_fairness rides the per-host collect, no extra jobs)
    assert stats[0].jain_fairness == 1.0

    frontier = {r["url"]: r["status"] for r in crawler.frontier.read().collect()}
    assert set(frontier) == {
        "http://a.test/home.html",
        "http://a.test/item.html?page=1",
        "http://a.test/item.html?page=2",
    }
    docs = crawler.documents().select("url", "status").collect()
    assert sorted(r["url"] for r in docs if r["status"] == 200) == [
        "http://a.test/home.html",
        "http://a.test/item.html?page=1",
        "http://a.test/item.html?page=2",
    ]
