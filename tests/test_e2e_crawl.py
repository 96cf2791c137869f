"""E2E golden crawl (Crawler.int.spec.coffee:10-55 analog, SURVEY §5/§7):
the engine crawl over the synthetic corpus must equal an independent
pure-Python BFS oracle on

  * the final URL-seen set (SURVEY §2.8 contract #3),
  * per-URL depth + discovery-wave assignment (contract #1),
  * per-URL final status incl. robots blocking,
  * politeness: per-host fetches per wave never exceed the budget,
  * span-sequence equality (kind, text, media_ref, order) for every
    document — the input_hint per-row invariant,
  * crawl order (wave, host, rank) reproducibility (contract: deterministic
    and identical across runs/resumes).

Plus the resume test (QueueSystem.spec.coffee:45-54 analog): kill after
wave k, rebuild every object from disk, continue — results identical to an
uninterrupted run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kermit_spark.catalog import SnapshotCatalog
from kermit_spark.corpus import CorpusSpec, build_corpus
from kermit_spark.crawler import Crawler, CrawlConfig
from kermit_spark.fetch import CorpusFetcher
from kermit_spark.frontier import Limit, Politeness

from oracle import oracle_crawl

SPEC = CorpusSpec(n_hosts=7, base_pages=30, media_id_space=40)
BUDGET = 6
WAVES = 4
SEEDS = ["http://h0.test/p/0.html", "http://h3.test/p/0.html"]


@pytest.fixture(scope="module")
def corpus_df(spark):
    df = build_corpus(spark, SPEC).persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def corpus_map(corpus_df):
    return {
        r["url"]: (r["status"], r["content_type"], r["body"])
        for r in corpus_df.collect()
    }


@pytest.fixture(scope="module")
def url_hashes(spark, corpus_df):
    # corpus URLs plus their '?a>b' discovery variants (corpus quoting
    # style 5 appends the query inside the quoted attribute value; cleaning
    # percent-encodes it) — the oracle needs a hash for every URL that can
    # enter the frontier, fetched or not
    urls = corpus_df.select("url").union(
        corpus_df.select(F.concat(F.col("url"), F.lit("?a%3Eb")).alias("url"))
    )
    rows = urls.select("url", F.xxhash64("url").alias("h")).collect()
    return {r["url"]: r["h"] for r in rows}


@pytest.fixture(scope="module")
def engine_result(spark, corpus_df, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    cfg = CrawlConfig(
        num_partitions=8,
        politeness=Politeness((Limit(r".*", BUDGET),)),
        sub_salts=4,
    )
    crawler = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus_df), cfg)
    crawler.seed(SEEDS)
    stats = crawler.crawl(WAVES)
    return crawler, stats


@pytest.fixture(scope="module")
def oracle_result(corpus_map, url_hashes):
    return oracle_crawl(
        corpus_map, SEEDS, url_hashes, limits=[(".*", BUDGET)], max_waves=WAVES
    )


def test_url_seen_set_matches(engine_result, oracle_result):
    crawler, _ = engine_result
    engine_urls = {r["url"] for r in crawler.frontier.read().select("url").collect()}
    assert engine_urls == set(oracle_result.frontier)


def test_depth_wave_status_match(engine_result, oracle_result):
    crawler, _ = engine_result
    got = {
        r["url"]: (r["depth"], r["wave"], r["status"])
        for r in crawler.frontier.read().collect()
    }
    want = {
        u: (rec["depth"], rec["wave"], rec["status"])
        for u, rec in oracle_result.frontier.items()
    }
    assert got == want


def test_politeness_budget_invariant(engine_result):
    crawler, _ = engine_result
    docs = crawler.documents()
    per = (
        docs.groupBy("p", "host").count().agg(F.max("count")).first()[0]
    )  # docs partition col p == fetch wave
    assert per <= BUDGET


def test_crawl_order_invariant_to_partitioning(spark, corpus_df, engine_result, tmp_path):
    """North-rule reproducibility: the crawl order (wave, host, rank) and
    the final URL-seen set are pure functions of (seed list, politeness
    budget, corpus) — re-running with DIFFERENT partition counts and
    sub-salts (the knobs a different cluster size would change) must
    produce byte-identical results."""
    cfg = CrawlConfig(
        num_partitions=3,  # vs the fixture's 8
        politeness=Politeness((Limit(r".*", BUDGET),)),
        sub_salts=2,  # vs the fixture's 4
    )
    other = Crawler(spark, SnapshotCatalog(spark, str(tmp_path)), CorpusFetcher(corpus_df), cfg)
    other.seed(SEEDS)
    other.crawl(WAVES)
    crawler, _ = engine_result

    def order_of(c):
        return {
            (r["p"], r["host"], r["rank"]): r["url"]
            for r in c.documents().select("p", "host", "rank", "url").collect()
        }

    def seen_of(c):
        return {
            r["url"]: (r["status"], r["depth"], r["wave"])
            for r in c.frontier.read().collect()
        }

    assert order_of(other) == order_of(crawler)
    assert seen_of(other) == seen_of(crawler)


def test_sitemap_discovers_orphan_page(engine_result):
    """Host 1 (h%6==1) lists /sm/only.html in its sitemap; the page is
    linked from nowhere else, so its presence as a visited document proves
    sitemap-driven discovery end-to-end (the sitemap itself is a
    side-channel fetch and must NOT appear in the frontier)."""
    crawler, _ = engine_result
    orphan = "http://h1.test/sm/only.html"
    rows = {r["url"]: r["status"] for r in crawler.frontier.read().collect()}
    assert rows.get(orphan) == "visited", rows.get(orphan)
    assert "http://h1.test/sitemap.xml" not in rows
    docs = crawler.documents().filter(F.col("url") == orphan).collect()
    assert len(docs) == 1 and docs[0]["status"] == 200


def test_crawl_delay_cap_binds(engine_result):
    """Host 5 (h%9==5) declares Crawl-delay: 60 → cap 1 URL/wave from the
    wave after its robots fetch. The cap must BIND (≤1 per later wave) and
    the host must still make progress across waves (≥2 total fetches) —
    otherwise this invariant would be vacuously green."""
    crawler, _ = engine_result
    per_wave = {
        r["p"]: r["n"]
        for r in crawler.documents()
        .filter(F.col("host") == "h5.test")
        .groupBy("p")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_wave, "capped host never fetched — corpus shape changed?"
    first = min(per_wave)
    later = {w: n for w, n in per_wave.items() if w > first}
    assert later, "capped host only fetched once — cap never exercised"
    assert all(n <= 1 for n in later.values()), per_wave


def test_span_sequences_match(engine_result, oracle_result):
    crawler, _ = engine_result
    rows = crawler.documents().select("url", "status", "spans").collect()
    got = {
        r["url"]: [tuple(s) for s in (r["spans"] or [])]
        for r in rows
    }
    want = {u: s for u, s in oracle_result.documents.items()}
    assert set(got) == set(want)
    mismatches = {u for u in got if got[u] != want[u]}
    assert not mismatches, f"span mismatch for {sorted(mismatches)[:3]}"


def test_crawl_order_matches(engine_result, oracle_result):
    crawler, _ = engine_result
    rows = crawler.documents().select("p", "host", "rank", "url").collect()
    got = {(r["p"], r["host"], r["rank"]): r["url"] for r in rows}
    assert got == oracle_result.crawl_order


def test_robots_actually_blocked(engine_result, oracle_result):
    """Hosts h2 (h%5==2 → /p/1 prefix) must have blocked rows; blocked URLs
    never appear in documents."""
    crawler, _ = engine_result
    blocked = {
        r["url"]
        for r in crawler.frontier.read().filter(F.col("status") == "robots_blocked").collect()
    }
    want_blocked = {
        u for u, rec in oracle_result.frontier.items() if rec["status"] == "robots_blocked"
    }
    assert blocked == want_blocked
    fetched = {r["url"] for r in crawler.documents().select("url").collect()}
    assert not (blocked & fetched)


def test_lineage_ledger_rows(engine_result):
    crawler, stats = engine_result
    lin = crawler.lineage()
    waves = {r["wave"] for r in lin.select("wave").distinct().collect()}
    assert waves == {s.wave for s in stats}
    deq = {r["wave"]: r["n"] for r in lin.filter(F.col("stage") == "dequeue").collect()}
    assert deq == {s.wave: s.n_selected for s in stats}
    # per-partition lineage (north rule): the dequeue split is always
    # recorded, sums to the wave total, and every part id is a real
    # partition of the configured frontier
    pp = lin.filter(F.col("stage") == "dequeue_part").collect()
    by_wave: dict[int, int] = {}
    for r in pp:
        assert r["part"] is not None and 0 <= r["part"] < 8
        by_wave[r["wave"]] = by_wave.get(r["wave"], 0) + r["n"]
    assert by_wave == deq


def test_auto_compaction_preserves_results(spark, corpus_df, oracle_result, tmp_path_factory):
    """compact_every folds fast-appended frontier file sets mid-crawl; the
    final frontier must equal the oracle exactly (compaction is maintenance,
    never semantics)."""
    root = str(tmp_path_factory.mktemp("compact"))
    cfg = CrawlConfig(
        num_partitions=8,
        politeness=Politeness((Limit(r".*", BUDGET),)),
        sub_salts=4,
        compact_every=1,
        expire_keep_last=2,
    )
    crawler = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus_df), cfg)
    crawler.seed(SEEDS)
    crawler.crawl(WAVES)
    got = {
        r["url"]: (r["depth"], r["wave"], r["status"])
        for r in crawler.frontier.read().collect()
    }
    want = {
        u: (rec["depth"], rec["wave"], rec["status"])
        for u, rec in oracle_result.frontier.items()
    }
    assert got == want
    # expiry ran: only the retained snapshots remain in frontier metadata,
    # and a fresh instance (resume) still reads the identical frontier
    meta = crawler.catalog._load_meta("frontier")
    assert len(meta.snapshots) <= 2 + 1  # keep_last + commits after last compact
    resumed = Crawler(
        spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus_df), cfg
    )
    got2 = {
        r["url"]: (r["depth"], r["wave"], r["status"])
        for r in resumed.frontier.read().collect()
    }
    assert got2 == want


def test_randomized_delay_reaches_same_closure(spark, corpus_df, corpus_map, url_hashes, tmp_path_factory):
    """Q10: deferral postpones fetches but never loses URLs — run the
    delayed crawl to exhaustion and it visits exactly the reachable closure
    the (undelayed) oracle computes; nothing is left scheduled."""
    from kermit_spark.frontier import RandomizedDelay

    root = str(tmp_path_factory.mktemp("delay"))
    cfg = CrawlConfig(
        num_partitions=8,
        politeness=Politeness((Limit(r".*", BUDGET),)),
        sub_salts=4,
        delay=RandomizedDelay(ratio=0.4, seed=3),
        max_waves=40,
    )
    delayed = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus_df), cfg)
    delayed.seed(SEEDS)
    delayed.crawl()  # to exhaustion (wave selects nothing, even undelayed)

    oracle = oracle_crawl(
        corpus_map, SEEDS, url_hashes, limits=[(".*", BUDGET)], max_waves=40
    )
    got = {
        r["url"] for r in delayed.frontier.read().filter(F.col("status") == "visited").collect()
    }
    want = {u for u, rec in oracle.frontier.items() if rec["status"] == "visited"}
    assert got == want
    assert not delayed.has_work()


def test_resume_equals_uninterrupted(spark, corpus_df, corpus_map, url_hashes, tmp_path_factory):
    """Run 1 wave, drop every driver object, rebuild from disk, finish the
    crawl — frontier and documents equal the oracle (hence equal an
    uninterrupted engine run)."""
    root = str(tmp_path_factory.mktemp("resume"))
    cfg = CrawlConfig(
        num_partitions=8, politeness=Politeness((Limit(r".*", BUDGET),)), sub_salts=4
    )
    c1 = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus_df), cfg)
    c1.seed(SEEDS)
    c1.crawl(1)
    assert c1.last_wave == 0
    del c1

    c2 = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus_df), cfg)
    assert c2.last_wave == 0  # resume point recovered from snapshot props
    c2.crawl(WAVES - 1)

    oracle = oracle_crawl(
        corpus_map, SEEDS, url_hashes, limits=[(".*", BUDGET)], max_waves=WAVES
    )
    got = {
        r["url"]: (r["depth"], r["wave"], r["status"])
        for r in c2.frontier.read().collect()
    }
    want = {
        u: (rec["depth"], rec["wave"], rec["status"])
        for u, rec in oracle.frontier.items()
    }
    assert got == want
    rows = c2.documents().select("p", "host", "rank", "url").collect()
    assert {(r["p"], r["host"], r["rank"]): r["url"] for r in rows} == oracle.crawl_order


def test_arrow_batch_pinned_during_crawl(spark, corpus_df, tmp_path_factory, monkeypatch):
    """crawl() pins spark.sql.execution.arrow.maxRecordsPerBatch to 512 for
    the wave loop when the session sits at Spark's default (10000), and
    restores the original value afterwards; an explicit caller setting is
    respected untouched. (100 MB-class Arrow batches from ~10 kB bodies are
    5-7x slower through the parse UDF — see session.py.)"""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    orig = spark.conf.get(key)
    seen_during = []
    real_run_wave = Crawler.run_wave

    def spying_run_wave(self):
        seen_during.append(self.spark.conf.get(key))
        return real_run_wave(self)

    monkeypatch.setattr(Crawler, "run_wave", spying_run_wave)
    cfg = CrawlConfig(
        num_partitions=4, politeness=Politeness((Limit(r".*", 2),))
    )
    try:
        # default session value -> pinned to 512 during waves, restored after
        spark.conf.set(key, "10000")
        root = str(tmp_path_factory.mktemp("abpin"))
        c = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus_df), cfg)
        c.seed(SEEDS[:1])
        c.crawl(1)
        assert seen_during[-1] == "512"
        assert spark.conf.get(key) == "10000"

        # explicit caller value -> left alone
        spark.conf.set(key, "2048")
        root2 = str(tmp_path_factory.mktemp("abpin2"))
        c2 = Crawler(spark, SnapshotCatalog(spark, root2), CorpusFetcher(corpus_df), cfg)
        c2.seed(SEEDS[:1])
        c2.crawl(1)
        assert seen_during[-1] == "2048"
        assert spark.conf.get(key) == "2048"
    finally:
        spark.conf.set(key, orig)


def test_reprioritize_changes_order_not_closure(spark, corpus_df, corpus_map, url_hashes, tmp_path_factory):
    """PageRank reprioritization reorders dequeue WITHIN the politeness
    budget but never loses URLs: run to exhaustion and the visited set is
    exactly the oracle's reachable closure, with importance-fed priorities
    visible in the frontier."""
    root = str(tmp_path_factory.mktemp("reprio"))
    cfg = CrawlConfig(
        num_partitions=8,
        politeness=Politeness((Limit(r".*", BUDGET),)),
        sub_salts=4,
        reprioritize_every=1,
        lineage_per_partition=True,
        max_waves=40,
    )
    c = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus_df), cfg)
    c.seed(SEEDS)
    c.crawl()

    oracle = oracle_crawl(
        corpus_map, SEEDS, url_hashes, limits=[(".*", BUDGET)], max_waves=40
    )
    got = {
        r["url"]
        for r in c.frontier.read().filter(F.col("status") == "visited").collect()
    }
    want = {u for u, rec in oracle.frontier.items() if rec["status"] == "visited"}
    assert got == want
    assert not c.has_work()
    # reprioritization actually wrote importance scores: multi-in-link pages
    # exist in the corpus, so some priorities must now be > 0
    n_ranked = c.frontier.read().filter(F.col("priority") > 0).count()
    assert n_ranked > 0
    # opt-in per-partition fetch lineage: store_part counts sum to the
    # wave-level store counts
    lin = c.lineage()
    store = {r["wave"]: r["n"] for r in lin.filter(F.col("stage") == "store").collect()}
    store_pp: dict[int, int] = {}
    for r in lin.filter(F.col("stage") == "store_part").collect():
        assert r["part"] is not None
        store_pp[r["wave"]] = store_pp.get(r["wave"], 0) + r["n"]
    assert store_pp == store


def test_error_backoff_halves_failing_host_budget(spark, tmp_path_factory):
    """Adaptive politeness: a host erroring on every fetch gets its budget
    cut geometrically (4 -> 2 -> 1 -> 1 ...) while a healthy host keeps the
    configured budget; caps expire by wave."""
    from kermit_spark.crawler import ErrorBackoff

    rows = [
        (f"http://bad.test/p/{i}", 500, "text/html", "server error") for i in range(10)
    ] + [
        (f"http://good.test/p/{i}", 200, "text/html", "plain page no links") for i in range(10)
    ]
    corpus = spark.createDataFrame(rows, "url string, status int, content_type string, body string")
    cfg = CrawlConfig(
        num_partitions=4,
        politeness=Politeness((Limit(r".*", 4),)),
        sub_salts=2,
        obey_robots=False,
        error_backoff=ErrorBackoff(threshold=0.5, factor=2, min_budget=1, cooldown_waves=10),
        max_waves=8,
    )
    root = str(tmp_path_factory.mktemp("backoff"))
    c = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus), cfg)
    c.seed([r[0] for r in rows])
    c.crawl()

    per = {
        (r["p"], r["host"]): r["count"]
        for r in c.documents().groupBy("p", "host").count().collect()
    }
    bad = [per.get((w, "bad.test"), 0) for w in range(8)]
    good = [per.get((w, "good.test"), 0) for w in range(8)]
    # healthy host: full budget until exhausted
    assert good[:3] == [4, 4, 2]
    # failing host: 4 at wave 0, then 2, then pinned at min_budget 1
    assert bad[0] == 4 and bad[1] == 2
    assert all(n == 1 for n in bad[2:6])
    assert sum(bad) == 10  # backoff slows, never loses, the host's URLs
    # cap bookkeeping: expiry honors the wave horizon
    assert c._error_backoff_caps(wave=5) is not None
    last_exp = max(exp for _, exp in c._backoff.values())
    assert c._error_backoff_caps(wave=last_exp + 1) is None


def test_sitemap_index_expands_one_level(spark, tmp_path_factory):
    """Sitemapindex e2e: robots declares a sitemap INDEX; its child sitemaps
    are fetched inside the same lazy plan and their page locs become depth-0
    candidates — orphan pages reachable only through the index get crawled.
    The index and child sitemap files themselves never enter the frontier."""
    h = "http://smidx.test"
    rows = [
        (
            f"{h}/robots.txt", 200, "text/plain",
            f"User-agent: *\nSitemap: {h}/sm/index.xml\n",
        ),
        (
            f"{h}/sm/index.xml", 200, "application/xml",
            "<sitemapindex>"
            f"<sitemap><loc>{h}/sm/a.xml</loc></sitemap>"
            f"<sitemap><loc>{h}/sm/b.xml</loc></sitemap>"
            "</sitemapindex>",
        ),
        (
            f"{h}/sm/a.xml", 200, "application/xml",
            f"<urlset><url><loc>{h}/orphan/a</loc></url></urlset>",
        ),
        (
            f"{h}/sm/b.xml", 200, "application/xml",
            f"<urlset><url><loc>{h}/orphan/b</loc></url></urlset>",
        ),
        (f"{h}/p/0", 200, "text/html", "<html>seed, links nowhere</html>"),
        (f"{h}/orphan/a", 200, "text/html", "<html>orphan a</html>"),
        (f"{h}/orphan/b", 200, "text/html", "<html>orphan b</html>"),
    ]
    corpus = spark.createDataFrame(
        rows, "url string, status int, content_type string, body string"
    )
    cfg = CrawlConfig(
        num_partitions=4,
        politeness=Politeness((Limit(r".*", 8),)),
        sub_salts=2,
        obey_robots=True,
        max_waves=4,
    )
    root = str(tmp_path_factory.mktemp("smidx"))
    c = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus), cfg)
    c.seed([f"{h}/p/0"])
    c.crawl()
    visited = {
        r["url"] for r in c.frontier.read().filter(F.col("status") == "visited").collect()
    }
    assert visited == {f"{h}/p/0", f"{h}/orphan/a", f"{h}/orphan/b"}
    seen = {r["url"] for r in c.frontier.read().collect()}
    assert not any("sm/" in u or "robots" in u for u in seen)


def test_trap_rules_block_discovery(spark, tmp_path_factory):
    """TrapRules e2e: a discovered symlink-loop URL never enters the
    frontier (and never burns budget), while its healthy sibling is crawled;
    a trap seed is rejected at seed time."""
    from kermit_spark.filters import TrapRules

    trap = "http://trap.test/a/loop/loop/loop/x"
    rows = [
        (
            "http://trap.test/p/0",
            200,
            "text/html",
            f'<html><a href="{trap}">t</a><a href="/p/1">ok</a></html>',
        ),
        ("http://trap.test/p/1", 200, "text/html", "<html>leaf</html>"),
        (trap, 200, "text/html", "<html>infinite</html>"),
    ]
    corpus = spark.createDataFrame(
        rows, "url string, status int, content_type string, body string"
    )
    cfg = CrawlConfig(
        num_partitions=4,
        politeness=Politeness((Limit(r".*", 8),)),
        sub_salts=2,
        obey_robots=False,
        max_waves=4,
        trap_rules=TrapRules(),
    )
    root = str(tmp_path_factory.mktemp("trap"))
    c = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus), cfg)
    c.seed(["http://trap.test/p/0", trap])  # trap seed rejected up front
    c.crawl()
    seen = {r["url"] for r in c.frontier.read().collect()}
    assert seen == {"http://trap.test/p/0", "http://trap.test/p/1"}
    fetched = {r["url"] for r in c.documents().collect()}
    assert trap not in fetched


def test_conditional_refetch_revalidates_with_304(spark, tmp_path_factory):
    """Conditional re-fetch e2e: first visit stores each page's ETag in the
    frontier; a recrawl of unchanged pages revalidates with 304 (no body, no
    spans, counted as visits), while a changed page re-fetches fully and its
    new validator replaces the stored one. latest_documents() resolves every
    URL to its newest contentful row."""
    def corpus(version0: str):
        rows = [
            (
                f"http://cond.test/p/{i}",
                200,
                "text/html",
                f'<html>page {i} {"v2" if (i == 0 and version0 == "v2") else "v1"} '
                f'<a href="/p/{(i + 1) % 4}">n</a></html>',
                f'W/"{version0 if i == 0 else "v1"}-{i}"',
            )
            for i in range(4)
        ]
        return spark.createDataFrame(
            rows,
            "url string, status int, content_type string, body string, etag string",
        )

    cfg = CrawlConfig(
        num_partitions=4,
        politeness=Politeness((Limit(r".*", 8),)),
        sub_salts=2,
        obey_robots=False,
        max_waves=3,
    )
    root = str(tmp_path_factory.mktemp("cond"))
    cat = SnapshotCatalog(spark, root)
    c = Crawler(spark, cat, CorpusFetcher(corpus("v1")), cfg)
    c.seed([f"http://cond.test/p/{i}" for i in range(4)])
    stats = c.crawl()
    assert stats[0].n_fetched_ok == 4 and stats[0].n_not_modified == 0
    # validators stored in the frontier on first visit
    fr = {r["url"]: r for r in c.frontier.read().collect()}
    for i in range(4):
        assert fr[f"http://cond.test/p/{i}"]["etag"] == f'W/"v1-{i}"'

    # age everything; page 0's content (and ETag) changed upstream
    assert c.recrawl(F.lit(True)) == 4
    c2 = Crawler(spark, cat, CorpusFetcher(corpus("v2")), cfg)
    s = c2.run_wave()
    assert s.n_not_modified == 3  # pages 1-3 revalidate
    assert s.n_fetched_ok == 1    # page 0 re-fetches fully
    assert s.n_errors == 0
    fr2 = {r["url"]: r for r in c2.frontier.read().collect()}
    assert all(r["status"] == "visited" for r in fr2.values())
    assert fr2["http://cond.test/p/0"]["etag"] == 'W/"v2-0"'   # replaced
    assert fr2["http://cond.test/p/1"]["etag"] == 'W/"v1-1"'   # kept
    # 304 marker rows carry no spans; the earlier 200 rows stay authoritative
    marker = c2.documents().filter(F.col("status") == 304)
    assert marker.count() == 3
    assert marker.filter(F.size("spans") > 0).count() == 0
    latest = {r["url"]: r for r in c2.latest_documents().collect()}
    assert len(latest) == 4
    texts = {
        u: " ".join(s["text"] for s in r["spans"] if s["kind"] == "text")
        for u, r in latest.items()
    }
    assert "v2" in texts["http://cond.test/p/0"]       # superseded by re-fetch
    assert "v1" in texts["http://cond.test/p/1"]       # original row wins
    assert latest["http://cond.test/p/1"]["wave"] == 0


def test_recrawl_policy_refetches_aged_pages(spark, tmp_path_factory):
    """Freshness policy e2e: with recrawl_after_waves=2 the same URLs are
    re-fetched every ~2 waves (documents accumulate one row per fetch),
    politeness budget still bounds every wave, and the crawl runs to the
    max_waves cap instead of draining."""
    rows = [
        (f"http://fresh.test/p/{i}", 200, "text/html", f"page {i} plain") for i in range(4)
    ]
    corpus = spark.createDataFrame(
        rows, "url string, status int, content_type string, body string"
    )
    cfg = CrawlConfig(
        num_partitions=4,
        politeness=Politeness((Limit(r".*", 4),)),
        sub_salts=2,
        obey_robots=False,
        recrawl_after_waves=2,
        max_waves=5,
    )
    root = str(tmp_path_factory.mktemp("recrawl"))
    c = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus), cfg)
    c.seed([r[0] for r in rows])
    stats = c.crawl()
    # 5 ticks = fetch, idle, re-fetch, idle, re-fetch (idle ticks advance the
    # virtual age clock; only fetching waves produce stats)
    assert len(stats) == 3
    fetch_counts = {
        r["url"]: r["count"] for r in c.documents().groupBy("url").count().collect()
    }
    assert set(fetch_counts) == {r[0] for r in rows}
    assert all(n >= 2 for n in fetch_counts.values())  # every page re-fetched
    # politeness never exceeded in any wave
    per_wave = c.documents().groupBy("p", "host").count().collect()
    assert all(r["count"] <= 4 for r in per_wave)
    # Crawler-level passthroughs: manual recrawl flips the visited rows;
    # evict then forgets the host entirely
    assert c.recrawl(F.col("host") == "fresh.test") == 4
    assert c.evict(F.col("host") == "fresh.test") == 4
    assert c.frontier.read().count() == 0


def test_rollback_to_wave_recovers_all_crawl_state(spark, tmp_path):
    """Roll a 3-wave crawl back to wave 0: frontier AND documents shrink to
    wave-0 state, dedup semantics survive the stale (superset) seen-filter,
    and a fresh crawl re-runs the dropped waves to the identical closure."""
    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.crawler import DOCUMENTS_TABLE, Crawler, CrawlConfig
    from kermit_spark.fetch import CorpusFetcher
    from kermit_spark.frontier import Limit, Politeness

    rows = [
        ("http://a.test/1.html", "a.test", 200, "text/html",
         '<html><body><a href="/2.html">x</a></body></html>'),
        ("http://a.test/2.html", "a.test", 200, "text/html",
         '<html><body><a href="/3.html">y</a></body></html>'),
        ("http://a.test/3.html", "a.test", 200, "text/html",
         "<html><body>leaf</body></html>"),
    ]
    corpus = spark.createDataFrame(
        rows, "url string, host string, status int, content_type string, body string"
    )
    root = str(tmp_path / "cat")
    cfg = CrawlConfig(
        num_partitions=2, politeness=Politeness((Limit(".*", 10),)), obey_robots=False
    )
    c = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus), cfg)
    c.seed(["http://a.test/1.html"])
    c.crawl(3)
    full = sorted(
        (r["url"], r["status"]) for r in c.frontier.read().collect()
    )
    c.rollback_to_wave(0)
    st = {r["url"]: r["status"] for r in c.frontier.read().collect()}
    assert st == {
        "http://a.test/1.html": "visited",
        "http://a.test/2.html": "scheduled",
    }
    # document partitions beyond wave 0 are gone: only wave 0's fetch rows
    # survive (the wave COLUMN is the discovery wave; partitions are fetch
    # waves — assert on the rows themselves)
    assert sorted(
        r["url"] for r in c.catalog.read(DOCUMENTS_TABLE).collect()
    ) == ["http://a.test/1.html"]
    # a FRESH crawler (new process) resumes from the rolled-back state and
    # reconverges to the identical closure
    c2 = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus), cfg)
    c2.crawl(4)
    assert sorted(
        (r["url"], r["status"]) for r in c2.frontier.read().collect()
    ) == full
    # re-run waves rewrote their document partitions: every URL has exactly
    # one row again
    assert sorted(
        r["url"] for r in c2.catalog.read(DOCUMENTS_TABLE).collect()
    ) == [
        "http://a.test/1.html",
        "http://a.test/2.html",
        "http://a.test/3.html",
    ]
    # dedup after rollback: the stale (superset) seen-filter cannot drop a
    # URL — membership truth is the anti-join, so a known URL adds nothing
    assert c2.frontier.schedule(
        spark.createDataFrame([("http://a.test/2.html",)], "url string"), wave=9
    ) == 0


def test_max_pages_per_host_scopes_the_crawl(spark, tmp_path):
    """Cumulative per-host cap: a deep site stops at the cap while a small
    host completes; a RESUMED crawl rebuilds the counts from the frontier
    and the cap still holds."""
    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.crawler import Crawler, CrawlConfig
    from kermit_spark.fetch import CorpusFetcher
    from kermit_spark.frontier import Limit, Politeness

    # a.test: chain of 8 pages; b.test: 2 pages
    rows = []
    for i in range(8):
        nxt = f'<a href="/p/{i + 1}.html">n</a>' if i < 7 else "end"
        rows.append((f"http://a.test/p/{i}.html", "a.test", 200, "text/html",
                     f"<html><body>{nxt}</body></html>"))
    rows += [
        ("http://b.test/1.html", "b.test", 200, "text/html",
         '<html><body><a href="/2.html">x</a></body></html>'),
        ("http://b.test/2.html", "b.test", 200, "text/html", "<html><body>leaf</body></html>"),
    ]
    corpus = spark.createDataFrame(
        rows, "url string, host string, status int, content_type string, body string"
    )
    root = str(tmp_path / "cat")
    cfg = CrawlConfig(
        num_partitions=2,
        politeness=Politeness((Limit(".*", 2),)),  # 2/host/wave
        obey_robots=False,
        max_pages_per_host=3,
    )
    c = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus), cfg)
    c.seed(["http://a.test/p/0.html", "http://b.test/1.html"])
    c.crawl(2)  # 2 waves, then RESUME with a fresh crawler (counts rebuilt)
    c2 = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus), cfg)
    c2.crawl(6)
    st = [(r["url"], r["status"]) for r in c2.frontier.read().collect()]
    attempted_a = sum(1 for u, s in st if "a.test" in u and s != "scheduled")
    visited_b = sum(1 for u, s in st if "b.test" in u and s == "visited")
    assert attempted_a == 3, st  # capped: 8-page chain stops at 3
    assert visited_b == 2        # small host unaffected, completes
    # the capped host's next link IS discovered but stays queued forever
    assert ("http://a.test/p/3.html", "scheduled") in st


def test_adaptive_recrawl_follows_change_rate(spark, tmp_path):
    """Change-rate policy e2e: after two visits, a URL whose content CHANGED
    between them comes due immediately (interval 1) and is rescheduled;
    an unchanged URL backs off (interval 2) and stays visited."""
    root = str(tmp_path / "adaptive")

    def corpus(body_a: str):
        return spark.createDataFrame(
            [
                ("http://ha.test/a.html", 200, "text/html", body_a),
                ("http://hb.test/b.html", 200, "text/html",
                 "<html><body><p>stable content forever</p></body></html>"),
            ],
            "url string, status int, content_type string, body string",
        )

    seeds = ["http://ha.test/a.html", "http://hb.test/b.html"]
    cfg = CrawlConfig(num_partitions=4, politeness=Politeness((Limit(r".*", 10),)))

    c1 = Crawler(
        spark, SnapshotCatalog(spark, root),
        CorpusFetcher(corpus("<html><body><p>version one</p></body></html>")), cfg,
    )
    c1.seed(seeds)
    c1.crawl(1)
    # single observation per URL -> min_interval, everything overdue
    assert c1.adaptive_recrawl() == 2

    # second pass fetches both again; page a changed, page b did not
    c2 = Crawler(
        spark, SnapshotCatalog(spark, root),
        CorpusFetcher(corpus("<html><body><p>version two changed</p></body></html>")), cfg,
    )
    c2.crawl(1)
    n = c2.adaptive_recrawl()
    assert n == 1
    status = {
        r["url"]: r["status"]
        for r in c2.frontier.read().select("url", "status").collect()
    }
    assert status["http://ha.test/a.html"] == "scheduled"
    assert status["http://hb.test/b.html"] == "visited"


def test_politeness_by_domain_one_site_budget(spark, tmp_path_factory):
    """politeness_by_domain: two subdomains of one registrable domain share
    ONE per-wave budget (4 total, not 4 each); a distinct domain keeps its
    own. Per-host mode on the same corpus gives each subdomain the full
    budget — proving the flag changes the grouping, not the ordering."""
    rows = [
        (f"http://sh{s}.example.co.uk/p/{i}", 200, "text/html", "plain page")
        for s in range(2) for i in range(6)
    ] + [
        (f"http://other.test/p/{i}", 200, "text/html", "plain page")
        for i in range(6)
    ]
    corpus = spark.createDataFrame(
        rows, "url string, status int, content_type string, body string"
    )
    seeds = [r[0] for r in rows]

    def run(by_domain):
        cfg = CrawlConfig(
            num_partitions=4,
            politeness=Politeness((Limit(r".*", 4),)),
            sub_salts=2,
            obey_robots=False,
            politeness_by_domain=by_domain,
            max_waves=10,
        )
        root = str(tmp_path_factory.mktemp(f"bydom{by_domain}"))
        c = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus), cfg)
        c.seed(seeds)
        c.crawl()
        return c

    c = run(True)
    per = {
        (r["p"], r["d"]): r["count"]
        for r in c.documents()
        .groupBy("p", F.regexp_replace("host", r"^sh\d\.", "").alias("d"))
        .count()
        .collect()
    }
    # wave 0: example.co.uk contributes 4 ACROSS both subdomains; other.test 4
    assert per[(0, "example.co.uk")] == 4 and per[(0, "other.test")] == 4
    # all 18 pages still fetched eventually (slower, never lost)
    assert c.documents().count() == 18
    # domain budget never exceeded in any wave
    assert max(n for (_, d), n in per.items() if d == "example.co.uk") <= 4

    c_host = run(False)
    per_host = {
        (r["p"], r["host"]): r["count"]
        for r in c_host.documents().groupBy("p", "host").count().collect()
    }
    # per-host mode: each subdomain gets its own 4 in wave 0
    assert per_host[(0, "sh0.example.co.uk")] == 4
    assert per_host[(0, "sh1.example.co.uk")] == 4


def test_adaptive_politeness_caps_degraded_host(spark, tmp_path_factory):
    """AIMD politeness e2e: a host erroring on every fetch accumulates
    delay (+1s per error) until its per-wave budget collapses to 1 under a
    4-second politeness window, while a healthy host decays to the floor
    and never pays a cap row. URLs are slowed, never lost."""
    from kermit_spark.crawler import AdaptivePoliteness

    rows = [
        (f"http://bad.test/p/{i}", 500, "text/html", "server error") for i in range(10)
    ] + [
        (f"http://good.test/p/{i}", 200, "text/html", "plain page no links") for i in range(10)
    ]
    corpus = spark.createDataFrame(rows, "url string, status int, content_type string, body string")
    cfg = CrawlConfig(
        num_partitions=4,
        politeness=Politeness((Limit(r".*", 4),)),
        sub_salts=2,
        obey_robots=False,
        politeness_window_s=4.0,
        adaptive_politeness=AdaptivePoliteness(
            init_delay_ms=1000, increase_ms=1000, decrease_pct=50,
            min_delay_ms=100, max_delay_ms=60000,
        ),
        max_waves=10,
    )
    root = str(tmp_path_factory.mktemp("aimd"))
    c = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus), cfg)
    c.seed([r[0] for r in rows])
    c.crawl()

    per = {
        (r["p"], r["host"]): r["count"]
        for r in c.documents().groupBy("p", "host").count().collect()
    }
    bad = [per.get((w, "bad.test"), 0) for w in range(10)]
    good = [per.get((w, "good.test"), 0) for w in range(10)]
    # healthy host: full budget until exhausted, no cap ever
    assert good[:3] == [4, 4, 2]
    # failing host: full first wave, then delay 5000ms -> floor budget 1
    assert bad[0] == 4
    assert all(n == 1 for n in bad[1:7])
    assert sum(bad) == 10  # slowed, never lost
    # state: bad degraded way past init, good decayed to the floor
    assert c._adaptive_delay["bad.test"] > 5000
    assert c._adaptive_delay["good.test"] == 100
    # caps table carries ONLY the degraded host
    caps = {r["host"]: r["budget_cap"] for r in c._adaptive_politeness_caps().collect()}
    assert "good.test" not in caps and caps["bad.test"] == 1


def test_adaptive_recrawl_respects_cache_headers(spark, tmp_path):
    """RFC 9111 wiring e2e: page a CHANGES between passes (estimator says
    re-fetch now) but its server declares max-age far beyond the policy cap
    — respect_cache_headers=True must NOT reschedule it, while the default
    policy does. Page b (no caching headers) behaves identically in both
    modes."""
    root = str(tmp_path / "cachefloor")

    def corpus(body_a: str):
        return spark.createDataFrame(
            [
                ("http://ha.test/a.html", 200, "text/html", body_a,
                 "public, max-age=999999"),
                ("http://hb.test/b.html", 200, "text/html",
                 "<html><body><p>stable content forever</p></body></html>",
                 None),
            ],
            "url string, status int, content_type string, body string,"
            " cache_control string",
        )

    seeds = ["http://ha.test/a.html", "http://hb.test/b.html"]
    cfg = CrawlConfig(num_partitions=4, politeness=Politeness((Limit(r".*", 10),)))

    c1 = Crawler(
        spark, SnapshotCatalog(spark, root),
        CorpusFetcher(corpus("<html><body><p>version one</p></body></html>")), cfg,
    )
    c1.seed(seeds)
    c1.crawl(1)
    c1.adaptive_recrawl()  # both single-observation URLs come due

    c2 = Crawler(
        spark, SnapshotCatalog(spark, root),
        CorpusFetcher(corpus("<html><body><p>version two changed</p></body></html>")), cfg,
    )
    c2.crawl(1)
    # default policy: the changed page is rescheduled (baseline behavior)
    assert c2.adaptive_recrawl() == 1
    status = {
        r["url"]: r["status"]
        for r in c2.frontier.read().select("url", "status").collect()
    }
    assert status["http://ha.test/a.html"] == "scheduled"

    # same state, cache-aware policy: the server said a is fresh for ~11
    # days -> nothing is due (b already backed off; a is floored)
    c3 = Crawler(
        spark, SnapshotCatalog(spark, root),
        CorpusFetcher(corpus("<html><body><p>version three</p></body></html>")),
        cfg,
    )
    c3.crawl(1)  # re-fetches the rescheduled a; b stays visited
    n = c3.adaptive_recrawl(respect_cache_headers=True, seconds_per_wave=3600)
    status3 = {
        r["url"]: r["status"]
        for r in c3.frontier.read().select("url", "status").collect()
    }
    assert status3["http://ha.test/a.html"] == "visited", (n, status3)
    # and the cache-blind policy WOULD have rescheduled it from this state
    assert c3.adaptive_recrawl() >= 1


def test_notification_events_fire_on_error_and_lifecycle(spark, tmp_path):
    """NotificationCenter analog (ext.notifications.coffee:6-18): the
    configured on_event callback observes crawler:start, per-wave 'error'
    events carrying the failing URLs, and crawler:stop with the stop
    reason — the reference notifies per item reaching ERROR and on
    crawler start/stop."""
    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.crawler import Crawler, CrawlConfig
    from kermit_spark.fetch import CorpusFetcher
    from kermit_spark.frontier import Limit, Politeness

    corpus = spark.createDataFrame(
        [
            ("http://a.test/1.html", "a.test", 200, "text/html",
             '<html><body><a href="/gone.html">dead</a>'
             '<a href="/2.html">ok</a></body></html>'),
            ("http://a.test/2.html", "a.test", 200, "text/html",
             "<html><body><p>leaf</p></body></html>"),
            # /gone.html absent from the corpus -> fetch error in wave 2
        ],
        "url string, host string, status int, content_type string, body string",
    )
    events: list[tuple[str, dict]] = []
    cfg = CrawlConfig(
        num_partitions=2,
        politeness=Politeness((Limit(".*", 10),)),
        obey_robots=False,
        max_tries=1,
        on_event=lambda ev, payload: events.append((ev, payload)),
    )
    c = Crawler(spark, SnapshotCatalog(spark, str(tmp_path / "cat")),
                CorpusFetcher(corpus), cfg)
    c.seed(["http://a.test/1.html"])
    c.crawl(4)

    names = [ev for ev, _ in events]
    assert names[0] == "crawler:start"
    assert names[-1] == "crawler:stop"
    errs = [p for ev, p in events if ev == "error"]
    assert len(errs) == 1                      # exactly the wave that failed
    assert errs[0]["n_errors"] == 1
    assert errs[0]["urls"] == ["http://a.test/gone.html"]
    stop = events[-1][1]
    assert stop["reason"] == "drained"
    assert stop["waves_run"] == 2
    # default config (no callback): zero events machinery — attribute is None
    assert CrawlConfig().on_event is None


def test_rollback_reconverges_on_bloom_path(spark, tmp_path):
    """rollback_to_wave with the frontier ABOVE the Bloom threshold (the
    regime the small-scale rollback test never exercises): the anti-join's
    frontier side is read from the rolled-back snapshot itself, so a fresh
    crawl must re-admit the rolled-back URLs through the Bloom-prefiltered
    dedup and reconverge to the identical closure."""
    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.crawler import Crawler, CrawlConfig
    from kermit_spark.fetch import CorpusFetcher
    from kermit_spark.frontier import Frontier, Limit, Politeness

    rows = [
        ("http://a.test/1.html", "a.test", 200, "text/html",
         '<html><body><a href="/2.html">x</a></body></html>'),
        ("http://a.test/2.html", "a.test", 200, "text/html",
         '<html><body><a href="/3.html">y</a></body></html>'),
        ("http://a.test/3.html", "a.test", 200, "text/html",
         "<html><body>leaf</body></html>"),
    ]
    corpus = spark.createDataFrame(
        rows, "url string, host string, status int, content_type string, body string"
    )
    root = str(tmp_path / "cat")
    cfg = CrawlConfig(
        num_partitions=2, politeness=Politeness((Limit(".*", 10),)), obey_robots=False
    )

    def make(c):
        # force the Bloom path at toy scale
        c.frontier = Frontier(c.catalog, 2, bloom_min_frontier=0)
        return c

    c = make(Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus), cfg))
    c.seed(["http://a.test/1.html"])
    c.crawl(3)
    full = sorted((r["url"], r["status"]) for r in c.frontier.read().collect())
    c.rollback_to_wave(0)
    # the rolled-back /3.html must be re-discoverable: the anti-join's
    # frontier side comes from the rolled-back snapshot
    c2 = make(Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus), cfg))
    c2.crawl(4)
    assert sorted(
        (r["url"], r["status"]) for r in c2.frontier.read().collect()
    ) == full
    # known URL still adds nothing through the exact anti-join
    assert c2.frontier.schedule(
        spark.createDataFrame([("http://a.test/2.html",)], "url string"), wave=9
    ) == 0


def test_trust_filter_crawl_matches_exact_closure(spark, tmp_path):
    """CrawlConfig.exact_dedup=False end-to-end: with a healthy filter the
    trust-mode crawl must reach the IDENTICAL closure (URL-seen set,
    statuses, document set) as the exact crawl — the knob changes the
    dedup cost shape at 10^10 scale, never healthy-path results."""
    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.crawler import Crawler, CrawlConfig
    from kermit_spark.fetch import CorpusFetcher
    from kermit_spark.frontier import Frontier, Limit, Politeness

    rows = [
        ("http://a.test/1.html", "a.test", 200, "text/html",
         '<html><body><a href="/2.html">x</a><a href="/3.html">y</a></body></html>'),
        ("http://a.test/2.html", "a.test", 200, "text/html",
         '<html><body><a href="/3.html">z</a></body></html>'),
        ("http://a.test/3.html", "a.test", 200, "text/html",
         "<html><body>leaf</body></html>"),
    ]
    corpus = spark.createDataFrame(
        rows, "url string, host string, status int, content_type string, body string"
    )
    closures = {}
    for exact in (True, False):
        root = str(tmp_path / f"cat{exact}")
        cfg = CrawlConfig(
            num_partitions=2, politeness=Politeness((Limit(".*", 10),)),
            obey_robots=False, exact_dedup=exact,
        )
        c = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus), cfg)
        # force the Bloom path so trust mode actually exercises the probe
        c.frontier = Frontier(c.catalog, 2, bloom_min_frontier=0, exact_dedup=exact)
        c.seed(["http://a.test/1.html"])
        c.crawl(4)
        closures[exact] = (
            sorted((r["url"], r["status"]) for r in c.frontier.read().collect()),
            sorted(r["url"] for r in c.documents().collect()),
        )
    assert closures[True] == closures[False]
    assert len(closures[True][1]) == 3
