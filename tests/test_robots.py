"""robots.txt parser + frontier gating (north_rule Q12 — absent in the
reference, SURVEY §2.3). Parser semantics: RFC 9309 — most-specific
user-agent group, Allow/Disallow longest-match precedence, ``*`` wildcards,
``$`` end anchors."""

from pyspark.sql import functions as F

from kermit_spark.robots import parse_robots_rules, robots_gate

RULES_DDL = "host string, rules array<struct<pattern string, allow boolean>>"


def _verdict(rules: list[tuple[str, bool]], path: str) -> bool:
    """Python mirror of the gate: first (highest-precedence) matching rule
    decides; no match → allowed."""
    import re

    for pattern, allow in rules:
        if re.search(pattern, path):
            return allow
    return True


def test_parse_star_group():
    body = "User-agent: *\nDisallow: /private/\nDisallow: /tmp\n"
    rules = parse_robots_rules(body)
    assert rules == [("^/private/", False), ("^/tmp", False)]


def test_parse_agent_specific_group_wins_over_star():
    body = (
        "User-agent: *\nDisallow: /all/\n\n"
        "User-agent: kermit-spark\nDisallow: /k-only/\n"
    )
    rules = parse_robots_rules(body, agent="kermit-spark")
    # RFC 9309: the star group is IGNORED when a named group matches
    assert rules == [("^/k\\-only/", False)]
    assert _verdict(rules, "/all/x")  # not bound by the star group
    assert not _verdict(rules, "/k-only/x")


def test_parse_most_specific_agent_token():
    body = (
        "User-agent: kermit\nDisallow: /coarse/\n\n"
        "User-agent: kermit-spark\nDisallow: /fine/\n"
    )
    rules = parse_robots_rules(body, agent="kermit-spark")
    assert rules == [("^/fine/", False)]


def test_parse_empty_disallow_means_allow_all():
    assert parse_robots_rules("User-agent: *\nDisallow:\n") == []


def test_parse_none_and_comments():
    assert parse_robots_rules(None) == []
    assert parse_robots_rules("# nothing here\n") == []


def test_parse_multiple_agents_share_group():
    body = "User-agent: a\nUser-agent: *\nDisallow: /x/\n"
    assert parse_robots_rules(body, agent="kermit-spark") == [("^/x/", False)]


def test_allow_overrides_disallow_by_length():
    # RFC 9309 §2.2.2 longest-match: /public/ (7+1 chars) beats /p (2)
    body = "User-agent: *\nDisallow: /p\nAllow: /public/\n"
    rules = parse_robots_rules(body)
    assert _verdict(rules, "/public/index.html")
    assert not _verdict(rules, "/private/1.html")


def test_allow_wins_length_tie():
    body = "User-agent: *\nDisallow: /dir/\nAllow: /dir/\n"
    assert _verdict(parse_robots_rules(body), "/dir/x")


def test_wildcard_and_end_anchor():
    body = "User-agent: *\nDisallow: /*.php$\nDisallow: /a/*/secret\n"
    rules = parse_robots_rules(body)
    assert not _verdict(rules, "/index.php")
    assert _verdict(rules, "/index.php?q=1")  # $ anchors the end
    assert not _verdict(rules, "/a/b/secret/x")
    assert _verdict(rules, "/a/secret")  # the * segment must be present


def test_crawl_delay_extracted_from_matching_group():
    from kermit_spark.robots import parse_robots

    body = (
        "User-agent: otherbot\nCrawl-delay: 99\n\n"
        "User-agent: *\nDisallow: /x/\nCrawl-delay: 7.5\n"
    )
    rules, delay, _ = parse_robots(body, agent="kermit-spark")
    assert rules == [("^/x/", False)]
    assert delay == 7.5


def test_crawl_delay_invalid_or_absent_is_none():
    from kermit_spark.robots import parse_robots

    assert parse_robots("User-agent: *\nDisallow: /x/\n")[1] is None
    assert parse_robots("User-agent: *\nCrawl-delay: soon\n")[1] is None
    assert parse_robots("User-agent: *\nCrawl-delay: -3\n")[1] is None


def test_sitemap_lines_are_group_independent():
    from kermit_spark.robots import parse_robots

    body = (
        "Sitemap: http://a.test/sm1.xml\n"
        "User-agent: otherbot\nDisallow: /x/\n"
        "Sitemap: http://a.test/sm2.xml\n"
        "User-agent: *\nDisallow: /y/\n"
    )
    rules, _, sitemaps = parse_robots(body, agent="kermit-spark")
    # both sitemaps collected regardless of surrounding group; a Sitemap
    # line inside another bot's group neither closes nor binds it
    assert sitemaps == ["http://a.test/sm1.xml", "http://a.test/sm2.xml"]
    assert rules == [("^/y/", False)]


def test_parse_sitemap_locs():
    from kermit_spark.robots import parse_sitemap_locs

    body = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> http://a.test/p/0.html </loc></url>"
        "<url><loc>http://a.test/sm/only.html</loc></url>"
        "</urlset>"
    )
    assert parse_sitemap_locs(body) == [
        "http://a.test/p/0.html",
        "http://a.test/sm/only.html",
    ]
    assert parse_sitemap_locs(None) == []
    assert parse_sitemap_locs("<urlset></urlset>") == []


def test_sitemap_index_detected_jvm_side(spark):
    """sitemap_candidates_from_fetch: a <sitemapindex> body's locs are
    flagged is_index (child sitemaps to expand), a <urlset>'s are not, and
    non-200 fetches yield nothing."""
    from kermit_spark.robots import sitemap_candidates_from_fetch

    index_body = (
        '<?xml version="1.0"?><sitemapindex>'
        "<sitemap><loc>http://a.test/sm-a.xml</loc></sitemap>"
        "<sitemap><loc>http://a.test/sm-b.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    urlset_body = "<urlset><url><loc>http://a.test/p/1</loc></url></urlset>"
    fetched = spark.createDataFrame(
        [
            ("http://a.test/sm.xml", 200, index_body),
            ("http://a.test/sm2.xml", 200, urlset_body),
            ("http://a.test/gone.xml", 404, None),
        ],
        "url string, status int, body string",
    )
    got = sitemap_candidates_from_fetch(fetched).collect()
    by_loc = {r["loc"]: r["is_index"] for r in got}
    assert by_loc == {
        "http://a.test/sm-a.xml": True,
        "http://a.test/sm-b.xml": True,
        "http://a.test/p/1": False,
    }


def test_dequeue_host_budget_caps(spark):
    """Crawl-delay-derived (host, budget_cap) rows tighten the configured
    politeness budget for exactly the listed hosts."""
    from kermit_spark.frontier import Limit, Politeness, as_frontier_rows, dequeue

    urls = spark.createDataFrame(
        [(f"http://{h}.test/{i}",) for h in ("slow", "fast") for i in range(6)],
        "url string",
    )
    eligible = as_frontier_rows(urls, 4, wave=0)
    caps = spark.createDataFrame([("slow.test", 2)], "host string, budget_cap int")
    got = dequeue(
        eligible, Politeness((Limit(r".*", 5),)), sub_salts=2, host_budgets=caps
    )
    counts = {r["host"]: r["n"] for r in got.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert counts == {"slow.test": 2, "fast.test": 5}


def test_gate_drops_matching_paths(spark):
    eligible = spark.createDataFrame(
        [
            (0, "http://a.test/private/1.html", "a.test"),
            (0, "http://a.test/public/1.html", "a.test"),
            (1, "http://b.test/private/1.html", "b.test"),
        ],
        "p int, url string, host string",
    )
    rules = spark.createDataFrame([("a.test", [("^/private/", False)])], RULES_DDL)
    got = sorted(r["url"] for r in robots_gate(eligible, rules).collect())
    # b.test has no rules row -> allow-all
    assert got == ["http://a.test/public/1.html", "http://b.test/private/1.html"]


def test_gate_allow_rule_overrides(spark):
    eligible = spark.createDataFrame(
        [
            (0, "http://a.test/p/open/1.html", "a.test"),
            (0, "http://a.test/p/closed/1.html", "a.test"),
        ],
        "p int, url string, host string",
    )
    # precedence order as the parser emits it: longest first
    rules = spark.createDataFrame(
        [("a.test", [("^/p/open/", True), ("^/p/", False)])], RULES_DDL
    )
    got = [r["url"] for r in robots_gate(eligible, rules).collect()]
    assert got == ["http://a.test/p/open/1.html"]


def test_gate_empty_rules_allows(spark):
    eligible = spark.createDataFrame(
        [(0, "http://a.test/x", "a.test")], "p int, url string, host string"
    )
    rules = spark.createDataFrame([("a.test", [])], RULES_DDL)
    assert robots_gate(eligible, rules).count() == 1


def test_rules_from_fetch_status_classes(spark):
    """RFC 9309 §2.3.1 status semantics: 200 parses, 4xx allow-all,
    5xx complete disallow (and the opt-out restores allow-all)."""
    from kermit_spark.robots import robots_rules_from_fetch

    fetched = spark.createDataFrame(
        [
            (0, "ok.test", 200, "User-agent: *\nDisallow: /private/\n"),
            (0, "gone.test", 404, None),
            (1, "down.test", 503, None),
        ],
        "p int, host string, status int, body string",
    )
    rules = {
        r["host"]: [(x["pattern"], x["allow"]) for x in r["rules"]]
        for r in robots_rules_from_fetch(fetched).collect()
    }
    assert rules["ok.test"] == [("^/private/", False)]
    assert rules["gone.test"] == []  # unavailable -> allow-all
    assert rules["down.test"] == [("^/", False)]  # unreachable -> disallow-all

    # the disallow-all rule actually blocks every path through the gate
    eligible = spark.createDataFrame(
        [(1, "http://down.test/", "down.test"), (1, "http://down.test/a?q=1", "down.test")],
        "p int, url string, host string",
    )
    gated = robots_gate(
        eligible, robots_rules_from_fetch(fetched).select("host", "rules")
    )
    assert gated.count() == 0

    legacy = {
        r["host"]: list(r["rules"])
        for r in robots_rules_from_fetch(
            fetched, server_error_disallow=False
        ).collect()
    }
    assert legacy["down.test"] == []


def test_gate_matches_parser_verdicts_end_to_end(spark):
    """Differential: JVM regexp_like gate == the Python _verdict mirror over
    a wildcard/allow/anchor rule set."""
    body = (
        "User-agent: *\n"
        "Disallow: /p\n"
        "Allow: /public/\n"
        "Disallow: /*.php$\n"
    )
    rules_py = parse_robots_rules(body)
    paths = [
        "/public/a.html", "/private/a.html", "/x.php", "/x.php?q=1",
        "/p", "/", "/public/x.php",
    ]
    eligible = spark.createDataFrame(
        [(0, f"http://a.test{p}", "a.test") for p in paths],
        "p int, url string, host string",
    )
    rules = spark.createDataFrame([("a.test", rules_py)], RULES_DDL)
    got = {r["url"] for r in robots_gate(eligible, rules).collect()}
    want = {f"http://a.test{p}" for p in paths if _verdict(rules_py, p)}
    assert got == want


# -- robots cache expiry (robots_max_age_waves) -------------------------------


def _mini_corpus(spark, robots_body, extra_rows=()):
    rows = [
        ("http://a.test/robots.txt", "a.test", 200, "text/plain", robots_body),
        ("http://a.test/1.html", "a.test", 200, "text/html",
         '<html><body><a href="/2.html">x</a></body></html>'),
        ("http://a.test/2.html", "a.test", 200, "text/html",
         '<html><body><a href="/p/3.html">y</a></body></html>'),
        ("http://a.test/p/3.html", "a.test", 200, "text/html",
         "<html><body>deep</body></html>"),
        *extra_rows,
    ]
    return spark.createDataFrame(
        rows, "url string, host string, status int, content_type string, body string"
    )


def _aging_crawler(spark, tmp_path, corpus, max_age):
    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.crawler import Crawler, CrawlConfig
    from kermit_spark.fetch import CorpusFetcher
    from kermit_spark.frontier import Limit, Politeness

    cfg = CrawlConfig(
        num_partitions=2,
        politeness=Politeness((Limit(".*", 10),)),
        robots_max_age_waves=max_age,
    )
    return Crawler(
        spark, SnapshotCatalog(spark, str(tmp_path / "cat")),
        CorpusFetcher(corpus), cfg,
    )


def test_robots_expiry_refetches_and_honors_new_rules(spark, tmp_path):
    """Rules change between fetches: with expiry on, the stale row is
    re-fetched and the NEW Disallow blocks a later-wave URL; the refreshed
    Sitemap declaration seeds its orphan page."""
    from kermit_spark.fetch import CorpusFetcher

    allow_all = "User-agent: *\n"
    deny_deep = (
        "User-agent: *\nDisallow: /p/\n"
        "Sitemap: http://a.test/sm.xml\n"
    )
    sm_rows = (
        ("http://a.test/sm.xml", "a.test", 200, "application/xml",
         "<urlset><url><loc>http://a.test/fresh.html</loc></url></urlset>"),
        ("http://a.test/fresh.html", "a.test", 200, "text/html",
         "<html><body>fresh</body></html>"),
    )
    c = _aging_crawler(spark, tmp_path, _mini_corpus(spark, allow_all), max_age=2)
    c.seed(["http://a.test/1.html"])
    c.crawl(1)  # wave 0: robots fetched (allow-all), /1 visited, /2 discovered
    # the server's robots CHANGES (fetcher swap models it; resume supports
    # new fetchers the same way)
    c.fetcher = CorpusFetcher(_mini_corpus(spark, deny_deep, sm_rows))
    c.crawl(2)  # wave 1: /2 (rules still cached fresh); wave 2: expiry hits
    c.crawl(1)  # wave 3: fresh.html (seeded by the refreshed sitemap)
    st = {r["url"]: r["status"] for r in c.frontier.read().collect()}
    assert st["http://a.test/1.html"] == "visited"
    assert st["http://a.test/2.html"] == "visited"
    # /p/3 was dequeued at wave 2 — AFTER the wave-0 rules expired — so the
    # re-fetched Disallow must block it
    assert st["http://a.test/p/3.html"] == "robots_blocked"
    # the refreshed robots' Sitemap seeded the orphan
    assert st.get("http://a.test/fresh.html") == "visited"


def test_robots_5xx_outage_blocks_then_recovers_on_reprobe(spark, tmp_path):
    """RFC 9309 §2.3.1.4 end-to-end: a 5xx robots probe blocks the whole
    host (outage wave URLs -> robots_blocked); after expiry the host is
    re-probed EVEN THOUGH it has no scheduled rows left (outage ledger),
    and a successful re-probe requeues the blocked rows — the crawl then
    visits them under the real rules."""
    from kermit_spark.fetch import CorpusFetcher

    down = [
        ("http://a.test/robots.txt", "a.test", 503, "text/plain", None),
        ("http://a.test/1.html", "a.test", 200, "text/html",
         '<html><body><a href="/2.html">x</a></body></html>'),
        ("http://a.test/2.html", "a.test", 200, "text/html", "<html>two</html>"),
    ]
    up = [
        ("http://a.test/robots.txt", "a.test", 200, "text/plain", "User-agent: *\n"),
        *down[1:],
    ]
    ddl = "url string, host string, status int, content_type string, body string"
    c = _aging_crawler(
        spark, tmp_path, spark.createDataFrame(down, ddl), max_age=1
    )
    c.seed(["http://a.test/1.html"])
    c.crawl(1)  # wave 0: robots 503 -> /1 blocked; nothing scheduled remains
    st = {r["url"]: r["status"] for r in c.frontier.read().collect()}
    assert st["http://a.test/1.html"] == "robots_blocked"

    # server recovers; the next crawl's wave must re-probe via the outage
    # ledger (the host has NO scheduled rows to put it in a batch)
    c.fetcher = CorpusFetcher(spark.createDataFrame(up, ddl))
    c.crawl(3)
    st = {r["url"]: r["status"] for r in c.frontier.read().collect()}
    assert st["http://a.test/1.html"] == "visited"
    assert st["http://a.test/2.html"] == "visited"


def test_robots_5xx_recovery_survives_resume(spark, tmp_path):
    """The outage ledger is driver state — a RESUMED crawl (fresh Crawler
    over the same catalog) must rebuild it from the stored server_error
    column and still recover the blocked host."""
    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.crawler import Crawler
    from kermit_spark.fetch import CorpusFetcher

    ddl = "url string, host string, status int, content_type string, body string"
    down = [
        ("http://a.test/robots.txt", "a.test", 503, "text/plain", None),
        ("http://a.test/1.html", "a.test", 200, "text/html", "<html>x</html>"),
    ]
    c = _aging_crawler(
        spark, tmp_path, spark.createDataFrame(down, ddl), max_age=1
    )
    c.seed(["http://a.test/1.html"])
    c.crawl(1)
    assert {
        r["url"]: r["status"] for r in c.frontier.read().collect()
    }["http://a.test/1.html"] == "robots_blocked"

    # resume: NEW crawler object, same catalog, healthy server
    up = [("http://a.test/robots.txt", "a.test", 200, "text/plain",
           "User-agent: *\n"), down[1]]
    c2 = Crawler(
        spark, SnapshotCatalog(spark, str(tmp_path / "cat")),
        CorpusFetcher(spark.createDataFrame(up, ddl)), c.config,
    )
    c2.crawl(3)
    st = {r["url"]: r["status"] for r in c2.frontier.read().collect()}
    assert st["http://a.test/1.html"] == "visited"


def test_robots_5xx_fetch_once_stays_blocked(spark, tmp_path):
    """With expiry off (reference-parity fetch-once), an outage host stays
    conservatively blocked — no ledger, no re-probe, no extra jobs."""
    from kermit_spark.fetch import CorpusFetcher

    down = [
        ("http://a.test/robots.txt", "a.test", 500, "text/plain", None),
        ("http://a.test/1.html", "a.test", 200, "text/html", "<html>x</html>"),
    ]
    ddl = "url string, host string, status int, content_type string, body string"
    c = _aging_crawler(
        spark, tmp_path, spark.createDataFrame(down, ddl), max_age=0
    )
    c.seed(["http://a.test/1.html"])
    c.crawl(1)
    c.fetcher = CorpusFetcher(
        spark.createDataFrame(
            [("http://a.test/robots.txt", "a.test", 200, "text/plain",
              "User-agent: *\n"), down[1]], ddl
        )
    )
    c.crawl(2)
    st = {r["url"]: r["status"] for r in c.frontier.read().collect()}
    assert st["http://a.test/1.html"] == "robots_blocked"


def test_robots_no_expiry_keeps_first_rules_forever(spark, tmp_path):
    """Reference parity (max_age=0): the wave-0 allow-all rules stay cached;
    the same corpus swap must NOT block /p/3."""
    from kermit_spark.fetch import CorpusFetcher

    c = _aging_crawler(
        spark, tmp_path, _mini_corpus(spark, "User-agent: *\n"), max_age=0
    )
    c.seed(["http://a.test/1.html"])
    c.crawl(1)
    c.fetcher = CorpusFetcher(
        _mini_corpus(spark, "User-agent: *\nDisallow: /p/\n")
    )
    c.crawl(2)
    st = {r["url"]: r["status"] for r in c.frontier.read().collect()}
    assert st["http://a.test/p/3.html"] == "visited"


def test_robots_refresh_replaces_only_stale_host_rows(spark, tmp_path):
    """Two hosts share a partition; refreshing one must not lose or alter
    the other's row (copy-on-write partition merge, not blind append)."""
    from kermit_spark.crawler import ROBOTS_TABLE
    from kermit_spark.fetch import CorpusFetcher

    rows = [
        ("http://a.test/robots.txt", "a.test", 200, "text/plain",
         "User-agent: *\nDisallow: /x\n"),
        ("http://b.test/robots.txt", "b.test", 200, "text/plain",
         "User-agent: *\nDisallow: /y\n"),
    ]
    corpus = spark.createDataFrame(
        rows, "url string, host string, status int, content_type string, body string"
    )
    c = _aging_crawler(spark, tmp_path, corpus, max_age=1)
    # both hosts forced into ONE partition: staleness handling must split
    # rows within the partition, not at partition granularity
    c._ensure_robots([(0, "a.test"), (0, "b.test")], wave=0)
    rows2 = [
        ("http://a.test/robots.txt", "a.test", 200, "text/plain",
         "User-agent: *\nDisallow: /z\n"),
    ]
    c.fetcher = CorpusFetcher(spark.createDataFrame(
        rows2, "url string, host string, status int, content_type string, body string"
    ))
    # only a.test is in this wave's batch -> only it refreshes
    c._ensure_robots([(0, "a.test")], wave=5)
    got = {
        r["host"]: (r["fetched_wave"], [x["pattern"] for x in r["rules"]])
        for r in c.catalog.read(ROBOTS_TABLE).collect()
    }
    assert len(got) == 2, "b.test row lost in the partition replace"
    assert got["b.test"][0] == 0  # untouched
    assert got["a.test"][0] == 5  # refreshed
    assert any("z" in p for p in got["a.test"][1])
    assert not any("x" in p for p in got["a.test"][1])


def test_request_rate_folds_into_delay_channel():
    from kermit_spark.robots import parse_robots

    # 1 page per 5 seconds -> 5 s effective delay
    _, d, _ = parse_robots("User-agent: *\nRequest-rate: 1/5\n")
    assert d == 5.0
    # stricter of Request-rate and Crawl-delay wins
    _, d, _ = parse_robots(
        "User-agent: *\nCrawl-delay: 2\nRequest-rate: 1/7\n"
    )
    assert d == 7.0
    _, d, _ = parse_robots(
        "User-agent: *\nRequest-rate: 2/4\nCrawl-delay: 9\n"
    )
    assert d == 9.0
    # time-of-day suffix ignored, fraction still parsed
    _, d, _ = parse_robots("User-agent: *\nRequest-rate: 1/10 0600-1800\n")
    assert d == 10.0
    # malformed / zero-page forms are skipped
    for bad in ("Request-rate: 0/5", "Request-rate: fast", "Request-rate: /3"):
        _, d, _ = parse_robots(f"User-agent: *\n{bad}\n")
        assert d is None
    # group binding: the rate in another agent's group does not apply
    _, d, _ = parse_robots(
        "User-agent: otherbot\nRequest-rate: 1/30\n\nUser-agent: *\nDisallow: /x\n"
    )
    assert d is None


# ---------------------------------------------------------------------------
# sitemap <url> hints
# ---------------------------------------------------------------------------


def test_sitemap_url_hints_parses_all_fields(spark):
    from kermit_spark.robots import sitemap_url_hints

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>http://a.com/1</loc><lastmod>2024-03-01</lastmod>"
        "<changefreq>Daily</changefreq><priority>0.8</priority></url>"
        "<url><loc>http://a.com/2</loc><changefreq>never</changefreq></url>"
        "<url><loc>http://a.com/3</loc><priority>bogus</priority></url>"
        "<url><loc>http://a.com/4</loc><changefreq>fortnightly</changefreq></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([("h1", xml), ("h2", None)], "host string, body string")
    out = {(r["host"], r["url_rank"]): r for r in sitemap_url_hints(df).collect()}
    assert len(out) == 4                               # null body -> no rows
    r0 = out[("h1", 0)]
    assert (r0["loc"], r0["lastmod"], r0["changefreq"]) == (
        "http://a.com/1", "2024-03-01", "daily")
    assert (r0["priority_e2"], r0["interval_s"]) == (80, 86_400)
    r1 = out[("h1", 1)]
    assert r1["lastmod"] is None and r1["priority_e2"] is None
    assert (r1["changefreq"], r1["interval_s"]) == ("never", 0)
    assert out[("h1", 2)]["priority_e2"] is None       # unparseable priority
    r3 = out[("h1", 3)]
    assert r3["changefreq"] == "fortnightly" and r3["interval_s"] is None
    plan = sitemap_url_hints(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


# ---------------------------------------------------------------------------
# schema evolution: legacy robots tables (pre-server_error) on resume
# ---------------------------------------------------------------------------


def _legacy_robots_table(spark, cat, hosts):
    """Create a robots table the way pre-outage-column code did: same
    columns as robots_rules_from_fetch MINUS server_error."""
    rows = [(i % 2, h, True, [("^/blocked", False)], None, [], 0) for i, h in enumerate(hosts)]
    legacy = spark.createDataFrame(
        rows,
        "p int, host string, fetched boolean, "
        "rules array<struct<pattern string, allow boolean>>, "
        "crawl_delay double, sitemaps array<string>, fetched_wave int",
    )
    cat.create("robots", legacy, num_partitions=2)
    return legacy


def test_legacy_robots_table_backfilled_before_append(spark, tmp_path):
    """ADVICE r3 (medium): the fast-append path must NOT mix new-schema
    files (with server_error) into a legacy table — plain reads infer
    schema from one footer, so the column could silently vanish on a
    resumed crawl. The crawler backfills ONCE (detected via the creation
    -time schema stamp), refreshes the stamp, and only then appends."""
    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.crawler import Crawler, CrawlConfig
    from kermit_spark.fetch import CorpusFetcher
    from kermit_spark.frontier import Limit, Politeness

    cat = SnapshotCatalog(spark, str(tmp_path / "cat"))
    _legacy_robots_table(spark, cat, ["old.test"])
    assert "server_error" not in cat.schema_stamp("robots")

    corpus = spark.createDataFrame(
        [("http://new.test/p/0.html", "new.test", 200, "text/html",
          "<html><body><p>page</p></body></html>")],
        "url string, host string, status int, content_type string, body string",
    )
    cfg = CrawlConfig(num_partitions=2, politeness=Politeness((Limit(".*", 5),)))
    c = Crawler(spark, cat, CorpusFetcher(corpus), cfg)
    c.seed(["http://new.test/p/0.html"])
    c.crawl(1)

    # plain read (NO mergeSchema): the column must exist and be non-null
    # on every row, legacy and fresh alike
    stored = {r["host"]: r for r in cat.read("robots").collect()}
    assert stored["old.test"]["server_error"] is False
    assert stored["new.test"]["server_error"] is False
    # stamp refreshed -> later sessions skip the probe entirely
    assert "server_error" in cat.schema_stamp("robots")
    # legacy rules survived the backfill rewrite
    assert stored["old.test"]["rules"][0]["pattern"] == "^/blocked"


def test_mixed_schema_robots_table_normalizes_nulls(spark, tmp_path):
    """Pre-fix damage: a legacy table that ALREADY had new-schema rows
    fast-appended next to legacy files. Normalization reads with
    mergeSchema (legacy rows surface server_error as NULL) and rewrites
    NULL -> False, so outage bookkeeping never sees unknowns."""
    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.crawler import Crawler, CrawlConfig
    from kermit_spark.fetch import CorpusFetcher

    cat = SnapshotCatalog(spark, str(tmp_path / "cat"))
    _legacy_robots_table(spark, cat, ["old.test"])
    # simulate the pre-fix append of a NEW-schema row (server_error=True:
    # an outage marker that must survive normalization)
    mixed = spark.createDataFrame(
        [(0, "outage.test", True, [("^/", False)], None, [], 3, True)],
        "p int, host string, fetched boolean, "
        "rules array<struct<pattern string, allow boolean>>, "
        "crawl_delay double, sitemaps array<string>, fetched_wave int, "
        "server_error boolean",
    )
    cat.merge_write("robots", mixed, replace_parts=())

    empty_corpus = spark.createDataFrame(
        [], "url string, host string, status int, content_type string, body string"
    )
    cfg = CrawlConfig(num_partitions=2)
    c = Crawler(spark, cat, CorpusFetcher(empty_corpus), cfg)
    c._normalize_robots_schema()

    stored = {r["host"]: r for r in cat.read("robots").collect()}
    assert stored["old.test"]["server_error"] is False      # NULL -> False
    assert stored["outage.test"]["server_error"] is True    # marker KEPT
    assert "server_error" in cat.schema_stamp("robots")
    # second call is a no-op (session flag), and a FRESH crawler skips the
    # probe via the refreshed stamp
    c._normalize_robots_schema()
    c2 = Crawler(spark, cat, CorpusFetcher(empty_corpus), cfg)
    c2._normalize_robots_schema()
    assert stored["outage.test"]["fetched_wave"] == 3
