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
