"""robots.txt parser + frontier gating (north_rule Q12 — absent in the
reference, SURVEY §2.3)."""

from pyspark.sql import functions as F

from kermit_spark.robots import parse_robots_body, robots_gate


def test_parse_star_group():
    body = "User-agent: *\nDisallow: /private/\nDisallow: /tmp\n"
    assert parse_robots_body(body) == ["/private/", "/tmp"]


def test_parse_agent_specific_group():
    body = (
        "User-agent: googlebot\nDisallow: /g-only/\n\n"
        "User-agent: kermit-spark\nDisallow: /k-only/\n"
    )
    assert parse_robots_body(body, agent="kermit-spark") == ["/k-only/"]


def test_parse_empty_disallow_means_allow_all():
    assert parse_robots_body("User-agent: *\nDisallow:\n") == []


def test_parse_none_and_comments():
    assert parse_robots_body(None) == []
    assert parse_robots_body("# nothing here\n") == []


def test_parse_multiple_agents_share_group():
    body = "User-agent: a\nUser-agent: *\nDisallow: /x/\n"
    assert parse_robots_body(body, agent="kermit-spark") == ["/x/"]


def test_gate_drops_matching_paths(spark):
    eligible = spark.createDataFrame(
        [
            (0, "http://a.test/private/1.html", "a.test"),
            (0, "http://a.test/public/1.html", "a.test"),
            (1, "http://b.test/private/1.html", "b.test"),
        ],
        "p int, url string, host string",
    )
    rules = spark.createDataFrame(
        [("a.test", ["/private/"])], "host string, prefixes array<string>"
    )
    got = sorted(r["url"] for r in robots_gate(eligible, rules).collect())
    # b.test has no rules row -> allow-all
    assert got == ["http://a.test/public/1.html", "http://b.test/private/1.html"]


def test_gate_empty_prefixes_allows(spark):
    eligible = spark.createDataFrame(
        [(0, "http://a.test/x", "a.test")], "p int, url string, host string"
    )
    rules = spark.createDataFrame(
        [("a.test", [])], "host string, prefixes array<string>"
    )
    assert robots_gate(eligible, rules).count() == 1
