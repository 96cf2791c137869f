"""robots.txt fetching, parsing and frontier gating.

The reference has NO robots handling anywhere in src/ (SURVEY §2.3 Q12) —
the north rule adds it as a first-class requirement. Design:

  * per-host robots state lives in a ``robots`` catalog table
    (host, p, fetched:boolean, rules:array<struct<pattern,allow>>) — one row
    per host, partitioned by the same host-salt key as the frontier so
    gating joins are co-partitioned;
  * before each wave, hosts present in the eligible set but absent from the
    robots table get ``http://host/robots.txt`` fetched through the SAME
    fetcher as regular pages (corpus-backed in tests, HTTP in production) and
    parsed with an Arrow-batched pandas UDF;
  * gating is JVM-side: candidates join the (small, aggregated) per-host
    rule arrays — broadcast, one row per host — and are dropped when the
    highest-precedence matching rule is a disallow. No per-row Python on the
    frontier path.

Parser semantics follow RFC 9309 (the 2022 Robots Exclusion Protocol
standard — public):

  * ``User-agent`` groups; the crawler obeys the group(s) whose agent token
    matches MOST SPECIFICALLY (longest token that prefixes our agent name);
    ``*`` groups apply only when no named group matches.
  * ``Allow:`` and ``Disallow:`` path rules; ``*`` matches any char
    sequence, a trailing ``$`` anchors the end of the path.
  * Precedence at match time: the longest (most specific) matching rule
    wins; on an allow/disallow tie, allow wins. Implemented by sorting each
    host's rules by (raw length desc, allow first) at parse time and taking
    the FIRST match at gate time.
  * Empty ``Disallow:`` means allow-all; missing/failed robots.txt means
    allow-all (the common crawler default).

Rule paths are compiled to anchored regexes at parse time (escape, ``*`` →
``.*``, trailing ``$`` → ``$``), evaluated JVM-side with ``regexp_like``
inside a higher-order filter — one small regex list per host, zero Python
on the frontier path.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

RULES_TYPE = ArrayType(
    StructType(
        [
            StructField("pattern", StringType()),
            StructField("allow", BooleanType()),
        ]
    )
)

PARSED_TYPE = StructType(
    [
        StructField("rules", RULES_TYPE),
        StructField("crawl_delay", DoubleType()),
        StructField("sitemaps", ArrayType(StringType())),
    ]
)


def _rule_to_regex(path: str) -> str:
    """One robots path rule → anchored regex, portable across Java regex /
    RE2 / Python re (only punctuation escapes, ``.*`` and ``$`` are used)."""
    anchored = path.endswith("$")
    if anchored:
        path = path[:-1]
    pattern = "^" + ".*".join(re.escape(seg) for seg in path.split("*"))
    return pattern + "$" if anchored else pattern


def parse_robots(
    body: str | None, agent: str = "kermit-spark"
) -> tuple[list[tuple[str, bool]], float | None, list[str]]:
    """One robots.txt body → (rules, crawl_delay, sitemaps) for the most
    specific user-agent group binding ``agent``. Rules are
    [(pattern_regex, allow)] in precedence order (longest raw rule first,
    allow before disallow on equal length — RFC 9309 §2.2.2).
    ``crawl_delay`` is the conventional (non-RFC but ubiquitous) per-group
    ``Crawl-delay:`` seconds, None when absent/invalid. ``sitemaps`` are
    the group-INDEPENDENT ``Sitemap:`` URLs (sitemaps.org protocol; RFC
    9309 §2.2.4 'other records') in file order."""
    if body is None:
        return [], None, []
    agent = agent.lower()
    # groups: list of (ua_tokens, rules[(raw_path, allow)], crawl_delay)
    groups: list[tuple[list[str], list[tuple[str, bool]], float | None]] = []
    tokens: list[str] = []
    rules: list[tuple[str, bool]] = []
    delay: float | None = None
    sitemaps: list[str] = []
    in_group_rules = False

    def close_group() -> None:
        nonlocal tokens, rules, delay, in_group_rules
        groups.append((tokens, rules, delay))
        tokens, rules, delay, in_group_rules = [], [], None, False

    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_rules:
                close_group()
            tokens.append(val.lower())
        elif key in ("disallow", "allow"):
            in_group_rules = True
            if val:
                rules.append((val, key == "allow"))
        elif key == "crawl-delay":
            in_group_rules = True
            try:
                parsed = float(val)
                if parsed >= 0:
                    delay = max(delay or 0.0, parsed)
            except ValueError:
                pass
        elif key == "request-rate":
            # legacy but still-served directive: "n/m[ hhmm-hhmm]" = n pages
            # per m seconds → m/n seconds between requests; folded into the
            # same per-group delay channel (the stricter value wins), so
            # Crawl-delay budget caps and fetch pacing honor it for free.
            # Time-of-day windows are ignored (the wave clock has no
            # wall-time identity); malformed or zero-page forms are skipped.
            in_group_rules = True
            m = re.match(r"^(\d+)\s*/\s*(\d+)", val)
            if m and int(m.group(1)) > 0 and int(m.group(2)) >= 0:
                delay = max(delay or 0.0, int(m.group(2)) / int(m.group(1)))
        elif key == "sitemap":
            # group-independent record: does not open/close a group
            if val:
                sitemaps.append(val)
    if tokens or rules or delay is not None:
        close_group()

    def specificity(ua: str) -> int:
        # RFC 9309 §2.2.1: the most specific matching token wins; '*' is the
        # least specific and applies only when nothing else matches
        if ua == "*":
            return 0
        if agent.startswith(ua):
            return len(ua)
        return -1

    best = -1
    for tok_list, _, _ in groups:
        for ua in tok_list:
            best = max(best, specificity(ua))
    if best < 0:
        return [], None, sitemaps
    merged: list[tuple[str, bool]] = []
    crawl_delay: float | None = None
    for tok_list, grp_rules, grp_delay in groups:
        if any(specificity(ua) == best for ua in tok_list):
            merged.extend(grp_rules)
            if grp_delay is not None:
                crawl_delay = max(crawl_delay or 0.0, grp_delay)
    # precedence: longest raw rule first; allow wins length ties (§2.2.2)
    merged.sort(key=lambda r: (-len(r[0]), not r[1]))
    return (
        [(_rule_to_regex(path), allow) for path, allow in merged],
        crawl_delay,
        sitemaps,
    )


def parse_robots_rules(
    body: str | None, agent: str = "kermit-spark"
) -> list[tuple[str, bool]]:
    """Rules-only view of :func:`parse_robots`."""
    return parse_robots(body, agent)[0]


_SITEMAP_LOC_RE = re.compile(r"<loc>\s*([^<\s][^<]*?)\s*</loc>", re.IGNORECASE)


def parse_sitemap_locs(body: str | None) -> list[str]:
    """``<loc>`` entries of a sitemap/sitemapindex body in file order.
    Whether those locs are page URLs or child sitemaps depends on the root
    element — sitemap_candidates_from_fetch exposes that as ``is_index``
    (detected JVM-side) and the crawler expands index files one level, which
    is spec-complete: a sitemapindex must not list other index files
    (sitemaps.org protocol, 'Sitemap index files may not list other Sitemap
    index files')."""
    if body is None:
        return []
    return _SITEMAP_LOC_RE.findall(body)


def make_parse_udf(agent: str = "kermit-spark"):
    def frame(body: pd.Series) -> pd.DataFrame:
        parsed = body.map(lambda b: parse_robots(b, agent))
        return pd.DataFrame(
            {
                "rules": parsed.map(lambda p: p[0]),
                "crawl_delay": parsed.map(lambda p: p[1]),
                "sitemaps": parsed.map(lambda p: p[2]),
            }
        )

    return pandas_udf(frame, PARSED_TYPE)


def robots_rules_from_fetch(
    fetched: DataFrame, agent: str = "kermit-spark", wave: int = 0,
    server_error_disallow: bool = True,
) -> DataFrame:
    """Fetched robots.txt rows → (p, host, fetched, rules, crawl_delay,
    sitemaps, fetched_wave). Status-class semantics per RFC 9309 §2.3.1:
    200 parses the body; 4xx/other non-200 "unavailable" yields empty rules
    (allow-all, §2.3.1.3); 5xx "unreachable" yields a complete-disallow rule
    (§2.3.1.4 — a crawler MUST assume full disallow while the server
    errors; with ``robots_max_age_waves`` expiry the host re-probes and
    recovers, with fetch-once it stays conservatively blocked).
    ``server_error_disallow=False`` restores the older allow-all-on-any-
    failure behavior. ``fetched_wave`` stamps WHEN the rules were obtained —
    the age datum robots_max_age_waves expiry reads (RFC 9309 §2.4: cached
    robots results should not be used for longer than the origin allows,
    commonly bounded at 24 h; the wave clock is this engine's time base)."""
    parse = make_parse_udf(agent)
    allow_all = F.struct(
        F.array().cast(RULES_TYPE).alias("rules"),
        F.lit(None).cast("double").alias("crawl_delay"),
        F.array().cast("array<string>").alias("sitemaps"),
    )
    # url_path() always yields a leading '/', so '^/' matches every target
    disallow_all = F.struct(
        F.array(
            F.struct(F.lit("^/").alias("pattern"), F.lit(False).alias("allow"))
        ).cast(RULES_TYPE).alias("rules"),
        F.lit(None).cast("double").alias("crawl_delay"),
        F.array().cast("array<string>").alias("sitemaps"),
    )
    failed = (
        F.when(
            (F.col("status") >= 500) & (F.col("status") <= 599), disallow_all
        ).otherwise(allow_all)
        if server_error_disallow
        else allow_all
    )
    parsed = F.when(F.col("status") == 200, parse(F.col("body"))).otherwise(failed)
    is_5xx = (F.col("status") >= 500) & (F.col("status") <= 599)
    return fetched.select(
        F.col("p"),
        F.col("host"),
        F.lit(True).alias("fetched"),
        parsed.alias("_parsed"),
        # marker consumed by the expiry re-probe: a host blocked by OUTAGE
        # (not by declared policy) has its robots_blocked frontier rows
        # flipped back to scheduled when a later probe succeeds
        (F.lit(bool(server_error_disallow)) & is_5xx).alias("server_error"),
    ).select(
        "p",
        "host",
        "fetched",
        F.col("_parsed.rules").alias("rules"),
        F.col("_parsed.crawl_delay").alias("crawl_delay"),
        F.col("_parsed.sitemaps").alias("sitemaps"),
        F.lit(wave).alias("fetched_wave"),
        "server_error",
    )


def make_sitemap_udf():
    def series(body: pd.Series) -> pd.Series:
        return body.map(parse_sitemap_locs)

    return pandas_udf(series, ArrayType(StringType()))


def sitemap_candidates_from_fetch(fetched: DataFrame) -> DataFrame:
    """Fetched sitemap rows → candidate frontier URLs: (url, referer,
    depth=0, priority) — depth 0 because a sitemap listing is authoritative
    seeding, not link-graph traversal. Raw <loc> values; the caller cleans
    them against the sitemap URL (same uri.clean path as discovered
    links)."""
    parse = make_sitemap_udf()
    locs = fetched.select(
        F.col("url").alias("sitemap_url"),
        F.when(F.col("status") == 200, parse(F.col("body")))
        .otherwise(F.array().cast("array<string>"))
        .alias("locs"),
        # index detection stays JVM-side (no second pass through Python):
        # a sitemapindex root means the locs are CHILD SITEMAPS, not pages
        (
            (F.col("status") == 200)
            & F.coalesce(F.col("body").rlike(r"<\s*sitemapindex\b"), F.lit(False))
        ).alias("is_index"),
    )
    return locs.select(
        F.col("sitemap_url"), F.explode("locs").alias("loc"), F.col("is_index")
    )


def url_path(url) -> F.Column:
    """Rule-match target: path plus '?query' when present, JVM-side
    (parse_url stays in codegen). Queries are included because robots
    patterns like ``/*.php$`` or ``/*?`` are defined over everything after
    the authority — an end anchor must NOT match a URL that continues with
    a query string."""
    raw = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("/"))
    path = F.when(raw == "", F.lit("/")).otherwise(raw)
    query = F.parse_url(url, F.lit("QUERY"))
    return F.when(query.isNull(), path).otherwise(F.concat(path, F.lit("?"), query))


def robots_gate(eligible: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop eligible frontier rows whose highest-precedence matching rule is
    a disallow. ``robots`` has ≤ one row per host → broadcast join; rules
    arrive precedence-sorted from the parser, so the verdict is the first
    element of the filtered array."""
    rules = robots.select(F.col("host").alias("_r_host"), "rules")
    joined = eligible.join(
        F.broadcast(rules), eligible.host == rules._r_host, "left"
    )
    path = url_path(F.col("url"))
    matched = F.filter(F.col("rules"), lambda r: F.regexp_like(path, r["pattern"]))
    # no robots row / no matching rule → first is NULL → coalesce to allowed
    blocked = F.coalesce(~F.get(matched, F.lit(0))["allow"], F.lit(False))
    return joined.filter(~blocked).drop("_r_host", "rules")


#: sitemaps.org <changefreq> → revisit interval seconds ('never' → 0 means
#: "do not schedule on this hint"; 'always' floors at 5 min like the
#: politeness minimum). Public protocol values only.
CHANGEFREQ_INTERVAL_S = {
    "always": 300,
    "hourly": 3_600,
    "daily": 86_400,
    "weekly": 604_800,
    "monthly": 2_592_000,
    "yearly": 31_536_000,
    "never": 0,
}


def sitemap_url_hints(df: DataFrame, body_col: str = "body") -> DataFrame:
    """Per-``<url>`` sitemap hints beyond the bare ``<loc>`` extraction of
    :func:`parse_sitemap_locs`: lastmod, changefreq and priority — the
    freshness signals a recrawl scheduler consumes (sitemaps.org protocol;
    the reference never parses sitemaps, `src/kermit` has no handler — this
    extends the engine the way Crawler.adaptive_recrawl extends revisit
    logic).

    Emits one row per ``<url>`` block: all non-body input columns,
    ``url_rank`` (file order), ``loc``, ``lastmod`` (string, ISO-8601 sorts
    lexicographically), ``changefreq`` (lowercased), ``priority_e2``
    (floor(priority·100 + 0.5), null when absent/unparseable) and
    ``interval_s`` from CHANGEFREQ_INTERVAL_S (null for unknown values —
    the caller's recrawl policy supplies its default).

    Scale shape: pure JVM — regexp_extract_all for the blocks, per-field
    regexp_extract in one codegen projection, narrow posexplode; no
    Python, no shuffle."""
    blocks = F.regexp_extract_all(
        F.coalesce(F.col(body_col), F.lit("")),
        F.lit(r"(?s)<url>(.*?)</url>"),
        1,
    )
    others = [c for c in df.columns if c != body_col]
    rows = df.select(*others, F.posexplode(blocks).alias("url_rank", "_b"))
    b = F.col("_b")

    def field(tag: str):
        return F.regexp_extract(b, rf"(?s)<{tag}>\s*(.*?)\s*</{tag}>", 1)

    changefreq = F.lower(F.nullif(field("changefreq"), F.lit("")))
    pr = F.nullif(field("priority"), F.lit("")).try_cast("double")
    interval = None
    for name, secs in CHANGEFREQ_INTERVAL_S.items():
        cond = (changefreq == name, F.lit(secs).cast("long"))
        interval = F.when(*cond) if interval is None else interval.when(*cond)
    return rows.select(
        *others,
        "url_rank",
        field("loc").alias("loc"),
        F.nullif(field("lastmod"), F.lit("")).alias("lastmod"),
        changefreq.alias("changefreq"),
        F.floor(pr * 100 + F.lit(0.5)).cast("long").alias("priority_e2"),
        interval.alias("interval_s"),
    )
