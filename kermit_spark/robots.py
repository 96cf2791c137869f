"""robots.txt fetching, parsing and frontier gating.

The reference has NO robots handling anywhere in src/ (SURVEY §2.3 Q12) —
the north rule adds it as a first-class requirement. Design:

  * per-host robots state lives in a ``robots`` catalog table
    (host, p, fetched:boolean, prefixes:array<string>) — one row per host,
    partitioned by the same host-salt key as the frontier so gating joins
    are co-partitioned;
  * before each wave, hosts present in the eligible set but absent from the
    robots table get ``http://host/robots.txt`` fetched through the SAME
    fetcher as regular pages (corpus-backed in tests, HTTP in production) and
    parsed with an Arrow-batched pandas UDF;
  * gating is JVM-side: candidates join the (small, aggregated) per-host
    prefix arrays — broadcast, one row per host — and are dropped when
    ``exists(prefixes, x -> startswith(path, x))``. No per-row Python on the
    frontier path.

Parser semantics: the standard subset — ``User-agent`` groups, ``Disallow:``
prefix rules; rules apply if the group names ``*`` or our agent; empty
Disallow means allow-all; missing/failed robots.txt means allow-all (the
common crawler default).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType


def parse_robots_body(body: str | None, agent: str = "kermit-spark") -> list[str]:
    """One robots.txt body → list of disallow prefixes that bind our agent."""
    if body is None:
        return []
    agent = agent.lower()
    prefixes: list[str] = []
    applies = False
    saw_rule_in_group = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if saw_rule_in_group:
                applies = False
                saw_rule_in_group = False
            ua = val.lower()
            if ua == "*" or ua == agent or agent.startswith(ua):
                applies = True
        elif key == "disallow":
            saw_rule_in_group = True
            if applies and val:
                prefixes.append(val)
    return prefixes


def make_parse_udf(agent: str = "kermit-spark"):
    def series(body: pd.Series) -> pd.Series:
        return body.map(lambda b: parse_robots_body(b, agent))

    return pandas_udf(series, ArrayType(StringType()))


def robots_rules_from_fetch(fetched: DataFrame, agent: str = "kermit-spark") -> DataFrame:
    """Fetched robots.txt rows → (p, host, fetched, prefixes). Non-200
    fetches yield empty prefixes (allow-all)."""
    parse = make_parse_udf(agent)
    return fetched.select(
        F.col("p"),
        F.col("host"),
        F.lit(True).alias("fetched"),
        F.when(F.col("status") == 200, parse(F.col("body")))
        .otherwise(F.array().cast("array<string>"))
        .alias("prefixes"),
    )


def url_path(url) -> F.Column:
    """Path component, JVM-side (parse_url stays in codegen)."""
    return F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("/"))


def robots_gate(eligible: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop eligible frontier rows whose path matches a disallow prefix of
    their host. ``robots`` has ≤ one row per host → broadcast join."""
    rules = robots.select(F.col("host").alias("_r_host"), "prefixes")
    joined = eligible.join(
        F.broadcast(rules), eligible.host == rules._r_host, "left"
    )
    path = url_path(F.col("url"))
    blocked = F.when(
        F.col("prefixes").isNull(), F.lit(False)
    ).otherwise(F.exists("prefixes", lambda x: path.startswith(x)))
    return joined.filter(~blocked).drop("_r_host", "prefixes")
