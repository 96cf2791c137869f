"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship crawl: it synthesizes a closed web corpus from the
sf0.001 ``documents`` table (each row becomes a page whose body interleaves
its text with deterministic links to other docs), seeds the frontier, runs
crawl waves through the full engine (robots → politeness dequeue → fetch →
span parse → Bloom-dedup → frontier merge) and returns the crawled documents.

``queries``/``oracle_sql`` expose each operator from SURVEY §2 over the
driver testdata tables with a DuckDB-checkable ANSI-SQL oracle.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# flagship: crawl a corpus synthesized from the documents table
# ---------------------------------------------------------------------------


def _corpus_from_documents(spark: SparkSession, sf_dir: str, n_hosts: int = 8) -> DataFrame:
    """Turn the testdata documents table into a closed crawlable site graph:
    doc i lives at http://d{doc_id % n_hosts}.test/doc/{doc_id}.html and links
    to docs (i*7+1) % N and (i*13+3) % N — deterministic, no RNG."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    d = F.col("doc_id")
    host = F.concat(F.lit("d"), F.pmod(d, F.lit(n_hosts)).cast("string"), F.lit(".test"))
    url_of = lambda key: F.concat(  # noqa: E731
        F.lit("http://d"), F.pmod(key, F.lit(n_hosts)).cast("string"),
        F.lit(".test/doc/"), key.cast("string"), F.lit(".html"),
    )
    t1 = F.pmod(d * 7 + 1, F.lit(n))
    t2 = F.pmod(d * 13 + 3, F.lit(n))
    body = F.concat(
        F.lit("<html><body><p>"), F.col("text"), F.lit("</p>"),
        F.lit('<a href="'), url_of(t1), F.lit('">next</a>'),
        F.lit('<a href="'), url_of(t2), F.lit('">related</a>'),
        F.lit("</body></html>"),
    )
    return docs.select(
        url_of(d).alias("url"),
        host.alias("host"),
        F.lit(200).alias("status"),
        F.lit("text/html").alias("content_type"),
        body.alias("body"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship crawl on /root/testdata/sf0.001; returns crawled documents
    with interleaved spans. Driver checks rows > 0 and stable schema."""
    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.crawler import Crawler, CrawlConfig
    from kermit_spark.fetch import CorpusFetcher
    from kermit_spark.frontier import Limit, Politeness

    sf_dir = "/root/testdata/sf0.001"
    corpus = _corpus_from_documents(spark, sf_dir).cache()
    root = tempfile.mkdtemp(prefix="kermit_entry_")
    cfg = CrawlConfig(
        num_partitions=8,
        politeness=Politeness((Limit(r".*", 25),)),
        max_waves=2,
        obey_robots=True,
    )
    crawler = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus), cfg)
    crawler.seed(["http://d0.test/doc/0.html"])
    crawler.crawl(2)
    return crawler.documents().select(
        "doc_id", "url", "host", "status", "content_type", "depth", "rank", "spans"
    )


# ---------------------------------------------------------------------------
# oracle-checked operator queries (each maps to a SURVEY §2 operator)
# ---------------------------------------------------------------------------
# Every query derives URL-shaped data from the TPC-H-ish tables so DuckDB can
# run the identical relational semantics. Aliases match the SQL exactly.


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/F8 canonicalization contract in portable form: lowercase scheme+
    host, strip fragment, drop default port (the pandas-UDF path covers the
    full RFC semantics; golden-tested in tests/test_url_clean.py)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    raw = F.concat(
        F.lit("HTTP://H"), F.pmod(F.col("o_custkey"), F.lit(50)).cast("string"),
        F.lit(".TEST:80/o/"), F.col("o_orderkey").cast("string"), F.lit("#frag"),
    )
    url = F.regexp_replace(raw, r"#.*$", "")
    url = F.regexp_replace(url, r":80/", "/")
    return (
        orders.select(F.col("o_orderkey").alias("okey"), F.lower(url).alias("canon_url"))
        .orderBy("okey")
        .limit(1000)
    )


def q_frontier_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 URL-seen dedup as exact anti-join: candidate URLs from lineitem
    (duplicate orderkeys collapse), minus already-seen (orders with
    o_orderkey % 3 = 0), counted per host."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cand = li.select(
        F.pmod(F.col("l_orderkey"), F.lit(20)).cast("long").alias("host_id"),
        F.col("l_orderkey").alias("okey"),
    ).dropDuplicates(["okey"])
    seen = orders.filter(F.pmod(F.col("o_orderkey"), F.lit(3)) == 0).select(
        F.col("o_orderkey").alias("okey")
    )
    new = cand.join(seen, "okey", "left_anti")
    return (
        new.groupBy("host_id")
        .agg(F.count("*").alias("n_new"))
        .orderBy("host_id")
    )


def q_politeness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5/Q9 deterministic per-host top-k dequeue: budget 3 per host, ordered
    by (priority DESC, key ASC)."""
    from pyspark.sql.window import Window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    elig = orders.select(
        F.pmod(F.col("o_custkey"), F.lit(25)).cast("long").alias("host_id"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("priority"),
    )
    w = Window.partitionBy("host_id").orderBy(F.col("priority").desc(), F.col("okey").asc())
    return (
        elig.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("host_id", "rnk", "okey", "priority")
        .orderBy("host_id", "rnk")
    )


def q_phase_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 monitoring counters: per-phase counts + duration stats
    (events.event_type stands in for the phase column)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.col("event_type").alias("phase"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 4).alias("min_v"),
            F.round(F.max("value"), 4).alias("max_v"),
            F.round(F.avg("value"), 4).alias("avg_v"),
        )
        .orderBy("phase")
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data op: exact text dedup via content hash — keep the lowest
    doc_id per md5(text), count collapsed copies."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("h"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
        .orderBy("keep_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "url_canonicalize": q_url_canonicalize,
        "frontier_dedup": q_frontier_dedup,
        "politeness_topk": q_politeness_topk,
        "phase_counts": q_phase_counts,
        "dedup_exact": q_dedup_exact,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "url_canonicalize": """
            SELECT o_orderkey AS okey,
                   lower(regexp_replace(regexp_replace(
                       'HTTP://H' || (o_custkey % 50) || '.TEST:80/o/' || o_orderkey || '#frag',
                       '#.*$', ''), ':80/', '/')) AS canon_url
            FROM orders ORDER BY okey LIMIT 1000
        """,
        "frontier_dedup": """
            WITH cand AS (
                SELECT DISTINCT l_orderkey AS okey, (l_orderkey % 20) AS host_id
                FROM lineitem
            ),
            seen AS (
                SELECT o_orderkey AS okey FROM orders WHERE o_orderkey % 3 = 0
            )
            SELECT host_id, count(*) AS n_new
            FROM cand WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.okey = cand.okey)
            GROUP BY host_id ORDER BY host_id
        """,
        "politeness_topk": """
            SELECT host_id, rnk, okey, priority FROM (
                SELECT (o_custkey % 25) AS host_id, o_orderkey AS okey,
                       o_totalprice AS priority,
                       row_number() OVER (PARTITION BY (o_custkey % 25)
                                          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
                FROM orders
            ) WHERE rnk <= 3 ORDER BY host_id, rnk
        """,
        "phase_counts": """
            SELECT event_type AS phase, count(*) AS n,
                   round(min(value), 4) AS min_v,
                   round(max(value), 4) AS max_v,
                   round(avg(value), 4) AS avg_v
            FROM events GROUP BY event_type ORDER BY phase
        """,
        "dedup_exact": """
            SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
            FROM documents GROUP BY md5(text) ORDER BY keep_id
        """,
    }
