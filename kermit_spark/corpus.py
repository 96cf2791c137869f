"""Deterministic synthetic web-corpus generator (the fixture analog of the
reference's local mirror fixture ``fixtures/repositories/coffeescript/`` served
by OfflineServer, /root/reference/src/kermit/extensions/ext.offline.coffee:48-93
and /root/reference/src/kermit/Crawler.int.spec.coffee:10-55).

Design goals (SURVEY §7 step 1):
  * fully deterministic from an integer seed — every value is a pure function of
    (seed, host_id, page_id); no ``rand()``, no ``Date.now`` analogs, so the
    same corpus can be regenerated on any cluster size and the golden-crawl
    tests stay stable;
  * generated with **JVM-side expressions only** (``spark.range`` + hash
    mixing) — at bench scale (millions of pages) nothing crosses into Python;
  * **skewed host distribution** (Zipf-ish pages-per-host) so the politeness /
    hot-host-salting machinery has real skew to chew on, per BASELINE.json
    ("synthetic frontier with skewed host distribution").

Corpus schema (one row per fetchable resource):
  url:string, host:string, page_id:long, kind:string(page|media),
  status:int, content_type:string, body:string

``body`` for pages is a miniature HTML document with interleaved text,
``<a href>`` links (kind=link), ``<link href>`` resources (kind=resource) and
``<img src>`` media (kind=media) — the "interleaved text + media documents"
payload of the north rule. Link targets are themselves hash-derived
(host_id, page_id) pairs, so the corpus is a closed, crawlable graph.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CorpusSpec:
    """Shape of the synthetic site graph."""

    seed: int = 42
    n_hosts: int = 20
    # host h gets max(1, base_pages // (h+1)) pages -> Zipf-ish skew: host 0 is hot.
    base_pages: int = 50
    links_per_page: int = 4
    resources_per_page: int = 1
    media_per_page: int = 1
    # fraction (in 1/8ths) of links that stay on the same host
    intra_host_eighths: int = 5
    # id space of media objects per host (img/{0..space-1}.png)
    media_id_space: int = 1000
    # extra <p> text runs per page, each a snippet repeated text_run_repeats
    # times (~25 chars per repeat) — sizes page bodies toward realistic web
    # weights (e.g. 30 runs × 16 repeats ≈ 10 kB/page) so fetch/parse carry
    # real bytes in benchmarks; 0 keeps the tiny test corpus
    extra_text_runs: int = 0
    text_run_repeats: int = 16

    def pages_for_host(self, h: int) -> int:
        return max(1, self.base_pages // (h + 1))

    @property
    def total_pages(self) -> int:
        return sum(self.pages_for_host(h) for h in range(self.n_hosts))


def _mix(*cols) -> F.Column:
    """Deterministic 64-bit hash mix of the given columns (xxhash64 is a pure
    function of its inputs + seed constant — our only 'randomness')."""
    return F.xxhash64(*cols)


def page_url(host_id, page_id) -> F.Column:
    return F.concat(
        F.lit("http://h"), host_id.cast("string"), F.lit(".test/p/"),
        page_id.cast("string"), F.lit(".html"),
    )


def media_url(host_id, media_id) -> F.Column:
    return F.concat(
        F.lit("http://h"), host_id.cast("string"), F.lit(".test/img/"),
        media_id.cast("string"), F.lit(".png"),
    )


def host_name(host_id) -> F.Column:
    return F.concat(F.lit("h"), host_id.cast("string"), F.lit(".test"))


def _pages_per_host_expr(spec: CorpusSpec, host_id) -> F.Column:
    """pages_for_host as pure arithmetic: max(1, base // (h+1)) — keeps the
    expression tree O(1) regardless of host count (an n_hosts-deep CASE chain
    here made whole-stage codegen compile for minutes at bench scale)."""
    return F.greatest(
        F.floor(F.lit(spec.base_pages) / (host_id + F.lit(1))).cast("long"),
        F.lit(1).cast("long"),
    )


def _pages_skeleton(spark: SparkSession, spec: CorpusSpec) -> DataFrame:
    """One row per (host_id, page_id): hosts × explode(sequence(0, pages-1)).
    Repartitioned after the explode so the hot host's pages don't all sit in
    one task (the generator has the same skew its consumers must handle)."""
    hosts = spark.range(0, spec.n_hosts).select(
        F.col("id").alias("host_id"),
        _pages_per_host_expr(spec, F.col("id")).alias("n_pages"),
    )
    pages = hosts.select(
        "host_id",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_pages") - 1)).alias("page_id"),
    )
    return pages.repartition(max(spark.sparkContext.defaultParallelism, 8))


def _link_target_cols(spec: CorpusSpec, slot: int):
    """Deterministic link target for (host_id, page_id, slot):
    intra-host with prob intra_host_eighths/8 else cross-host."""
    seed = F.lit(spec.seed)
    h = F.col("host_id")
    p = F.col("page_id")
    sel = F.pmod(_mix(seed, h, p, F.lit(slot), F.lit("sel")), F.lit(8))
    tgt_host = F.when(
        sel < F.lit(spec.intra_host_eighths), h
    ).otherwise(F.pmod(_mix(seed, h, p, F.lit(slot), F.lit("xh")), F.lit(spec.n_hosts)))
    pages_expr = _pages_per_host_expr(spec, tgt_host)
    tgt_page = F.pmod(_mix(seed, h, p, F.lit(slot), F.lit("pg")), pages_expr)
    return tgt_host, tgt_page


_WORDS = [
    "crawl", "frontier", "spark", "vector", "span", "media", "token", "queue",
    "politeness", "bloom", "robots", "wave", "shard", "fetch", "parse", "merge",
]


def _text_snippet(spec: CorpusSpec, tag: str) -> F.Column:
    """A short deterministic text run for (host, page, tag). A third of the
    runs join their words with an HTML character reference (``&amp;`` /
    ``&lt;`` alternating) instead of a space, so the corpus exercises
    entity decoding in text and anchor spans — real-web HTML is full of
    them, and the span tokenizer must agree with the entity-decoding
    html.parser oracle (and cheerio in the reference) on the decoded text."""
    seed = F.lit(spec.seed)
    idx1 = F.pmod(_mix(seed, F.col("host_id"), F.col("page_id"), F.lit(tag), F.lit(1)), F.lit(len(_WORDS)))
    idx2 = F.pmod(_mix(seed, F.col("host_id"), F.col("page_id"), F.lit(tag), F.lit(2)), F.lit(len(_WORDS)))
    ent = F.pmod(_mix(seed, F.col("host_id"), F.col("page_id"), F.lit(tag), F.lit("ent")), F.lit(6))
    joiner = (
        F.when(ent == 0, F.lit(" &amp; "))
        .when(ent == 1, F.lit(" &lt;tag&gt; "))
        .otherwise(F.lit(" "))
    )
    arr = F.array(*[F.lit(w) for w in _WORDS])
    return F.concat(
        F.element_at(arr, (idx1 + 1).cast("int")), joiner,
        F.element_at(arr, (idx2 + 1).cast("int")), F.lit(" of page "),
        F.col("page_id").cast("string"),
    )


def _quote_style_col(spec: CorpusSpec, slot) -> F.Column:
    """Deterministic per-(host, page, slot) attribute-quoting style 0..5."""
    return F.pmod(
        _mix(F.lit(spec.seed), F.col("host_id"), F.col("page_id"), F.lit(slot), F.lit("quot")),
        F.lit(6),
    )


def _attr_tag(tag_open: str, attr: str, value: F.Column, style: F.Column) -> F.Column:
    """Render ``<tag attr=VALUE>`` in one of six real-web quoting styles:
    0 double-quoted, 1 single-quoted, 2 unquoted, 3 double-quoted with an
    extra attribute before and whitespace around '=', 4 double-quoted with a
    PRECEDING attribute whose quoted value contains '>', 5 double-quoted
    with a '?a>b' query appended to the value itself AND a following
    attribute containing '>' — so the corpus exercises every form the span
    tokenizer (and cheerio in the reference) must parse, including the
    legal-HTML '>'-inside-quoted-value cases a naive regex truncates on."""
    return (
        F.when(style == 0, F.concat(F.lit(f'{tag_open} {attr}="'), value, F.lit('">')))
        .when(style == 1, F.concat(F.lit(f"{tag_open} {attr}='"), value, F.lit("'>")))
        .when(style == 2, F.concat(F.lit(f"{tag_open} {attr}="), value, F.lit(">")))
        .when(style == 3, F.concat(F.lit(f'{tag_open} data-k=v {attr} = "'), value, F.lit('">')))
        .when(style == 4, F.concat(F.lit(f'{tag_open} data-note="v>w" {attr}="'), value, F.lit('">')))
        .otherwise(F.concat(F.lit(f'{tag_open} {attr}="'), value, F.lit('?a>b" title="x>y">')))
    )


def build_corpus(spark: SparkSession, spec: CorpusSpec | None = None) -> DataFrame:
    """Materialize the corpus DataFrame (pages + media objects).

    Page bodies interleave text / links / resources / media in a fixed
    per-page order so span extraction has a defined golden ordering
    (SURVEY §2.5 X4 span-ordering contract).
    """
    spec = spec or CorpusSpec()
    pages = _pages_skeleton(spark, spec)

    body_parts = [F.lit("<html><head><title>"), _text_snippet(spec, "title"), F.lit("</title>")]
    # resources first (reference extracts link[href] before a[href] per
    # selector grouping; our spans carry offsets so order is explicit anyway)
    for r in range(spec.resources_per_page):
        tgt_host, _ = _link_target_cols(spec, 100 + r)
        res_url = F.concat(
            F.lit("http://h"), tgt_host.cast("string"), F.lit(f".test/static/s{r}.css")
        )
        body_parts += [_attr_tag("<link", "href", res_url, _quote_style_col(spec, 100 + r))]
    body_parts += [F.lit("</head><body><p>"), _text_snippet(spec, "intro"), F.lit("</p>")]
    for s in range(spec.links_per_page):
        tgt_host, tgt_page = _link_target_cols(spec, s)
        link_url = F.concat(
            F.lit("http://h"), tgt_host.cast("string"), F.lit(".test/p/"),
            tgt_page.cast("string"), F.lit(".html"),
        )
        body_parts += [
            _attr_tag("<a", "href", link_url, _quote_style_col(spec, s)),
            _text_snippet(spec, f"a{s}"), F.lit("</a><p>"),
            _text_snippet(spec, f"t{s}"), F.lit("</p>"),
        ]
    for r in range(spec.extra_text_runs):
        body_parts += [
            F.lit("<p>"),
            F.repeat(
                F.concat(_text_snippet(spec, f"x{r}"), F.lit(" ")),
                spec.text_run_repeats,
            ),
            F.lit("</p>"),
        ]
    for m in range(spec.media_per_page):
        media_id = F.pmod(
            _mix(F.lit(spec.seed), F.col("host_id"), F.col("page_id"), F.lit(m), F.lit("img")),
            F.lit(spec.media_id_space),
        )
        img_url = F.concat(
            F.lit("http://h"), F.col("host_id").cast("string"),
            F.lit(".test/img/"), media_id.cast("string"), F.lit(".png"),
        )
        body_parts += [_attr_tag("<img", "src", img_url, _quote_style_col(spec, 200 + m))]
    body_parts += [F.lit("</body></html>")]

    page_rows = pages.select(
        page_url(F.col("host_id"), F.col("page_id")).alias("url"),
        host_name(F.col("host_id")).alias("host"),
        F.col("host_id"),
        F.col("page_id"),
        F.lit("page").alias("kind"),
        F.lit(200).alias("status"),
        F.lit("text/html").alias("content_type"),
        F.concat(*body_parts).alias("body"),
    )

    # media objects referenced by pages: enumerate the closed id space 0..999
    # per host (only a subset is ever linked; fetches of unlinked ids 404 at
    # the fetch stage by absence, like any dead link).
    media_rows = (
        spark.range(0, spec.n_hosts * spec.media_id_space)
        .select(
            (F.col("id") / spec.media_id_space).cast("long").alias("host_id"),
            F.pmod(F.col("id"), F.lit(spec.media_id_space)).alias("media_id"),
        )
        .select(
            media_url(F.col("host_id"), F.col("media_id")).alias("url"),
            host_name(F.col("host_id")).alias("host"),
            F.col("host_id"),
            F.col("media_id").alias("page_id"),
            F.lit("media").alias("kind"),
            F.lit(200).alias("status"),
            F.lit("image/png").alias("content_type"),
            F.concat(F.lit("PNGBYTES:"), F.col("media_id").cast("string")).alias("body"),
        )
    )
    # static resources referenced by <link href>: one per (host, slot)
    static_rows = (
        spark.range(0, spec.n_hosts * spec.resources_per_page)
        .select(
            (F.col("id") / spec.resources_per_page).cast("long").alias("host_id"),
            F.pmod(F.col("id"), F.lit(spec.resources_per_page)).alias("slot"),
        )
        .select(
            F.concat(
                F.lit("http://h"), F.col("host_id").cast("string"),
                F.lit(".test/static/s"), F.col("slot").cast("string"), F.lit(".css"),
            ).alias("url"),
            host_name(F.col("host_id")).alias("host"),
            F.col("host_id"),
            F.col("slot").alias("page_id"),
            F.lit("static").alias("kind"),
            F.lit(200).alias("status"),
            F.lit("text/css").alias("content_type"),
            F.concat(F.lit("body { margin: "), F.col("slot").cast("string"), F.lit("px }")).alias("body"),
        )
    )
    # robots.txt per host: every (h % 5 == 2) host disallows the /p/1 page
    # prefix; every (h % 7 == 3) host disallows /img/; every (h % 9 == 5)
    # host declares Crawl-delay: 60 — with the default 60 s politeness
    # window that caps it at 1 URL per wave from the wave after its robots
    # is fetched. Parsed by the robots stage from these bodies — the rules
    # are data, not config.
    hid = F.col("id")
    robots_body = F.concat(
        F.lit("User-agent: *\n"),
        F.when(F.pmod(hid, F.lit(5)) == 2, F.lit("Disallow: /p/1\n")).otherwise(F.lit("")),
        F.when(F.pmod(hid, F.lit(7)) == 3, F.lit("Disallow: /img/\n")).otherwise(F.lit("")),
        F.when(F.pmod(hid, F.lit(9)) == 5, F.lit("Crawl-delay: 60\n")).otherwise(F.lit("")),
        F.when(
            F.pmod(hid, F.lit(6)) == 1,
            F.concat(
                F.lit("Sitemap: http://h"), hid.cast("string"),
                F.lit(".test/sitemap.xml\n"),
            ),
        ).otherwise(F.lit("")),
    )
    robots_rows = spark.range(0, spec.n_hosts).select(
        F.concat(F.lit("http://h"), hid.cast("string"), F.lit(".test/robots.txt")).alias("url"),
        host_name(hid).alias("host"),
        hid.alias("host_id"),
        F.lit(-1).cast("long").alias("page_id"),
        F.lit("robots").alias("kind"),
        F.lit(200).alias("status"),
        F.lit("text/plain").alias("content_type"),
        robots_body.alias("body"),
    )
    # sitemap.xml for every (h % 6 == 1) host: lists page 0 plus an orphan
    # page (/sm/only.html) reachable ONLY through the sitemap — sitemap-
    # driven discovery has observable effect on the URL-seen closure.
    sm_hosts = spark.range(0, spec.n_hosts).filter(F.pmod(hid, F.lit(6)) == 1)
    orphan_url = F.concat(
        F.lit("http://h"), hid.cast("string"), F.lit(".test/sm/only.html")
    )
    sitemap_rows = sm_hosts.select(
        F.concat(F.lit("http://h"), hid.cast("string"), F.lit(".test/sitemap.xml")).alias("url"),
        host_name(hid).alias("host"),
        hid.alias("host_id"),
        F.lit(-2).cast("long").alias("page_id"),
        F.lit("sitemap").alias("kind"),
        F.lit(200).alias("status"),
        F.lit("application/xml").alias("content_type"),
        F.concat(
            F.lit('<?xml version="1.0"?><urlset><url><loc> '),
            page_url(hid, F.lit(0).cast("long")),
            F.lit(" </loc></url><url><loc>"),
            orphan_url,
            F.lit("</loc></url></urlset>"),
        ).alias("body"),
    )
    orphan_rows = sm_hosts.select(
        orphan_url.alias("url"),
        host_name(hid).alias("host"),
        hid.alias("host_id"),
        F.lit(-3).cast("long").alias("page_id"),
        F.lit("page").alias("kind"),
        F.lit(200).alias("status"),
        F.lit("text/html").alias("content_type"),
        F.concat(
            F.lit("<html><body><p>sitemap-only page for host "),
            hid.cast("string"),
            F.lit("</p></body></html>"),
        ).alias("body"),
    )
    return (
        page_rows.unionByName(media_rows)
        .unionByName(static_rows)
        .unionByName(robots_rows)
        .unionByName(sitemap_rows)
        .unionByName(orphan_rows)
    )


def robots_for_hosts(spark: SparkSession, spec: CorpusSpec | None = None) -> DataFrame:
    """Synthetic robots.txt rules: every 7th host disallows /p/ pages with
    page_id ending in 7 via a prefix rule; host 3 disallows /img/.

    Returns (host:string, disallow_prefix:string) — the parsed form the robots
    stage produces from real robots.txt bodies.
    """
    spec = spec or CorpusSpec()
    rows = []
    for h in range(spec.n_hosts):
        if h % 7 == 3:
            rows.append((f"h{h}.test", "/img/"))
        if h % 5 == 2:
            rows.append((f"h{h}.test", "/p/1"))
    if not rows:
        rows = [("__none__.test", "/never/")]
    return spark.createDataFrame(rows, "host string, disallow_prefix string")
