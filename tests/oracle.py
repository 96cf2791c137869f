"""Pure-Python reference crawler — the oracle for the e2e golden tests
(SURVEY §5 port plan: 'oracle = pure-pandas/python single-partition reference
implementation of the same semantics').

Independent of the engine: HTML parsing uses stdlib ``html.parser`` (the
engine uses a regex tokenizer), BFS/politeness/dedup are plain dicts and
sorts. Shared pieces: ``_clean_one`` URL cleaning (golden-tested on the
reference's own spec cases) and Spark-computed xxhash64 values (passed in as
a dict) because the deterministic ordering contract is *defined* over
xxhash64(url) (SURVEY §2.8).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from kermit_spark.functions.urls import _clean_one


def _oracle_robots(
    body: str | None, agent: str = "kermit-spark"
) -> tuple[list[str], float | None, list[str]]:
    """Independent robots parser for the oracle → (disallow prefixes,
    crawl_delay, sitemap urls). The engine compiles rules to regexes and
    applies RFC 9309 precedence; the synthetic corpus only emits plain
    Disallow prefixes in matching groups, where both semantics coincide —
    this stays a ~30-line prefix parser on purpose."""
    if body is None:
        return [], None, []
    agent = agent.lower()
    prefixes: list[str] = []
    delay: float | None = None
    sitemaps: list[str] = []
    applies = False
    saw_rule = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if saw_rule:
                applies, saw_rule = False, False
            if val.lower() in ("*", agent) or agent.startswith(val.lower()):
                applies = True
        elif key == "disallow":
            saw_rule = True
            if applies and val:
                prefixes.append(val)
        elif key == "crawl-delay":
            saw_rule = True
            if applies:
                try:
                    delay = float(val)
                except ValueError:
                    pass
        elif key == "sitemap":
            if val:
                sitemaps.append(val)
    return prefixes, delay, sitemaps


class _SpanParser(HTMLParser):
    """Independent span extractor: text / link / resource / media in
    document order."""

    def __init__(self):
        super().__init__()
        self.spans: list[tuple] = []
        self._anchor_href: str | None = None
        self._anchor_text: list[str] = []
        self._text: list[str] = []

    def _flush_text(self):
        txt = " ".join(" ".join(self._text).split())
        self._text = []
        if txt:
            self.spans.append(("text", txt, None, len(self.spans)))

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "a" and "href" in a:
            self._flush_text()
            self._anchor_href = a["href"]
            self._anchor_text = []
        elif tag == "link" and "href" in a:
            self._flush_text()
            self.spans.append(("resource", None, a["href"], len(self.spans)))
        elif tag == "img" and "src" in a:
            self._flush_text()
            self.spans.append(("media", None, a["src"], len(self.spans)))

    def handle_endtag(self, tag):
        if tag == "a" and self._anchor_href is not None:
            txt = " ".join(" ".join(self._anchor_text).split()) or None
            self.spans.append(("link", txt, self._anchor_href, len(self.spans)))
            self._anchor_href = None
            self._anchor_text = []

    def handle_data(self, data):
        if self._anchor_href is not None:
            self._anchor_text.append(data)
        else:
            self._text.append(data)


def extract_spans_oracle(body: str) -> list[tuple]:
    p = _SpanParser()
    p.feed(body)
    p._flush_text()
    return p.spans


@dataclass
class OracleResult:
    # url -> dict(status, depth, wave, rank) for fetched URLs; rank None if never fetched
    frontier: dict = field(default_factory=dict)
    # url -> list of span tuples
    documents: dict = field(default_factory=dict)
    # (wave, host, rank) -> url  — the reproducible crawl order
    crawl_order: dict = field(default_factory=dict)


def oracle_crawl(
    corpus: dict[str, tuple[int, str, str]],  # url -> (status, content_type, body)
    seeds: list[str],
    url_hash: dict[str, int],  # Spark xxhash64(url) for every URL that can appear
    limits: list[tuple[str, int]],  # (host regex, budget) — first match decides
    max_waves: int,
    obey_robots: bool = True,
    url_filter=None,  # callable url -> bool
    politeness_window_s: float = 60.0,
) -> OracleResult:
    res = OracleResult()
    allow = url_filter or (lambda u: True)

    def host_of(u: str) -> str:
        return re.match(r"^[a-z]+://([^/:]+)", u).group(1)

    # crawl-delay caps known as of the START of a wave — the engine fetches
    # a host's robots AFTER dequeuing it, so its Crawl-delay binds from the
    # NEXT wave; the oracle reproduces that one-wave lag by filling this
    # dict only when a host's robots body is first consulted (gate time)
    known_delay: dict[str, float] = {}

    def budget_of(h: str) -> int:
        b = None
        for pat, lim in limits:
            if re.search(pat, h):
                b = lim
                break
        if b is None:
            raise ValueError(f"no limit for {h}")
        d = known_delay.get(h)
        if obey_robots and d and d > 0 and politeness_window_s > 0:
            b = min(b, max(1, int(politeness_window_s // d)))
        return b

    # frontier rows: url -> record
    for u in sorted(set(seeds)):
        if allow(u):
            res.frontier[u] = {"status": "scheduled", "depth": 0, "wave": 0,
                               "priority": 0.0, "tries": 0}

    robots: dict[str, list[str]] = {}

    # sitemap <loc> candidates from hosts whose robots arrived this wave —
    # drained into the SAME wave's discovered list (mirrors the engine
    # merging them into that wave's single frontier commit)
    pending_sitemap_locs: list[str] = []

    def robots_prefixes(h: str) -> list[str]:
        if h not in robots:
            rec = corpus.get(f"http://{h}/robots.txt")
            prefixes, delay, sitemaps = (
                _oracle_robots(rec[2]) if rec and rec[0] == 200 else ([], None, [])
            )
            robots[h] = prefixes
            if delay is not None:
                known_delay[h] = delay
            for sm_url in sitemaps:
                sm = corpus.get(sm_url)
                if sm is None or sm[0] != 200:
                    continue
                for loc in re.findall(r"<loc>\s*([^<\s][^<]*?)\s*</loc>", sm[2], re.I):
                    cleaned = _clean_one(sm_url, loc)
                    if cleaned is not None and allow(cleaned):
                        pending_sitemap_locs.append(cleaned)
        return robots[h]

    for wave in range(max_waves):
        eligible = [u for u, r in res.frontier.items()
                    if r["status"] == "scheduled" and allow(u)]
        # per-host deterministic top-k (priority DESC, depth, wave, url_hash)
        by_host: dict[str, list[str]] = {}
        for u in eligible:
            by_host.setdefault(host_of(u), []).append(u)
        selected: list[tuple[str, str, int]] = []  # (host, url, rank)
        for h, urls in by_host.items():
            urls.sort(key=lambda u: (-res.frontier[u]["priority"],
                                     res.frontier[u]["depth"],
                                     res.frontier[u]["wave"],
                                     url_hash[u]))
            for rank, u in enumerate(urls[: budget_of(h)], start=1):
                selected.append((h, u, rank))
        if not selected:
            break
        discovered: list[tuple[str, int, float]] = []  # (url, depth, priority)
        for h, u, rank in selected:
            rec = res.frontier[u]
            # robots gate on the selected batch
            if obey_robots:
                path = re.sub(r"^[a-z]+://[^/]+", "", u) or "/"
                if any(path.startswith(pfx) for pfx in robots_prefixes(h)):
                    rec["status"] = "robots_blocked"
                    continue
            res.crawl_order[(wave, h, rank)] = u
            rec["rank"] = rank
            hit = corpus.get(u)
            if hit is None or hit[0] != 200:
                rec["status"] = "error"
                rec["tries"] += 1
                res.documents[u] = []
                continue
            rec["status"] = "visited"
            status, ctype, body = hit
            if ctype == "text/html":
                spans = extract_spans_oracle(body)
            else:
                spans = [("media", None, u, 0)]
            res.documents[u] = spans
            for kind, text, ref, off in spans:
                if kind not in ("link", "resource", "media"):
                    continue
                cleaned = _clean_one(u, ref)
                if cleaned is None or not allow(cleaned):
                    continue
                discovered.append((cleaned, rec["depth"] + 1, 0.0))
        # sitemap-driven discovery (depth 0) joins this wave's batch
        for u in pending_sitemap_locs:
            discovered.append((u, 0, 0.0))
        pending_sitemap_locs.clear()
        # within-batch dedup: best (priority DESC, depth, wave, hash) wins;
        # then first-insertion dedup against the frontier (Q1)
        best: dict[str, tuple] = {}
        for u, depth, prio in discovered:
            key = (-prio, depth, wave, url_hash[u])
            if u not in best or key < best[u][0]:
                best[u] = (key, depth, prio)
        for u, (_, depth, prio) in best.items():
            if u not in res.frontier:
                res.frontier[u] = {"status": "scheduled", "depth": depth,
                                   "wave": wave, "priority": prio, "tries": 0}
    return res
