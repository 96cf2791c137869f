"""URL filtering — allow/deny predicate composition as Catalyst expressions.

Re-expresses (for parity review, no code ported):
  * Filters.ByPattern / MimeTypes / AllUrls / match —
    /root/reference/src/kermit/extensions/core.filter.coffee:11-22
  * UrlFilter.isAllowed (whitelist AND blacklist semantics; defaults
    allow-all / deny-none) — core.filter.coffee:32-34,47-54

All predicates are built-in ``rlike`` column expressions so filtering stays
inside whole-stage codegen on the hot frontier path — the reference evaluates
JS regexes per URL on one thread; here Catalyst pushes the same predicates
into the scan.

The reference applies the filter both at schedule time and again when popping
from the buffer (Crawler.coffee:278,296). In a batch engine config cannot
change mid-run, so one application at discovery-merge is equivalent
(SURVEY §2.2 F5); `UrlFilter.expr` is reusable at both points regardless.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def by_pattern(pattern: str) -> "UrlPredicate":
    """F1: regex predicate over the URL (core.filter.coffee:11)."""
    return UrlPredicate(pattern)


@dataclass(frozen=True)
class UrlPredicate:
    pattern: str

    def expr(self, url: Column) -> Column:
        return url.rlike(self.pattern)


class MimeTypes:
    """F2: canned URL-suffix predicates (core.filter.coffee:13-17)."""

    CSS = UrlPredicate(r".*\.css$")
    JS = UrlPredicate(r".*\.js$")
    PDF = UrlPredicate(r".*\.pdf$")
    IMG = UrlPredicate(r".*\.(png|jpe?g|gif|svg|webp|ico)$")


ALL_URLS = UrlPredicate(r".*")


def match_any(preds: list[UrlPredicate], url: Column) -> Column:
    """F3: OR over a filter list (core.filter.coffee:19-22)."""
    if not preds:
        return F.lit(False)
    return reduce(lambda a, b: a | b, (p.expr(url) for p in preds))


@dataclass(frozen=True)
class UrlFilter:
    """F4: whitelist/blacklist — allowed iff (no allow-list OR matches ≥1
    allow) AND matches 0 deny (core.filter.coffee:47-54).

    Defaults reproduce the reference's allow-all/deny-none
    (core.filter.coffee:32-34).
    """

    allow: tuple[UrlPredicate, ...] = field(default=())
    deny: tuple[UrlPredicate, ...] = field(default=())

    def expr(self, url: Column) -> Column:
        allowed = F.lit(True) if not self.allow else match_any(list(self.allow), url)
        denied = match_any(list(self.deny), url) if self.deny else F.lit(False)
        return allowed & ~denied

    @staticmethod
    def from_patterns(allow: list[str] | None = None, deny: list[str] | None = None) -> "UrlFilter":
        return UrlFilter(
            tuple(UrlPredicate(p) for p in (allow or [])),
            tuple(UrlPredicate(p) for p in (deny or [])),
        )


@dataclass(frozen=True)
class TrapRules:
    """Crawler-trap defense: URL-shape heuristics that keep infinite URL
    spaces (calendar pages, session-id explosions, symlink loops) out of the
    frontier. No reference analog — kermit crawls whatever it discovers; the
    public models are Heritrix's PathologicalPathDecideRule /
    TooManyPathSegmentsDecideRule and the IRLbot trap lessons. At 10^10
    frontier scale one looping host can otherwise flood the queue: these
    checks run at discovery time as pure JVM expressions (whole-stage
    codegen, no UDF), so a trap URL costs one predicate, never a fetch.

    Checks, in precedence order (first hit wins):
      * too_long         — len(url) > max_url_len
      * too_deep         — more than max_path_depth non-empty path segments
      * repeat_segment   — the same path segment max_repeat_run times in a
                           row (/a/loop/loop/loop/… symlink cycles)
      * param_explosion  — more than max_query_params '&'-separated query
                           parameters
    """

    max_url_len: int = 2048
    max_path_depth: int = 20
    max_repeat_run: int = 3
    max_query_params: int = 30

    def reason_expr(self, url: Column) -> Column:
        """Classification column: 'ok' or the first matching trap reason."""
        if self.max_repeat_run != 3:
            raise NotImplementedError(
                "only max_repeat_run=3 (Heritrix default) is implemented"
            )
        path = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
        query = F.regexp_extract(url, r"\?([^#]*)", 1)
        segs = F.filter(F.split(path, "/"), lambda x: x != "")
        depth = F.size(segs)
        # run of 3 identical consecutive segments: pairwise-equality flags,
        # then AND each flag with its successor (zip_with pads the shorter
        # side with null, which can never satisfy exists)
        eq_next = F.zip_with(
            segs, F.slice(segs, 2, F.greatest(depth - 1, F.lit(0))),
            lambda x, y: x == y,
        )
        run3 = F.exists(
            F.zip_with(
                eq_next,
                F.slice(eq_next, 2, F.greatest(depth - 2, F.lit(0))),
                lambda a, b: a & b,
            ),
            lambda v: v,
        )
        n_params = F.when(query == "", F.lit(0)).otherwise(F.size(F.split(query, "&")))
        return (
            F.when(F.length(url) > self.max_url_len, F.lit("too_long"))
            .when(depth > self.max_path_depth, F.lit("too_deep"))
            .when(run3, F.lit("repeat_segment"))
            .when(n_params > self.max_query_params, F.lit("param_explosion"))
            .otherwise(F.lit("ok"))
        )

    def expr(self, url: Column) -> Column:
        """True iff the URL is NOT a trap (composable with UrlFilter.expr)."""
        return self.reason_expr(url) == "ok"
