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
