"""kermit_spark — a from-scratch PySpark-native distributed crawl engine.

Re-implements the capabilities of bennidi/kermit (CoffeeScript event-loop
crawler, reference at /root/reference) as an idiomatic Spark DataFrame
pipeline: a salted, host-partitioned URL frontier with per-host politeness
budgets and robots gating, a partitioned-Bloom URL-seen set, and a
fetch/parse stage emitting interleaved text+media spans — all batch "wave"
jobs over snapshot-versioned tables (Iceberg in production; a
copy-on-write parquet snapshot catalog in this sandbox, see catalog.py).

No code is ported from the reference; file:line citations in docstrings
point at the behavior being re-expressed, for parity review only.
"""

__version__ = "0.1.0"

from .catalog import SnapshotCatalog  # noqa: E402,F401
from .control import RemoteControl  # noqa: E402,F401
from .corpus import CorpusSpec, build_corpus  # noqa: E402,F401
from .crawler import (  # noqa: E402,F401
    CrawlConfig,
    Crawler,
    ResultVerification,
    WaveStats,
)
from .fetch import CorpusFetcher, HttpFetcher  # noqa: E402,F401
from .filters import MimeTypes, UrlFilter, by_pattern  # noqa: E402,F401
from .frontier import (  # noqa: E402,F401
    Frontier,
    Limit,
    Politeness,
    RandomizedDelay,
)
from .metrics import headers_histogram, phase_stats  # noqa: E402,F401
from .session import build_session  # noqa: E402,F401

__all__ = [
    "SnapshotCatalog", "RemoteControl", "CorpusSpec", "build_corpus",
    "CrawlConfig", "Crawler", "ResultVerification", "WaveStats",
    "CorpusFetcher", "HttpFetcher",
    "MimeTypes", "UrlFilter", "by_pattern",
    "Frontier", "Limit", "Politeness", "RandomizedDelay",
    "headers_histogram", "phase_stats",
    "build_session",
]
