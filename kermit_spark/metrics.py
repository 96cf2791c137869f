"""Monitoring aggregations — counters, duration stats, header histograms.

Re-expresses (parity review):
  * Monitoring per-phase counters + duration {count,min,max,avg} —
    /root/reference/src/kermit/extensions/ext.monitoring.coffee:10-74 (A1)
  * UrlStore per-phase counters — QueueSystem.coffee:154-157 (A2) — the same
    groupBy-count shape over the frontier status column
  * Histogrammer per-URL response-header collection —
    extensions/ext.histogramming.coffee:3-15 (A5/S12): the reference stores
    {url -> headers}; the useful distributed aggregate over that map is the
    per-(header, value) frequency table below.

All plain hash aggregations: one shuffle on the (low-cardinality) group key,
map-side partial aggregation, no Python. At 100 TB these run at metadata-like
cost relative to the scan they ride on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def phase_stats(
    items: DataFrame,
    phase_col: str = "phase",
    value_col: str = "duration",
    digits: int = 4,
) -> DataFrame:
    """A1/A2: per-phase row counts and duration statistics.

    Output: (phase, n, min_v, max_v, avg_v) — the Monitoring extension's
    per-phase {count, min, max, avg} ledger as one hash aggregation.
    """
    v = F.col(value_col)
    return (
        items.groupBy(F.col(phase_col).alias("phase"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min(v), digits).alias("min_v"),
            F.round(F.max(v), digits).alias("max_v"),
            F.round(F.avg(v), digits).alias("avg_v"),
        )
    )


def headers_histogram(df: DataFrame, headers_col: str = "headers") -> DataFrame:
    """A5/S12 Histogrammer aggregate: explode the per-response header map and
    count occurrences of each (header, value) pair.

    Header keys are already lowercased by the fetchers; rows with a null map
    (e.g. synthetic 404 rows) contribute nothing.
    """
    return (
        df.select(F.explode(headers_col).alias("header", "value"))
        .groupBy("header", "value")
        .agg(F.count("*").alias("n"))
    )


def fairness_stats(
    df: DataFrame, host_col: str = "host", round_digits: int = 6
) -> DataFrame:
    """Politeness-fairness summary over a wave's fetch distribution: Jain's
    fairness index J = (Σc)² / (n·Σc²) over per-host fetch counts (J = 1 →
    every host served equally; J → 1/n → one host hogs the budget), plus the
    hottest host's share. The politeness scheduler (frontier.py dequeue)
    exists to keep J high under skewed frontiers — this is the metric that
    audits it, the aggregate the reference's Monitoring counters
    (ext.monitoring.coffee:10-74) would need at fleet scale.

    Two hash-aggs (host counts → one global row), map-side partial, no
    sort. Doubles are half-up rounded so the DuckDB oracle is bit-equal.

    Output: one row (n_hosts, n_fetched, jain, top_share)."""
    counts = df.groupBy(host_col).agg(F.count(F.lit(1)).alias("_c"))
    scale = F.lit(float(10 ** round_digits))

    def _round(x):
        return F.floor(x * scale + F.lit(0.5)) / scale

    tot = F.sum("_c").cast("double")
    sq = F.sum(F.col("_c") * F.col("_c")).cast("double")
    n = F.count(F.lit(1)).cast("double")
    return counts.agg(
        n.cast("long").alias("n_hosts"),
        tot.cast("long").alias("n_fetched"),
        _round((tot * tot) / (n * sq)).alias("jain"),
        _round(F.max("_c").cast("double") / tot).alias("top_share"),
    )
