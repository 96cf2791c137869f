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
