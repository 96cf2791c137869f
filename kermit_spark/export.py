"""Training-shard export — the sink end of the curation pipeline.

The ops layer produces curated documents (dedup → quality → sample →
pack); this writes them to disk in the layout a trainer consumes: one
directory per packed shard, each holding documents that together fit a
token budget, written in parallel (one task per shard, no single-writer
funnel).

Built on ``ops.text.pack_sequences`` for the bin assignment, so the
shard layout is deterministic: same corpus → same shards, byte for byte
of metadata (parquet file internals aside).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ops.text import pack_sequences


def export_training_shards(
    df: DataFrame,
    path: str,
    max_tokens: int = 256,
    by: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pack documents into token-budget shards and write them as
    ``{path}/{by}=…/`` parquet with bins whole and contiguous within
    files, returning the shard manifest (by, bin_id, n_docs, n_tokens) —
    the index a training loader reads first.

    Scale shape: pack_sequences assigns bins per group (one Arrow batch
    per group, parallel across groups); the join back to text is a hash
    join on (by, id); the write repartitions by (by, bin_id) — a bin is
    never split across tasks or files — and tasks write in parallel with
    no global sort, no single-file funnel, no driver collect. Directories
    are per GROUP only: a 10^6-bin export is parquet files in a few
    directories (bins sorted within files, so a bin_id predicate prunes
    at row-group stats), never 10^6 hive directories — partition-value
    explosion is a filesystem metadata cost this layout refuses to pay.
    The manifest aggregates the pack output (already tiny: one row per
    document, no text).
    """
    bins = pack_sequences(
        df, max_tokens=max_tokens, by=by, id_col=id_col, text_col=text_col
    )
    rows = df.drop("n_tokens", "bin_id").join(
        bins.select(by, id_col, "n_tokens", "bin_id"), [by, id_col]
    )
    (
        rows.repartition(F.col(by), F.col("bin_id"))
        .sortWithinPartitions(by, "bin_id", id_col)
        .write.mode("overwrite")
        .partitionBy(by)
        .parquet(path)
    )
    return bins.groupBy(by, "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )


def read_training_shards(
    spark: SparkSession,
    path: str,
    by: str = "source",
    shards: list[tuple] | None = None,
) -> DataFrame:
    """Read exported shards back; ``shards`` optionally restricts to
    specific (by, bin_id) pairs — partition pruning makes that a
    directory-level skip, not a scan-and-filter."""
    df = spark.read.parquet(path)
    if shards:
        cond = None
        for by_val, bin_id in shards:
            c = (F.col(by) == by_val) & (F.col("bin_id") == bin_id)
            cond = c if cond is None else (cond | c)
        df = df.filter(cond)
    return df
