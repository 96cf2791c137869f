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

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

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


# ---------------------------------------------------------------------------
# indexed token-shard export (trainer-facing binary format)
# ---------------------------------------------------------------------------

TOKEN_INDEX_SCHEMA = StructType(
    [
        StructField("shard_id", IntegerType(), False),
        StructField("doc_id", LongType(), False),
        StructField("offset", LongType(), False),
        StructField("n_tokens", IntegerType(), False),
    ]
)


def build_token_vocab(tokens_df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Frequency-ordered vocabulary over an ``array<string>`` token column:
    (token, tid, tf) with tid = dense 0-based rank under (tf DESC, token
    ASC) — the ordering trainers expect (id 0 = most frequent).

    Ranked WITHOUT a partitionless window (the plan shape pinned against
    repo-wide): bucket = floor(log2(tf)) is monotone in tf and tf ties
    never straddle buckets, so a per-bucket window + a driver prefix sum
    over the ≤64 bucket counts yields the exact global rank — two hash
    aggs and one bucket-partitioned sort, vocabulary-sized throughout."""
    from pyspark.sql.window import Window

    stats = (
        tokens_df.select(F.explode(F.col(tokens_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", F.floor(F.log2("tf")).cast("int"))
        .persist()
    )
    sizes = {r["bucket"]: r["n"] for r in stats.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()}
    base, offsets = 0, {}
    for b in sorted(sizes, reverse=True):  # highest-tf bucket ranks first
        offsets[b] = base
        base += sizes[b]
    off_map = F.create_map(*[F.lit(x) for b in sorted(offsets) for x in (b, offsets[b])])
    w = Window.partitionBy("bucket").orderBy(F.col("tf").desc(), F.col("token").asc())
    out = stats.select(
        "token",
        (off_map[F.col("bucket")] + F.row_number().over(w) - 1).cast("int").alias("tid"),
        "tf",
    )
    # materialize distributed (NOT a driver collect — a web-scale vocab is
    # tens of millions of rows) so the ranks survive stats.unpersist()
    out = out.localCheckpoint()
    stats.unpersist()
    return out


def tokens_to_ids(
    tokens_df: DataFrame,
    vocab: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    unk_id: int = -1,
) -> DataFrame:
    """Map an ``array<string>`` token column to ``array<int>`` token ids
    through a (token, tid) vocab table: posexplode → broadcast join →
    order-restoring array_sort regroup. One shuffle on the doc id; the
    vocab never shuffles (broadcast). Unknown tokens get ``unk_id``.
    Empty/null token arrays survive as ``token_ids = []`` (posexplode_outer
    keeps the row; a dropped document would be indistinguishable from a
    missing one downstream). Output: (id_col, token_ids, n_tokens)."""
    pe = tokens_df.select(
        F.col(id_col), F.posexplode_outer(F.col(tokens_col)).alias("pos", "token")
    )
    joined = pe.join(F.broadcast(vocab.select("token", "tid")), "token", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(
                    # the null-pos marker row of an empty doc contributes
                    # nothing (collect_list skips nulls) but keeps the group
                    F.collect_list(
                        F.when(
                            F.col("pos").isNotNull(),
                            F.struct(
                                F.col("pos"),
                                F.coalesce(F.col("tid"), F.lit(unk_id)).alias("tid"),
                            ),
                        )
                    )
                ),
                lambda s: s["tid"],
            ).alias("token_ids")
        )
        .withColumn("n_tokens", F.size("token_ids"))
    )


def export_token_shards(
    df: DataFrame,
    path: str,
    ids_col: str = "token_ids",
    id_col: str = "doc_id",
    tokens_per_shard: int = 1 << 20,
    dtype: str = "uint16",
) -> DataFrame:
    """Write token-id documents as flat binary shards + a parquet index —
    the Megatron-LM-style .bin/.idx layout a training loader mmaps: shard
    files are back-to-back fixed-width token arrays, the index maps every
    doc to (shard_id, token offset, n_tokens).

    Scale shape: NO global sort anywhere. Shard assignment is
    pmod(portable_hash48(doc_id), n_shards) — deterministic, balanced in
    expectation (n_shards from ONE count/sum aggregate), and
    engine-portable so a SQL oracle can replay the whole index — so the only
    shuffle is the groupBy(shard); each shard group sorts locally by
    doc_id (shard-sized) and streams one numpy buffer to disk via an
    atomic tmp+rename, so task retries/speculation can never interleave
    bytes. Same corpus → byte-identical shards. dtype uint16 halves the
    bytes when the vocab fits 65535; ids are range-checked executor-side
    and overflow fails the job loudly.

    Local/posix paths here; on a cluster point ``path`` at the shared
    store mount (same contract as the WARC sink). Returns the index
    DataFrame (also written to ``{path}/index``)."""
    import json

    import numpy as np

    if dtype not in ("uint16", "uint32"):
        raise ValueError(f"dtype must be uint16|uint32, got {dtype!r}")
    # two actions read df (totals aggregate, then the shard write) — cache
    # so a corpus-sized upstream (tokenize + id-map) computes once
    df = df.persist()
    totals = df.agg(
        F.coalesce(F.sum(F.size(F.col(ids_col))), F.lit(0)).alias("toks"),
    ).first()
    n_shards = max(1, -(-int(totals["toks"]) // int(tokens_per_shard)))
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump({"dtype": dtype, "n_shards": n_shards,
                   "tokens_per_shard": int(tokens_per_shard)}, fh)
    lim = np.iinfo(np.dtype(dtype)).max

    def write_shard(key, pdf):
        sid = int(key[0])
        pdf = pdf.sort_values("__doc")
        arrs = [np.asarray(a, dtype=np.int64) for a in pdf["__ids"]]
        flat = np.concatenate(arrs) if arrs else np.empty(0, np.int64)
        if flat.size and (flat.min() < 0 or flat.max() > lim):
            raise ValueError(
                f"token id out of {dtype} range in shard {sid}: "
                f"[{flat.min()}, {flat.max()}]"
            )
        import tempfile

        fd, tmp = tempfile.mkstemp(dir=path, prefix=f".shard-{sid:05d}.")
        with os.fdopen(fd, "wb") as fh:
            fh.write(flat.astype(np.dtype(dtype)).tobytes())
        os.replace(tmp, os.path.join(path, f"shard-{sid:05d}.bin"))
        lens = pdf["__ids"].map(len).to_numpy(dtype=np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]]) if len(lens) else np.empty(0, np.int64)
        return pd.DataFrame(
            {
                "shard_id": sid,
                "doc_id": pdf["__doc"].to_numpy(dtype=np.int64),
                "offset": offs,
                "n_tokens": lens.astype(np.int32),
            }
        )

    from .ops.sample import portable_hash48

    staged = df.select(
        F.col(id_col).cast("long").alias("__doc"),
        F.col(ids_col).alias("__ids"),
        F.pmod(portable_hash48(F.col(id_col).cast("long")), F.lit(n_shards))
        .cast("int")
        .alias("__shard"),
    )
    idx = staged.groupBy("__shard").applyInPandas(write_shard, TOKEN_INDEX_SCHEMA)
    idx.write.mode("overwrite").parquet(os.path.join(path, "index"))
    df.unpersist()
    return df.sparkSession.read.parquet(os.path.join(path, "index"))


def read_token_shards(
    spark: SparkSession, path: str, doc_ids: list[int] | None = None
) -> DataFrame:
    """Read token-id documents back from an export_token_shards layout:
    index-driven ranged reads (seek to offset·itemsize, read n_tokens —
    cost ∝ requested docs, the read_warc_at pattern), never a full-shard
    scan unless the whole shard is asked for. Output: (doc_id, token_ids,
    n_tokens)."""
    import json

    import numpy as np

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    np_dtype = np.dtype(meta["dtype"])
    idx = spark.read.parquet(os.path.join(path, "index"))
    if doc_ids is not None:
        idx = idx.filter(F.col("doc_id").isin([int(d) for d in doc_ids]))

    out_schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            # LONG elements: a uint32 id above 2^31 is valid on disk and
            # must not wrap negative on read-back
            StructField("token_ids", ArrayType(LongType()), False),
            StructField("n_tokens", IntegerType(), False),
        ]
    )

    def fetch(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for sid, grp in pdf.groupby("shard_id"):
                fname = os.path.join(path, f"shard-{int(sid):05d}.bin")
                with open(fname, "rb") as fh:
                    for _, r in grp.sort_values("offset").iterrows():
                        fh.seek(int(r["offset"]) * np_dtype.itemsize)
                        buf = fh.read(int(r["n_tokens"]) * np_dtype.itemsize)
                        ids = np.frombuffer(buf, dtype=np_dtype).astype(np.int64)
                        rows.append((int(r["doc_id"]), ids.tolist(), int(r["n_tokens"])))
            if rows:
                yield pd.DataFrame(rows, columns=["doc_id", "token_ids", "n_tokens"])

    return idx.repartition("shard_id").mapInPandas(fetch, out_schema)
