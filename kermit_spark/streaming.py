"""Structured Streaming surface — continuous variants of the batch wave ops.

The reference's "streaming" is Node byte-streams (SURVEY §2.9: no watermarks,
no stateful dataflow), and the engine's core loop is deliberately batch waves
(SURVEY §7 architecture choice). This module covers the places where a
production deployment genuinely benefits from Structured Streaming:

  stream_schedule_urls   continuous frontier ingest: a file-source stream of
                         newline-delimited URL lists (e.g. sitemap dumps,
                         external seed feeds) is canonicalized and merged
                         into the frontier through the SAME dedup path the
                         batch waves use (foreachBatch → Frontier.schedule) —
                         micro-batch = mini-wave, so politeness/dedup
                         semantics stay identical and exactly-once comes from
                         the snapshot commit + checkpoint pair.
  fetch_metrics_stream   windowed fetch-health aggregation with a watermark:
                         per (window, host) fetch counts / error rates over a
                         stream of fetch-result events, tolerating late data.

Both run on any streaming source with the right schema; tests drive them with
the file source + ``processAllAvailable`` (no network, deterministic).

``sessionize_events`` / ``windowed_event_counts`` are the batch forms of the
stateful/windowed ops (same semantics, lag-window state instead of a state
store) — shared by the driver-contract queries and oracle-checked there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .frontier import Frontier

URL_FEED_SCHEMA = "url string"
FETCH_EVENT_SCHEMA = "ts timestamp, url string, host string, status int, bytes long"


def stream_schedule_urls(
    spark: SparkSession,
    frontier: Frontier,
    feed_dir: str,
    checkpoint_dir: str,
    wave: int = 0,
):
    """Continuously merge a URL feed directory into the frontier.

    Each micro-batch goes through ``Frontier.schedule`` — Bloom prefilter,
    exact anti-join, partition-pruned snapshot commit — so a URL seen by any
    prior wave or batch is dropped exactly like in batch mode. The streaming
    checkpoint records the source offsets; replaying a failed micro-batch
    re-runs an idempotent dedup-merge (duplicates are dropped), giving
    effectively-once frontier inserts.
    """
    feed = (
        spark.readStream.schema(URL_FEED_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .text(feed_dir)  # schema names the single text column 'url'
        .filter(F.col("url").rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"))
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        frontier.schedule(batch_df, wave=wave, properties={"stream_batch": batch_id})

    return (
        feed.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def sessionize_events(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    digits: int = 3,
) -> DataFrame:
    """Gap-based sessionization, batch form of the stateful streaming op
    (applyInPandasWithState would carry the same per-user last-seen state;
    in batch the state is a lag window). A session breaks after ``gap_s``
    seconds of per-user inactivity.

    Output: (user_id, session_id, n_events, t_start, t_end) — session_id is
    the running count of session breaks per user (int64).

    Scale shape: one shuffle on user_id; both windows and the final groupBy
    share that partitioning, so Catalyst plans a single exchange.
    """
    from pyspark.sql.window import Window

    e = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("timestamp").cast("double").alias("ts_s"),
        F.col(id_col).alias("event_id"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    gap = F.col("ts_s") - F.lag("ts_s").over(w)
    flagged = e.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.min("ts_s"), digits).alias("t_start"),
        F.round(F.max("ts_s"), digits).alias("t_end"),
    )


def stream_sessionize_events(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    digits: int = 3,
) -> DataFrame:
    """Stateful STREAMING form of :func:`sessionize_events`
    (``applyInPandasWithState``) — same semantics, state-store state instead
    of a lag window.

    Emits, in UPDATE mode, the current row of every session a micro-batch
    touches (closed sessions get their final row in the batch that closes
    them; the open session is re-emitted as it grows). The LATEST emitted
    row per (user_id, session_id) therefore equals the batch operator's
    output row — the equivalence the tests assert against the oracle-checked
    batch op.

    Per-user state is ONE fixed-size tuple (open-session aggregate +
    last-seen timestamp): bounded no matter how long the stream runs — the
    scale property that makes this deployable on an endless crawl. Assumes
    per-user event-time order across micro-batches (sorted inside each
    batch); genuinely late events belong to the batch backfill path.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    user_type = events.schema[user_col].dataType
    out_schema = StructType(
        [
            StructField("user_id", user_type),
            StructField("session_id", LongType()),
            StructField("n_events", LongType()),
            StructField("t_start", DoubleType()),
            StructField("t_end", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("session_id", LongType()),
            StructField("n_events", LongType()),
            StructField("t_start", DoubleType()),
            StructField("t_end", DoubleType()),
            StructField("last_ts", DoubleType()),
        ]
    )

    def fn(key, pdfs, state):
        if state.exists:
            sid, n, t0, t1, last = state.get
        else:
            sid, n, t0, t1, last = 0, 0, 0.0, 0.0, None
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            return
        rows = rows.sort_values(["ts_s", "event_id"])
        out = []
        for ts in rows["ts_s"].astype(float):
            if last is not None and n and ts - last <= gap_s:
                n += 1
                t1 = ts
            else:
                if n:
                    # close the previous session with its final values
                    out.append((key[0], sid, n, t0, t1))
                sid += 1
                n = 1
                t0 = t1 = ts
            last = ts
        # current (still-open) session snapshot — superseded by a later
        # emission if it grows or closes
        out.append((key[0], sid, n, t0, t1))
        state.update((sid, n, t0, t1, last))
        yield pd.DataFrame(
            out, columns=["user_id", "session_id", "n_events", "t_start", "t_end"]
        )

    prepared = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("timestamp").cast("double").alias("ts_s"),
        F.col(id_col).alias("event_id"),
    )
    sessions = prepared.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
    # rounding happens JVM-side (F.round = HALF_UP) so the output is
    # bit-identical to the batch op / its DuckDB oracle — Python's round()
    # is banker's rounding and can differ at half-boundaries
    return sessions.select(
        "user_id", "session_id", "n_events",
        F.round("t_start", digits).alias("t_start"),
        F.round("t_end", digits).alias("t_end"),
    )


def windowed_event_counts(
    events: DataFrame,
    window_s: int = 3600,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    digits: int = 4,
) -> DataFrame:
    """Tumbling-window aggregation per event type — the batch form of the
    watermarked streaming agg in ``fetch_metrics_stream`` (same bucketing
    arithmetic; the watermark only bounds state, not results)."""
    bucket = (
        F.floor(F.col(ts_col).cast("timestamp").cast("double") / window_s) * window_s
    ).cast("long")
    return events.groupBy(bucket.alias("window_start"), F.col(type_col).alias("event_type")).agg(
        F.count("*").alias("n"),
        F.round(F.sum(value_col), digits).alias("sum_v"),
    )


def stream_windowed_event_counts(
    events: DataFrame,
    window_s: int = 3600,
    watermark_s: int = 7200,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    digits: int = 4,
) -> DataFrame:
    """Watermarked STREAMING form of ``windowed_event_counts`` — the same
    tumbling-window semantics over a streaming DataFrame. ``F.window``
    boundaries are epoch-aligned exactly like the batch op's
    floor(ts/window)*window arithmetic, so in update output mode the final
    emission per (window, type) equals the batch result row — the property
    the q_events_windowed_stream oracle relies on. The watermark bounds
    state (windows older than ``watermark_s`` behind the max event time are
    evicted), which is what keeps an endless crawl's metrics aggregation at
    O(active windows) memory instead of O(stream length)."""
    ts_t = F.col(ts_col).cast("timestamp")
    return (
        events.withColumn("_ts", ts_t)
        .withWatermark("_ts", f"{watermark_s} seconds")
        .groupBy(
            F.window("_ts", f"{window_s} seconds").alias("_w"),
            F.col(type_col).alias("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value_col), digits).alias("sum_v"),
        )
        .select(
            F.col("_w.start").cast("double").cast("long").alias("window_start"),
            "event_type",
            "n",
            "sum_v",
        )
    )


def stream_exact_dedup(
    docs: DataFrame,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact document dedup — the continuous form of
    ops.dedup.exact_dedup: md5 the content, keep the FIRST arrival of
    each digest via ``dropDuplicatesWithinWatermark``, so the dedup state
    store stays bounded by the watermark horizon instead of growing with
    the corpus (plain dropDuplicates state grows forever — a
    non-starter for a long-running ingest).

    The documented trade: a duplicate arriving AFTER its digest's state
    expired re-emits. Global exactness comes from layering — route the
    stream's output into the batch ``exact_dedup`` / frontier anti-join,
    exactly how the frontier composes its Bloom prefilter (fast,
    approximate, bounded) with the exact snapshot anti-join.

    The digest, not the text, is the dedup key: state entries and any
    shuffle carry 32 hex chars per doc regardless of document size."""
    return (
        docs.withWatermark(ts_col, watermark)
        .withColumn("digest", F.md5(F.coalesce(F.col(text_col), F.lit(""))))
        .dropDuplicatesWithinWatermark(["digest"])
    )


def fetch_metrics_stream(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window fetch metrics per host.

    ``events`` is a streaming DataFrame with FETCH_EVENT_SCHEMA. Late events
    within the watermark still land in their window; older ones are dropped —
    the state store stays bounded no matter how long the crawl runs.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "host")
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum(F.when(F.col("status") != 200, 1).otherwise(0)).alias("n_errors"),
            F.sum("bytes").alias("total_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_fetches",
            "n_errors",
            "total_bytes",
        )
    )


def stream_minhash_dedup(
    spark: SparkSession,
    catalog,
    feed_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    **index_params,
):
    """Continuous NEAR-dup dedup of a document feed against the persisted
    MinHash LSH index (ops.dedup.build_minhash_index) — the streaming form
    of incremental dedup: each micro-batch (a) queries its docs against
    the index AND itself (minhash_index_near_dups), (b) writes the
    SURVIVORS (docs with no match >= threshold) to ``out_dir`` as parquet,
    and (c) extends the index with exactly those survivors, so later
    batches dedupe against everything kept so far.

    Semantics trade, documented like stream_exact_dedup's: batch-internal
    near-dup groups keep their lowest id; cross-batch dups always lose to
    the already-indexed copy. Replays after failure re-run an idempotent
    query (the extend re-appends the same survivors under the same caps —
    bucket rows are deduped by the keep rule, so the index's candidate
    sets are unchanged).

    Feed files: JSON lines with (doc_id long, text string). The index must
    exist (build_minhash_index over the historical corpus) before the
    stream starts.
    """
    from .ops.dedup import extend_minhash_index, minhash_index_near_dups

    feed = (
        spark.readStream.schema(f"{id_col} long, {text_col} string")
        .option("maxFilesPerTrigger", 16)
        .json(feed_dir)
    )

    def dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.localCheckpoint(eager=True)
        matches = minhash_index_near_dups(
            catalog, batch_df, id_col=id_col, text_col=text_col,
            threshold=threshold, **index_params,
        )
        # index-side pairs: the increment doc loses to the indexed copy.
        # batch-side pairs come out (new_id < match_id): the HIGHER id is
        # the duplicate — the lowest id of a batch-internal group survives.
        dup_ids = (
            matches.filter(F.col("side") == "index")
            .select(F.col("new_id").alias(id_col))
            .unionByName(
                matches.filter(F.col("side") == "batch")
                .select(F.col("match_id").alias(id_col))
            )
            .distinct()
        )
        survivors = batch_df.join(dup_ids, id_col, "left_anti").localCheckpoint(eager=True)
        survivors.write.mode("append").parquet(out_dir)
        if not survivors.isEmpty():
            extend_minhash_index(
                catalog, survivors, id_col=id_col, text_col=text_col, **index_params
            )

    return (
        feed.writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
