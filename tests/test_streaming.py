"""Structured Streaming surface: continuous frontier ingest (file-source
micro-batches through the batch dedup path) and watermarked fetch metrics."""

import os

import pytest
from pyspark.sql import functions as F

from kermit_spark.catalog import SnapshotCatalog
from kermit_spark.frontier import Frontier
from kermit_spark.streaming import (
    FETCH_EVENT_SCHEMA,
    fetch_metrics_stream,
    stream_schedule_urls,
)


def test_stream_schedule_dedups_across_batches(spark, tmp_path):
    frontier = Frontier(SnapshotCatalog(spark, str(tmp_path / "cat")), num_partitions=4)
    frontier.init(
        spark.createDataFrame([("http://a.test/seed",)], "url string")
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "f1.txt").write_text(
        "http://a.test/seed\nhttp://a.test/new1\nnot a url\nhttp://b.test/new2\n"
    )
    (feed / "f2.txt").write_text("http://a.test/new1\nhttp://c.test/new3\n")

    q = stream_schedule_urls(
        spark, frontier, str(feed), str(tmp_path / "ckpt"), wave=1
    )
    q.awaitTermination(120)

    urls = sorted(r["url"] for r in frontier.read().collect())
    assert urls == [
        "http://a.test/new1",
        "http://a.test/seed",
        "http://b.test/new2",
        "http://c.test/new3",
    ]


def test_fetch_metrics_windowed_with_watermark(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        "2024-01-01 10:00:05,http://a.test/1,a.test,200,100",
        "2024-01-01 10:00:40,http://a.test/2,a.test,404,0",
        "2024-01-01 10:01:10,http://b.test/1,b.test,200,300",
        "2024-01-01 10:00:50,http://a.test/3,a.test,200,50",  # late but in watermark
    ]
    (src / "e1.csv").write_text("\n".join(rows))
    events = (
        spark.readStream.schema(FETCH_EVENT_SCHEMA)
        .option("delimiter", ",")
        .csv(str(src))
    )
    out = fetch_metrics_stream(events, window="1 minute", watermark="2 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("fetch_metrics")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["host"]): (r["n_fetches"], r["n_errors"], r["total_bytes"])
        for r in spark.sql("select * from fetch_metrics").collect()
    }
    # append mode emits only windows fully below the final watermark;
    # the 10:00 window for a.test closes once the 10:01 event advances it...
    # with availableNow + finite input the final watermark is max(ts)-2min,
    # so no window is guaranteed closed — accept either closed-window output
    # or empty result, but if present it must be correct.
    for (ws, host), (n, e, b) in got.items():
        if host == "a.test" and ws.startswith("2024-01-01 10:00"):
            assert (n, e, b) == (3, 1, 150)


def test_stream_sessionize_matches_batch_op(spark, tmp_path):
    """applyInPandasWithState sessionize == the oracle-checked batch op:
    the latest emitted row per (user, session) across micro-batches equals
    the batch output — sessions continue across batch boundaries via the
    state store, and a gap closes them with final values."""
    import pandas as pd

    from kermit_spark.streaming import sessionize_events, stream_sessionize_events

    rows1 = [
        (1, "2024-01-01 10:00:00", 1),
        (1, "2024-01-01 10:10:00", 2),
        (2, "2024-01-01 10:00:00", 3),
    ]
    rows2 = [
        (1, "2024-01-01 11:30:00", 4),  # >30 min gap -> closes session 1
        (1, "2024-01-01 11:40:00", 5),
        (2, "2024-01-01 10:05:00", 6),  # continues across the batch boundary
        (3, "2024-01-01 12:00:00", 7),  # new user appears mid-stream
    ]
    src = tmp_path / "ev"
    src.mkdir()
    for i, rows in enumerate([rows1, rows2], 1):
        p = src / f"b{i}.csv"
        p.write_text("\n".join(f"{u},{ts},{e}" for u, ts, e in rows))
        os.utime(p, (1_000_000 + i, 1_000_000 + i))  # deterministic batch order

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    q = (
        stream_sessionize_events(stream, gap_s=1800)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_sess"))
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("select * from sess_stream").toPandas()
    latest = got.drop_duplicates(["user_id", "session_id"], keep="last")
    batch = sessionize_events(
        spark.createDataFrame(rows1 + rows2, "user_id long, ts string, event_id long"),
        gap_s=1800,
    ).toPandas()
    cols = ["user_id", "session_id", "n_events", "t_start", "t_end"]
    norm = {"session_id": "int64", "n_events": "int64"}
    a = latest[cols].sort_values(cols[:2]).reset_index(drop=True).astype(norm)
    b = batch[cols].sort_values(cols[:2]).reset_index(drop=True).astype(norm)
    pd.testing.assert_frame_equal(a, b)
    # four sessions total: user1 x2, user2 x1, user3 x1
    assert len(a) == 4


def test_fetch_metrics_batch_equivalence(spark):
    """The same aggregation over a static frame (sanity of the window expr)."""
    df = spark.createDataFrame(
        [
            ("2024-01-01 10:00:05", "http://a.test/1", "a.test", 200, 100),
            ("2024-01-01 10:00:40", "http://a.test/2", "a.test", 404, 0),
            ("2024-01-01 10:01:10", "http://b.test/1", "b.test", 200, 300),
        ],
        "ts string, url string, host string, status int, bytes long",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = (
        df.groupBy(F.window("ts", "1 minute").alias("w"), "host")
        .agg(F.count("*").alias("n"), F.sum("bytes").alias("b"))
        .collect()
    )
    got = {(str(r["w"]["start"]), r["host"]): (r["n"], r["b"]) for r in out}
    assert got[("2024-01-01 10:00:00", "a.test")] == (2, 100)
    assert got[("2024-01-01 10:01:00", "b.test")] == (1, 300)


def test_stream_windowed_counts_match_batch_op(spark, tmp_path):
    """stream_windowed_event_counts (watermarked F.window, update mode) ==
    windowed_event_counts (floor-bucket batch op): last emission per
    (window, type) across micro-batches equals the batch row, including a
    window that accumulates across the batch boundary; a late-but-within-
    watermark event still lands in its window."""
    import pandas as pd

    from kermit_spark.streaming import (
        stream_windowed_event_counts,
        windowed_event_counts,
    )

    rows1 = [
        ("fetch", "2024-01-01 10:05:00", 1.0),
        ("fetch", "2024-01-01 10:50:00", 2.0),
        ("parse", "2024-01-01 10:10:00", 3.0),
    ]
    rows2 = [
        ("fetch", "2024-01-01 11:10:00", 4.0),   # next window
        ("fetch", "2024-01-01 10:20:00", 8.0),   # late, within watermark
        ("parse", "2024-01-01 11:59:00", 5.0),
    ]
    src = tmp_path / "evw"
    src.mkdir()
    for i, rows in enumerate([rows1, rows2], 1):
        p = src / f"b{i}.csv"
        p.write_text("\n".join(f"{k},{ts},{v}" for k, ts, v in rows))
        os.utime(p, (1_000_000 + i, 1_000_000 + i))

    stream = (
        spark.readStream.schema("event_type string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    q = (
        stream_windowed_event_counts(stream, window_s=3600, watermark_s=7200)
        .writeStream.format("memory")
        .queryName("win_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_win"))
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("select * from win_stream").toPandas()
    latest = got.drop_duplicates(["window_start", "event_type"], keep="last")
    batch = windowed_event_counts(
        spark.createDataFrame(rows1 + rows2, "event_type string, ts string, value double"),
        window_s=3600,
    ).toPandas()
    cols = ["window_start", "event_type", "n", "sum_v"]
    a = latest[cols].sort_values(cols[:2]).reset_index(drop=True)
    b = batch[cols].sort_values(cols[:2]).reset_index(drop=True)
    a = a.astype({"window_start": "int64", "n": "int64"})
    b = b.astype({"window_start": "int64", "n": "int64"})
    pd.testing.assert_frame_equal(a, b)
    # the late event updated the 10:00 fetch window to n=3, sum 11.0
    ten = a[(a.event_type == "fetch") & (a.window_start == a.window_start.min())]
    assert int(ten["n"].iloc[0]) == 3 and float(ten["sum_v"].iloc[0]) == 11.0


def test_stream_exact_dedup_first_arrival_wins(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps one row per content digest
    across micro-batches (within the watermark horizon) — the streaming
    twin of ops.dedup.exact_dedup."""
    from kermit_spark.streaming import stream_exact_dedup

    rows1 = [
        (1, "2024-01-01 10:00:00", "alpha body"),
        (2, "2024-01-01 10:00:10", "beta body"),
        (3, "2024-01-01 10:00:20", "alpha body"),     # in-batch dup
    ]
    rows2 = [
        (4, "2024-01-01 10:01:00", "beta body"),      # cross-batch dup
        (5, "2024-01-01 10:01:10", "gamma body"),
        (6, "2024-01-01 10:01:20", None),             # null-safe digest
    ]
    src = tmp_path / "docs"
    src.mkdir()
    for i, rows in enumerate([rows1, rows2], 1):
        p = src / f"b{i}.csv"
        p.write_text("\n".join(f"{d},{ts},{t if t is not None else ''}" for d, ts, t in rows))
        os.utime(p, (2_000_000 + i, 2_000_000 + i))

    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    q = (
        stream_exact_dedup(stream, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_dedup"))
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("select doc_id, text from dedup_stream").collect()
    kept = sorted(r["doc_id"] for r in got)
    # first arrival of each distinct content survives; csv reads the empty
    # field back as null, whose digest is the empty-string digest
    assert kept == [1, 2, 5, 6]


def test_stream_minhash_dedup_against_persisted_index(spark, tmp_path):
    """Each micro-batch dedupes against the index AND itself; survivors
    extend the index so later batches lose to them. Exact near-dup
    (identical text) makes thresholds unambiguous."""
    import json as _json

    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.ops.dedup import build_minhash_index
    from kermit_spark.streaming import stream_minhash_dedup

    base = "the quick brown fox jumps over the lazy dog again and again "
    cat = SnapshotCatalog(spark, str(tmp_path / "idx"))
    corpus = spark.createDataFrame(
        [(1, base + "historic one"), (2, base + "historic two")],
        "doc_id long, text string",
    )
    params = dict(k=5, num_hashes=8, num_bands=2, stride=1, max_bucket=None)
    build_minhash_index(cat, corpus, id_col="doc_id", text_col="text", **params)

    feed = tmp_path / "feed"
    feed.mkdir()
    b1 = [
        {"doc_id": 10, "text": base + "historic one"},   # dup of indexed 1
        {"doc_id": 11, "text": base + "fresh one"},      # survivor
        {"doc_id": 12, "text": base + "fresh one"},      # in-batch dup of 11
    ]
    b2 = [
        {"doc_id": 20, "text": base + "fresh one"},      # dup of survivor 11
        {"doc_id": 21, "text": base + "entirely different trailing sentence with many words"},  # survivor
    ]
    for i, rows in enumerate([b1, b2], 1):
        p = feed / f"b{i}.json"
        p.write_text("\n".join(_json.dumps(r) for r in rows))
        os.utime(p, (3_000_000 + i, 3_000_000 + i))

    out = str(tmp_path / "out")
    q = stream_minhash_dedup(
        spark, cat, str(feed), str(tmp_path / "ck"), out,
        threshold=0.9, **params,
    )
    q.awaitTermination(120)
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [11, 21]
    # the index grew by exactly the survivors
    ids = {r["id"] for r in cat.read("mh_shingles").collect()}
    assert ids == {1, 2, 11, 21}
