"""Multimodal plumbing: media table lift, stubbed decode (deterministic
fake), resize planning, frame sampling — the Spark-side machinery is real
even though codecs are stubbed."""

import pytest
from pyspark.sql import functions as F

from kermit_spark.ops.media import (
    decode_image_features,
    frame_sample,
    media_table_from_documents,
    resize_plan,
)

SPANS_DDL = (
    "doc_id string, url string, content_type string, status int, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (
            "d1", "http://a.test/p.html", "text/html", 200,
            [
                ("text", "hello", None, 0),
                ("media", None, "http://a.test/img/1.png", 1),
                ("media", None, "http://a.test/img/2.png", 2),
            ],
        ),
        ("d2", "http://a.test/q.html", "text/html", 200, [("text", "x", None, 0)]),
    ]
    return spark.createDataFrame(rows, SPANS_DDL)


def test_media_table_lift(docs):
    media = media_table_from_documents(docs)
    rows = media.collect()
    assert len(rows) == 2  # only media spans of d1
    assert all(r["doc_id"] == "d1" for r in rows)
    assert all(r["data"] is not None and r["n_bytes"] > 0 for r in rows)
    assert len({r["media_id"] for r in rows}) == 2


def test_decode_features_deterministic_fake(docs):
    media = media_table_from_documents(docs)
    a = sorted((r["media_id"], r["width"], r["height"], r["mean_luma"]) for r in decode_image_features(media).collect())
    b = sorted((r["media_id"], r["width"], r["height"], r["mean_luma"]) for r in decode_image_features(media).collect())
    assert a == b
    for _, w, h, luma in a:
        assert 64 <= w < 320 and 64 <= h < 320
        assert 0.0 <= luma <= 1.0
    # stub clearly marked: decode_ok False without codecs
    assert all(r["decode_ok"] is False for r in decode_image_features(media).collect())


def test_resize_plan_bounds(docs):
    media = media_table_from_documents(docs)
    for r in resize_plan(media, max_side=100).collect():
        assert max(r["out_width"], r["out_height"]) <= 100
        assert 0 < r["scale"] <= 1.0


def test_frame_sample(docs):
    media = media_table_from_documents(docs)
    rows = frame_sample(media, every_n=10, max_frames=3).collect()
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2] for v in per.values())
    assert all("#f" in r["frame_ref"] for r in rows)


def test_media_caption_context_pairs_nearest_prose(spark):
    """Every media span pairs with the nearest preceding/following TEXT
    spans; link/resource spans in between are skipped; missing sides are
    null; documents without media contribute nothing."""
    from kermit_spark.ops.media import media_caption_context

    rows = [
        ("d1", [("text", "intro", None, 0), ("link", "nav", "/a", 1),
                ("media", None, "/i1.png", 2), ("resource", None, "/c.css", 3),
                ("text", "caption one", None, 4), ("media", None, "/i2.png", 5)]),
        ("d2", [("media", None, "/lead.png", 0), ("text", "after only", None, 1)]),
        ("d3", [("text", "no media here", None, 0)]),
        ("d4", []),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    got = {
        (r["doc_id"], r["media_ref"]): (r["context_before"], r["context_after"])
        for r in media_caption_context(df).collect()
    }
    assert got == {
        ("d1", "/i1.png"): ("intro", "caption one"),
        ("d1", "/i2.png"): ("caption one", None),
        ("d2", "/lead.png"): (None, "after only"),
    }


def test_media_caption_context_plan_has_no_shuffle(spark):
    """The pairing is per-row array algebra — the physical plan must contain
    no Exchange and no Python/pandas nodes."""
    from kermit_spark.ops.media import media_caption_context

    df = spark.createDataFrame(
        [("d", [("media", None, "/m", 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    plan = media_caption_context(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_audio_segment_plan_windows_and_tail(spark):
    import pytest as _pytest

    from kermit_spark.ops.media import audio_segment_plan

    media = spark.createDataFrame(
        [("a", 70_000), ("b", 30_000), ("c", 0), ("d", 5_000)],
        "media_id string, duration_ms long",
    )
    rows = sorted(
        (r["media_id"], r["seg_no"], r["start_ms"], r["end_ms"], r["seg_ref"])
        for r in audio_segment_plan(media, window_ms=30_000, hop_ms=20_000).collect()
    )
    assert rows == [
        # 70s track: 0-30, 20-50, 40-70; the would-be 60-70 window is
        # wholly inside 40-70 and is NOT emitted
        ("a", 0, 0, 30_000, "a#s0"),
        ("a", 1, 20_000, 50_000, "a#s1"),
        ("a", 2, 40_000, 70_000, "a#s2"),
        # exactly one window (no redundant contained tail)
        ("b", 0, 0, 30_000, "b#s0"),
        # zero duration -> no rows; 5s track: one clamped segment
        ("d", 0, 0, 5_000, "d#s0"),
    ]
    # a genuine tail that extends coverage IS kept: 75s track -> 60-75
    tail = audio_segment_plan(
        spark.createDataFrame([("e", 75_000)], "media_id string, duration_ms long"),
        window_ms=30_000, hop_ms=20_000,
    ).collect()
    assert [(r["seg_no"], r["start_ms"], r["end_ms"]) for r in sorted(tail, key=lambda r: r["seg_no"])] == [
        (0, 0, 30_000), (1, 20_000, 50_000), (2, 40_000, 70_000), (3, 60_000, 75_000)
    ]
    # non-overlapping default: hop == window
    n = audio_segment_plan(media, window_ms=30_000).count()
    assert n == 3 + 1 + 0 + 1  # a: 0/30/60, b: 0, d: 0
    with _pytest.raises(ValueError):
        audio_segment_plan(media, window_ms=0)


# ---------------------------------------------------------------------------
# interleaved spans: packing, asset dedup, quality gate
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def interleaved(spark):
    # doc i1: text(3 tok) media text(2) link media text(4) — pack/quality mix
    # doc i2: all navigation (no prose, no media)
    # doc i3: media-only
    rows = [
        (
            "i1", "u1", "text/html", 200,
            [
                ("text", "one two three", None, 0),
                ("media", None, "/img/logo.png", 1),
                ("text", "four five", None, 2),
                ("link", "next", "/n/2", 3),
                ("media", None, "/img/fig1.png", 4),
                ("text", "a b c d", None, 5),
            ],
        ),
        ("i2", "u2", "text/html", 200, [("link", "home", "/", 0)]),
        (
            "i3", "u3", "text/html", 200,
            [("media", None, "/img/logo.png", 0), ("media", None, "/img/logo.png", 1)],
        ),
    ]
    return spark.createDataFrame(rows, SPANS_DDL)


def test_pack_interleaved_boundary_rule(interleaved):
    from kermit_spark.ops.media import pack_interleaved

    # costs in offset order for i1: 3, 5(media), 2, [link dropped], 5, 4
    # cum_before: 0, 3, 8, 10, 15 → budget 8 → seq 0,0,1,1,1
    out = {
        (r["doc_id"], r["seq_idx"]): r
    for r in pack_interleaved(interleaved, budget=8, media_cost=5).collect()}
    s0, s1 = out[("i1", 0)], out[("i1", 1)]
    assert (s0["n_spans"], s0["n_text"], s0["n_media"], s0["tokens"]) == (2, 1, 1, 8)
    assert (s0["first_offset"], s0["last_offset"]) == (0, 1)
    assert (s1["n_spans"], s1["n_text"], s1["n_media"], s1["tokens"]) == (3, 2, 1, 11)
    assert (s1["first_offset"], s1["last_offset"]) == (2, 5)
    # i2 is navigation-only → no samples; i3 packs its two media spans
    assert not any(k[0] == "i2" for k in out)
    assert out[("i3", 0)]["n_media"] == 2 and out[("i3", 0)]["tokens"] == 10
    with pytest.raises(ValueError):
        pack_interleaved(interleaved, budget=0)


def test_pack_interleaved_partition_invariant(interleaved):
    from kermit_spark.ops.media import pack_interleaved

    a = sorted(map(tuple, pack_interleaved(interleaved.repartition(1), budget=8).collect()))
    b = sorted(map(tuple, pack_interleaved(interleaved.repartition(7), budget=8).collect()))
    assert a == b


def test_media_asset_stats_fetch_once(interleaved):
    from kermit_spark.ops.media import media_asset_stats

    out = {r["media_ref"]: r for r in media_asset_stats(interleaved).collect()}
    assert set(out) == {"/img/logo.png", "/img/fig1.png"}
    logo = out["/img/logo.png"]
    assert (logo["n_refs"], logo["n_docs"], logo["first_doc"]) == (3, 2, "i1")
    fig = out["/img/fig1.png"]
    assert (fig["n_refs"], fig["n_docs"], fig["first_doc"]) == (1, 1, "i1")


def test_interleaved_quality_gate(interleaved):
    from kermit_spark.ops.media import interleaved_quality

    out = {r["doc_id"]: r for r in interleaved_quality(
        interleaved, min_text_tokens=5, max_media_ratio=0.5).collect()}
    i1 = out["i1"]
    assert (i1["n_text"], i1["n_media"], i1["n_link"], i1["text_tokens"]) == (3, 2, 1, 9)
    assert i1["media_ppm"] == 400_000 and i1["keep"]
    # navigation-only: no prose, ratio 0 (empty denominator) → fails min tokens
    i2 = out["i2"]
    assert (i2["text_tokens"], i2["media_ppm"], i2["keep"]) == (0, 0, False)
    # media-only: ratio 1.0 → rejected on both gates
    i3 = out["i3"]
    assert i3["media_ppm"] == 1_000_000 and not i3["keep"]
    with pytest.raises(ValueError):
        interleaved_quality(interleaved, max_media_ratio=1.5)


def test_interleaved_quality_plan_has_no_shuffle(interleaved):
    from kermit_spark.ops.media import interleaved_quality

    plan = interleaved_quality(interleaved)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# boilerplate span classification / content extraction
# ---------------------------------------------------------------------------


@pytest.fixture
def navful(spark):
    # b1: nav block (link, short text, link) + prose + media + stopword-free
    #     keyword run + tiny span + null-text span
    rows = [
        (
            "b1", "u1", "text/html", 200,
            [
                ("link", "home", "/home", 0),
                ("text", "Menu Home About", None, 1),
                ("link", "about", "/about", 2),
                ("text", "the quick brown fox jumped over the lazy dog", None, 3),
                ("media", None, "/img/a.png", 4),
                ("text", "alpha beta gamma delta epsilon zeta", None, 5),
                ("text", "tiny", None, 6),
                ("text", None, None, 7),
            ],
        ),
        # b2: long sandwiched span with stopwords -> still boilerplate
        (
            "b2", "u2", "text/html", 200,
            [
                ("link", "prev", "/p", 0),
                ("text", "this is the big navigation bar of the site", None, 1),
                ("link", "next", "/n", 2),
            ],
        ),
    ]
    return spark.createDataFrame(rows, SPANS_DDL)


def test_classify_spans_rules(navful):
    from kermit_spark.ops.media import classify_spans

    out = {(r["doc_id"], r["offset"]): r for r in classify_spans(navful).collect()}
    # only text spans appear
    assert set(out) == {("b1", 1), ("b1", 3), ("b1", 5), ("b1", 6), ("b1", 7), ("b2", 1)}
    nav = out[("b1", 1)]
    assert nav["sandwiched"] and not nav["is_content"]
    prose = out[("b1", 3)]
    assert (prose["n_tokens"], prose["stop_ppm"]) == (9, 222_222)
    assert prose["is_content"] and not prose["sandwiched"]
    # stopword-free keyword run: long enough but zero stop density
    assert not out[("b1", 5)]["is_content"] and out[("b1", 5)]["n_tokens"] == 6
    assert not out[("b1", 6)]["is_content"]     # token floor
    assert out[("b1", 7)]["n_tokens"] == 0 and not out[("b1", 7)]["is_content"]
    # sandwich overrides length AND stop density
    b2 = out[("b2", 1)]
    assert b2["n_tokens"] == 9 and b2["stop_ppm"] > 100_000 and b2["sandwiched"]
    assert not b2["is_content"]


def test_classify_spans_validates_and_zero_shuffle(navful):
    from kermit_spark.ops.media import classify_spans

    with pytest.raises(ValueError):
        classify_spans(navful, stopwords=())
    with pytest.raises(ValueError):
        classify_spans(navful, min_tokens=-1)
    plan = classify_spans(navful)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_strip_boilerplate_keeps_content_and_media(navful):
    from kermit_spark.ops.media import strip_boilerplate

    out = {r["doc_id"]: r["spans"] for r in strip_boilerplate(navful).collect()}
    kept = [(s["kind"], s["offset"]) for s in out["b1"]]
    # content prose + media survive, in original order with original offsets
    assert kept == [("text", 3), ("media", 4)]
    assert out["b2"] == []
    plan = strip_boilerplate(navful)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_strip_boilerplate_partition_invariance(navful):
    from kermit_spark.ops.media import strip_boilerplate

    a = sorted((r["doc_id"], tuple(map(tuple, r["spans"])))
               for r in strip_boilerplate(navful.repartition(1)).collect())
    b = sorted((r["doc_id"], tuple(map(tuple, r["spans"])))
               for r in strip_boilerplate(navful.repartition(7)).collect())
    assert a == b


# ---------------------------------------------------------------------------
# interleaved rendering / gallery-run filter
# ---------------------------------------------------------------------------


@pytest.fixture
def gallery(spark):
    rows = [
        ("g1", "u1", "text/html", 200,
         [("text", " intro prose ", None, 0),
          ("media", None, "/a.png", 1),
          ("link", "next", "/n", 2),
          ("media", None, "/b.png", 3),
          ("media", None, "/c.png", 4),
          ("text", "", None, 5),           # blank text: dropped in render
          ("text", "tail", None, 6)]),
        ("g2", "u2", "text/html", 200,
         [("media", None, "/d.png", 0),
          ("media", None, "/e.png", 1),
          ("media", None, "/f.png", 2),
          ("media", None, "/g.png", 3)]),
        ("g3", "u3", "text/html", 200, [("text", "only words here", None, 0)]),
    ]
    return spark.createDataFrame(rows, SPANS_DDL)


def test_render_interleaved(gallery):
    from kermit_spark.ops.media import render_interleaved

    out = {r["doc_id"]: r for r in render_interleaved(gallery).collect()}
    g1 = out["g1"]
    # link and blank text dropped; text trimmed; media -> sentinel
    assert g1["rendered"] == "intro prose <|image|> <|image|> <|image|> tail"
    assert (g1["n_text_tokens"], g1["n_media"]) == (3, 3)
    assert out["g2"]["rendered"] == "<|image|> <|image|> <|image|> <|image|>"
    assert (out["g2"]["n_text_tokens"], out["g2"]["n_media"]) == (0, 4)
    assert out["g3"]["rendered"] == "only words here"
    plan = render_interleaved(gallery)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_media_run_stats(gallery):
    from kermit_spark.ops.media import media_run_stats

    out = {r["doc_id"]: r for r in media_run_stats(gallery, max_run=2).collect()}
    # g1: link breaks the first run; best run is the b/c pair
    assert (out["g1"]["max_media_run"], out["g1"]["n_media"]) == (2, 3)
    assert out["g1"]["keep"]
    assert (out["g2"]["max_media_run"], out["g2"]["keep"]) == (4, False)
    assert (out["g3"]["max_media_run"], out["g3"]["keep"]) == (0, True)
    with pytest.raises(ValueError):
        media_run_stats(gallery, max_run=-1)
    plan = media_run_stats(gallery)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_signatures_and_near_dups(spark):
    from kermit_spark.ops.media import chunk_signatures, media_chunk_near_dups

    # 8 sections of 4 bytes each; b differs from a in ONE section, c in all,
    # d is byte-identical to a, e is empty (dropped)
    def body(flip: dict[int, str]) -> bytes:
        return b"".join(
            (flip.get(i, f"s{i:02d}x")).encode() for i in range(8)
        )

    rows = [
        ("a", body({})),
        ("b", body({3: "ZZZZ"})),
        ("c", body({i: f"Q{i:02d}q" for i in range(8)})),
        ("d", body({})),
        ("e", b""),
    ]
    media = spark.createDataFrame(rows, "media_id string, data binary")

    sigs = chunk_signatures(media)
    per_id = {r[0]: r[1] for r in sigs.groupBy("media_id").count().collect()}
    assert per_id == {"a": 8, "b": 8, "c": 8, "d": 8}  # e dropped

    pairs = {
        (r["a"], r["b"]): r["shared"]
        for r in media_chunk_near_dups(media, min_shared=6).collect()
    }
    assert pairs[("a", "d")] == 8      # identical
    assert pairs[("a", "b")] == 7      # one flipped section
    assert pairs[("b", "d")] == 7
    assert ("a", "c") not in pairs     # disjoint content
    assert len(pairs) == 3


def test_chunk_near_dup_bucket_cap(spark):
    from pyspark.sql import functions as F
    from kermit_spark.ops.media import media_chunk_near_dups

    # 100 byte-identical assets: uncapped would be 4950 pairs; the cap
    # bounds the candidate bucket to max_bucket lowest ids
    media = spark.range(100).select(
        F.format_string("m%03d", F.col("id")).alias("media_id"),
        F.encode(F.lit("AAAABBBBCCCCDDDDEEEEFFFFGGGGHHHH"), "utf-8").alias("data"),
    )
    out = media_chunk_near_dups(media, min_shared=6, max_bucket=10).collect()
    assert len(out) == 45  # C(10,2) — only the 10 lowest ids pair up
    ids = {r["a"] for r in out} | {r["b"] for r in out}
    assert ids == {f"m{i:03d}" for i in range(10)}


def test_interleaved_span_dedup_first_occurrence_and_reindex(spark):
    from kermit_spark.ops.media import interleaved_span_dedup

    def t(text, off):
        return ("text", text, None, off)

    def m(ref, off):
        return ("media", None, ref, off)

    docs = spark.createDataFrame(
        [
            (1, [t("hello", 0), m("/img/a.png", 1), t("boiler", 2)]),
            # doc 2: repeats doc 1's image and boilerplate, adds fresh text
            (2, [t("boiler", 0), m("/img/a.png", 1), t("fresh", 2)]),
            # doc 3: everything duplicated -> empty spans
            (3, [t("boiler", 0), m("/img/a.png", 1)]),
            # doc 1-internal repeat: 'hello' twice -> second dropped
            (4, [t("hello", 0), t("hello", 1), m("/img/b.png", 2)]),
        ],
        "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = {r["doc_id"]: r for r in interleaved_span_dedup(docs).collect()}

    assert [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in out[1]["spans"]] == [
        ("text", "hello", None, 0), ("media", None, "/img/a.png", 1), ("text", "boiler", None, 2)
    ]
    assert [(s["text"], s["offset"]) for s in out[2]["spans"]] == [("fresh", 0)]
    assert out[3]["spans"] == [] and out[3]["n_spans_after"] == 0
    assert out[3]["n_spans_before"] == 2
    # within-doc repeat deduped, offsets re-densified
    assert [(s["kind"], s["offset"]) for s in out[4]["spans"]] == [("media", 0)] or \
           [(s["kind"], s["offset"]) for s in out[4]["spans"]] == []
    # doc 4's 'hello' lost to doc 1 (globally-first keeper), image kept
    assert out[4]["n_spans_after"] == 1
    assert out[4]["spans"][0]["media_ref"] == "/img/b.png"


# ---------------------------------------------------------------------------
# magic-byte content sniffing
# ---------------------------------------------------------------------------


def test_sniff_mime_magic_table(spark):
    from kermit_spark.ops.media import sniff_mime

    rows = [
        (1, bytes.fromhex("89504E470D0A1A0A") + b"rest", "image/png"),
        (2, bytes.fromhex("FFD8FFE0") + b"jf", "image/jpeg"),
        (3, b"GIF89a....", "image/gif"),
        (4, b"RIFF\x10\x00\x00\x00WEBPxxx", "image/webp"),
        (5, b"RIFF\x10\x00\x00\x00WAVExxx", "audio/wav"),
        (6, b"RIFF\x10\x00\x00\x00ZZZZxxx", None),  # unknown RIFF form
        (7, b"\x00\x00\x00\x18ftypisom", "video/mp4"),
        (8, b"%PDF-1.7 ...", "application/pdf"),
        (9, b"PK\x03\x04....", "application/zip"),
        (10, b"\x1f\x8bxxxx", "application/gzip"),
        (11, b"ID3\x04tag", "audio/mpeg"),
        (12, b"OggS\x00\x02", "application/ogg"),
        (13, b"\x1aE\xdf\xa3webm", "video/webm"),
        (14, b"  <!DOCTYPE html><p>hi", "text/html"),
        (15, b"<HTML><body>", "text/html"),        # case-folded
        (21, b"\n\t <!doctype html>", "text/html"),  # any leading whitespace
        (16, b"<?xml version='1.0'?>", "application/xml"),
        (17, b"random bytes \xff\xfe junk", None),  # non-ASCII: decode gated
        (18, b"plain ascii prose only here", None),
        (19, b"", None),
        (20, None, None),
    ]
    df = spark.createDataFrame([(i, d) for i, d, _ in rows], "id long, data binary")
    got = {
        r["id"]: r["m"]
        for r in df.select("id", sniff_mime(F.col("data")).alias("m")).collect()
    }
    for i, _, want in rows:
        assert got[i] == want, f"row {i}: {got[i]} != {want}"


def test_detect_content_type_mismatch_and_plan(spark):
    from kermit_spark.ops.media import detect_content_type

    df = spark.createDataFrame(
        [
            (1, bytes.fromhex("89504E470D0A1A0A") + b"x", "image/gif; charset=x"),
            (2, b"  <html>", None),                  # sniffed, nothing declared
            (3, b"\xff\xfejunk", "audio/mpeg"),      # unknown: falls back to header
            (4, b"\x1f\x8bz", "application/gzip"),   # agreement
        ],
        "id long, data binary, content_type string",
    )
    out = {r["id"]: r for r in detect_content_type(df).collect()}
    assert out[1]["sniffed_type"] == "image/png"
    assert out[1]["effective_type"] == "image/png" and out[1]["type_mismatch"]
    assert out[2]["effective_type"] == "text/html" and not out[2]["type_mismatch"]
    assert out[3]["sniffed_type"] is None
    assert out[3]["effective_type"] == "audio/mpeg" and not out[3]["type_mismatch"]
    assert out[4]["type_mismatch"] is False
    # one codegen projection: no shuffle, no Python
    plan = detect_content_type(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


# -- content-defined chunking ------------------------------------------------


def test_cdc_chunks_reassemble_and_bound(spark):
    import hashlib

    import numpy as np

    from kermit_spark.ops.media import cdc_chunk_signatures

    rng = np.random.default_rng(5)
    payload = rng.integers(0, 256, size=3000, dtype=np.uint8).tobytes()
    media = spark.createDataFrame([("m1", bytearray(payload))], "media_id string, data binary")
    rows = sorted(
        cdc_chunk_signatures(media, min_chunk=16, max_chunk=256).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # chunks tile the payload exactly, in order, within [min, max]
    assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
    assert sum(r["chunk_len"] for r in rows) == len(payload)
    assert all(r["chunk_len"] <= 256 for r in rows)
    assert all(r["chunk_len"] >= 16 for r in rows[:-1])  # tail may be short
    # hashes are the md5 of the actual slices
    pos = 0
    for r in rows:
        piece = payload[pos : pos + r["chunk_len"]]
        assert r["chunk_md5"] == hashlib.md5(piece).hexdigest()
        pos += r["chunk_len"]
    # deterministic across runs
    again = sorted(
        cdc_chunk_signatures(media, min_chunk=16, max_chunk=256).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]


def test_cdc_survives_insertion_where_fixed_chunks_fail(spark):
    """THE reason CDC exists: prepend 7 bytes to an asset and every fixed
    section shifts (fixed-boundary near-dup lost), while content-defined
    boundaries re-align within ~one chunk and the pair is still found."""
    import numpy as np

    from kermit_spark.ops.media import media_cdc_near_dups, media_chunk_near_dups

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=4000, dtype=np.uint8).tobytes()
    shifted = b"EXIFHDR" + base
    media = spark.createDataFrame(
        [("a0", bytearray(base)), ("a1", bytearray(shifted))],
        "media_id string, data binary",
    )
    fixed = media_chunk_near_dups(media, n_chunks=8, min_shared=6).collect()
    assert fixed == []  # every section boundary shifted -> no match
    cdc = media_cdc_near_dups(media, min_shared=4).collect()
    assert len(cdc) == 1 and cdc[0]["a"] == "a0" and cdc[0]["b"] == "a1"
    assert cdc[0]["shared"] >= 4


def test_cdc_bucket_cap_bounds_join(spark):
    import numpy as np

    from kermit_spark.ops.media import cdc_chunk_signatures, media_cdc_near_dups

    # 30 identical assets: capped buckets keep pair count at C(cap,2), not C(30,2)
    rng = np.random.default_rng(3)
    payload = bytearray(rng.integers(0, 256, size=2000, dtype=np.uint8).tobytes())
    media = spark.createDataFrame(
        [(f"m{i:02d}", payload) for i in range(30)], "media_id string, data binary"
    )
    pairs = media_cdc_near_dups(media, min_shared=4, max_bucket=5).collect()
    ids = {p for r in pairs for p in (r["a"], r["b"])}
    assert ids <= {f"m{i:02d}" for i in range(5)}  # lowest ids kept
    assert len(pairs) == 10  # C(5,2)
    # empty payloads contribute nothing
    empty = spark.createDataFrame([("e", bytearray(b""))], "media_id string, data binary")
    assert cdc_chunk_signatures(empty).collect() == []
