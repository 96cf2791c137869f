"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark side is REAL and tested: schemas, partition-preserving batch
transforms, UDF signatures, batch shapes. The codec layer is STUBBED —
this sandbox has no PIL/ffmpeg/librosa — behind ``_HAVE_CODECS``: with
codecs installed the same call sites decode for real; without, a clearly
marked deterministic fake derives features from the byte content so the
distributed plumbing stays testable end-to-end.

Media rows come out of the crawl as spans (kind='media') plus fetched
binary bodies; ``media_table_from_documents`` lifts them into the typed
media table.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

try:  # pragma: no cover — not present in this sandbox
    from PIL import Image  # noqa: F401

    _HAVE_CODECS = True
except ImportError:
    _HAVE_CODECS = False

MEDIA_SCHEMA = (
    "media_id string, doc_id string, kind string, content_type string, "
    "data binary, n_bytes long"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id string, doc_id string, kind string, content_type string, "
    "n_bytes long, width int, height int, mean_luma double, decode_ok boolean"
)

FRAME_SAMPLE_SCHEMA = (
    "media_id string, frame_idx int, frame_no int, frame_ref string"
)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """documents (with spans) → one row per media span, binary payload from
    the fetched body (non-HTML fetches carry the object bytes as body)."""
    media = docs.select(
        F.col("doc_id"),
        F.col("url"),
        F.col("content_type"),
        F.col("status"),
        F.explode("spans").alias("span"),
    ).filter(F.col("span.kind") == "media")
    return media.select(
        F.md5(F.col("span.media_ref")).alias("media_id"),
        F.col("doc_id"),
        F.lit("image").alias("kind"),
        F.col("content_type"),
        F.encode(F.coalesce(F.col("span.media_ref"), F.lit("")), "utf-8").alias("data"),
        F.length(F.col("span.media_ref")).cast("long").alias("n_bytes"),
    )


def _fake_image_features(data: bytes) -> tuple[int, int, float]:
    """DETERMINISTIC FAKE (codec stub): width/height/luma derived from a
    digest of the bytes — stable across runs/machines, clearly not a real
    decode. Replaced by PIL when _HAVE_CODECS.

    md5 (not blake2b) so the derivation is reproducible in ANY engine with
    md5 + string ops — the driver correctness oracle recomputes it in SQL:
      width  = 64 + byte0, height = 64 + byte1,
      luma   = floor(bytes2..3 / 65535 * 1e6 + 0.5) / 1e6 (portable half-up).
    """
    d = hashlib.md5(data or b"").digest()
    width = 64 + d[0]
    height = 64 + d[1]
    luma = math.floor(int.from_bytes(d[2:4], "big") / 65535.0 * 1e6 + 0.5) / 1e6
    return width, height, luma


def decode_image_features(media: DataFrame) -> DataFrame:
    """Per-image features via mapInPandas — Arrow batches in, Arrow batches
    out, no per-row Python round trips. With codecs installed this is a real
    PIL decode; here it's the deterministic fake (decode_ok=False marks it)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if _HAVE_CODECS:  # pragma: no cover
                raise NotImplementedError(
                    "real decode path requires PIL; wire Image.open here"
                )
            feats = [_fake_image_features(bytes(b) if b is not None else b"") for b in pdf["data"]]
            out = pdf[["media_id", "doc_id", "kind", "content_type", "n_bytes"]].copy()
            out["width"] = np.array([f[0] for f in feats], dtype=np.int32)
            out["height"] = np.array([f[1] for f in feats], dtype=np.int32)
            out["mean_luma"] = [f[2] for f in feats]
            out["decode_ok"] = _HAVE_CODECS
            yield out

    return media.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning is pure metadata math (JVM-side); the pixel work would
    happen in the decode UDF. Keeping plan/act split means the shuffle-free
    metadata pass can filter 'already small enough' rows before any decode."""
    feats = decode_image_features(media)
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return feats.select(
        "media_id", "width", "height",
        F.round(scale, 4).alias("scale"),
        (F.col("width") * scale).cast("int").alias("out_width"),
        (F.col("height") * scale).cast("int").alias("out_height"),
    )


def media_caption_context(documents: DataFrame) -> DataFrame:
    """Interleaved text+media alignment: pair every media span with its
    nearest preceding and following TEXT spans — the caption-context pairs
    an image-text training pipeline consumes (alt-text mining, figure
    captioning). Link/resource spans between a media span and its prose
    neighbors are skipped: context is prose, not navigation.

    Scale shape: the spans array is already ordered by offset within each
    row, so this is pure higher-order array algebra (transform + filter +
    element_at) — whole-stage codegen, ZERO shuffle, no explode until the
    final explode of the per-document pair array. Worst case is
    O(media × spans) per row, bounded by document size, never by corpus
    size. Output: (doc_id, media_ref, offset, context_before, context_after)
    with nulls when no prose exists on that side.
    """
    pairs = F.transform(
        F.filter("spans", lambda s: s["kind"] == F.lit("media")),
        lambda m: F.struct(
            m["media_ref"].alias("media_ref"),
            m["offset"].alias("offset"),
            F.try_element_at(
                F.filter(
                    "spans",
                    lambda s: (s["kind"] == F.lit("text"))
                    & (s["offset"] < m["offset"]),
                ),
                F.lit(-1),
            )["text"].alias("context_before"),
            F.try_element_at(
                F.filter(
                    "spans",
                    lambda s: (s["kind"] == F.lit("text"))
                    & (s["offset"] > m["offset"]),
                ),
                F.lit(1),
            )["text"].alias("context_after"),
        ),
    )
    return documents.select(
        "doc_id", F.explode(pairs).alias("pair")
    ).select(
        "doc_id",
        F.col("pair.media_ref").alias("media_ref"),
        F.col("pair.offset").alias("offset"),
        F.col("pair.context_before").alias("context_before"),
        F.col("pair.context_after").alias("context_after"),
    )


def _span_token_cost(text):
    """Whitespace-token count of a text span (0 for null/blank) — the shared
    cost unit for interleaved packing/quality. Pure JVM split/size, and
    reproducible in the DuckDB oracle via regexp_split_to_array."""
    t = F.trim(text)
    return (
        F.when(text.isNull() | (F.length(t) == 0), F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("long")
    )


def pack_interleaved(
    documents: DataFrame,
    budget: int = 1024,
    media_cost: int = 64,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Pack one interleaved text+media document into fixed-token-budget
    training samples — the multimodal analog of ``ops.text.pack_sequences``
    at SPAN granularity: text spans cost their whitespace-token count,
    media spans a fixed ``media_cost`` placeholder (the patch-token budget
    a vision encoder consumes), link/resource spans are navigation and are
    dropped. Spans are atomic (never split) and order is preserved.

    Boundary rule — budget-ALIGNED, not greedy: a span belongs to sample
    ``floor(cum_tokens_before / budget)``, so sample k holds the spans whose
    preceding cumulative cost lies in [k·budget, (k+1)·budget). A span
    straddling the boundary stays whole and overflows its sample by at most
    its own cost; greedy first-fit (as in pack_sequences) is inherently
    sequential, while this rule is one window cumsum — pure JVM, no
    applyInPandas, and the DuckDB oracle replays it exactly.

    Returns one row per (document, sample): (id_col, seq_idx, n_spans,
    n_text, n_media, tokens, first_offset, last_offset).

    Scale shape: explode → window cumsum partitioned BY DOCUMENT (sort
    bounded by document length, never corpus size) → hash agg on
    (doc, seq_idx). Span text itself never shuffles — only its token count
    does (the projection drops text before the exchange)."""
    if budget < 1 or media_cost < 0:
        raise ValueError(f"need budget >= 1, media_cost >= 0; got {budget}, {media_cost}")
    s = F.col("_s")
    spans = documents.select(
        F.col(id_col).alias("_id"), F.explode(spans_col).alias("_s")
    ).filter(s["kind"].isin("text", "media"))
    costed = spans.select(
        "_id",
        s["kind"].alias("_kind"),
        s["offset"].alias("_off"),
        F.when(s["kind"] == "media", F.lit(media_cost).cast("long"))
        .otherwise(_span_token_cost(s["text"]))
        .alias("_cost"),
    )
    w = Window.partitionBy("_id").orderBy("_off")
    cum_before = F.coalesce(
        F.sum("_cost").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    binned = costed.withColumn("_seq", F.floor(cum_before / budget))
    return binned.groupBy("_id", "_seq").agg(
        F.count("*").alias("n_spans"),
        F.sum((F.col("_kind") == "text").cast("long")).alias("n_text"),
        F.sum((F.col("_kind") == "media").cast("long")).alias("n_media"),
        F.sum("_cost").alias("tokens"),
        F.min("_off").alias("first_offset"),
        F.max("_off").alias("last_offset"),
    ).select(
        F.col("_id").alias(id_col),
        F.col("_seq").alias("seq_idx"),
        "n_spans", "n_text", "n_media", "tokens", "first_offset", "last_offset",
    )


def media_asset_stats(
    documents: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """Media-asset dedup over interleaved documents: group the media spans
    of the whole corpus by ``media_ref`` — the fetch-once worklist (one
    fetch per distinct asset, owned by the smallest referencing document)
    plus the duplication profile (site logos/icons recur on every page; a
    crawler that refetches them per page wastes its politeness budget).

    Returns (media_ref, n_refs, n_docs, first_doc) — total occurrences,
    distinct referencing documents, canonical fetch owner.

    Scale shape: explode is a narrow map; the only shuffle is the hash agg
    keyed on the (short) media_ref string with map-side partial
    count/count-distinct — document text never leaves the scan."""
    s = F.col("_s")
    media = documents.select(
        F.col(id_col).alias("_id"), F.explode(spans_col).alias("_s")
    ).filter((s["kind"] == "media") & s["media_ref"].isNotNull())
    return (
        media.groupBy(s["media_ref"].alias("media_ref"))
        .agg(
            F.count("*").alias("n_refs"),
            F.countDistinct("_id").alias("n_docs"),
            F.min("_id").alias("first_doc"),
        )
    )


def interleaved_quality(
    documents: DataFrame,
    min_text_tokens: int = 50,
    max_media_ratio: float = 0.5,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Document-level quality gate for interleaved text+media docs — the
    multimodal-curation twin of ops.text.quality_score: per document, span
    mix counts, total prose tokens, and the media fraction, with a keep
    flag (enough prose AND not media-dominated — pages that are all images
    or all navigation train nothing).

    ``media_ratio`` is quantized to parts-per-million with integer
    arithmetic (``media_ppm = floor(n_media·10⁶ / (n_text+n_media))``) so
    the keep decision is bit-portable to the DuckDB oracle — same
    convention as the sampling ops' p_ppm.

    Scale shape: ZERO shuffle — every statistic is higher-order array
    algebra (filter/size/aggregate) over the spans column inside one
    whole-stage-codegen projection; the gate composes with any downstream
    op as a pushdown-transparent narrow filter."""
    if min_text_tokens < 0 or not 0 <= max_media_ratio <= 1:
        raise ValueError(
            f"need min_text_tokens >= 0 and 0 <= max_media_ratio <= 1; "
            f"got {min_text_tokens}, {max_media_ratio}"
        )
    max_ppm = int(max_media_ratio * 1_000_000)
    spans = F.col(spans_col)

    def _n(kind: str):
        return F.size(F.filter(spans, lambda s: s["kind"] == F.lit(kind))).cast("long")

    text_tokens = F.aggregate(
        F.filter(spans, lambda s: s["kind"] == F.lit("text")),
        F.lit(0).cast("long"),
        lambda acc, s: acc + _span_token_cost(s["text"]),
    )
    n_text, n_media, n_link = _n("text"), _n("media"), _n("link")
    media_ppm = F.when(n_text + n_media == 0, F.lit(0).cast("long")).otherwise(
        F.floor(n_media * F.lit(1_000_000) / (n_text + n_media))
    )
    return documents.select(
        F.col(id_col).alias(id_col),
        n_text.alias("n_text"),
        n_media.alias("n_media"),
        n_link.alias("n_link"),
        text_tokens.alias("text_tokens"),
        media_ppm.alias("media_ppm"),
        (
            (text_tokens >= F.lit(min_text_tokens))
            & (media_ppm <= F.lit(max_ppm))
        ).alias("keep"),
    )


#: Function words for the boilerplate stop-density rule — tiny on purpose
#: (jusText ships full per-language lists; callers pass their own for real
#: corpora). Must stay lowercase: the classifier lowercases tokens first.
BOILERPLATE_STOPWORDS = (
    "the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
    "on", "with", "as", "was", "at", "by", "this", "be", "are", "or",
)


def _span_content_flags(
    spans,
    stop_arr,
    min_tokens: int,
    min_stop_ppm: int,
):
    """Per-index (kind, n_tokens, stop_ppm, sandwiched, is_content) structs
    for every span in ``spans`` — the shared core of classify_spans and
    strip_boilerplate. Pure JVM: F.get neighbor probes + higher-order
    token algebra inside one projection."""

    def one(i):
        s = F.get(spans, i)
        txt = F.trim(F.coalesce(s["text"], F.lit("")))
        toks = F.filter(F.split(txt, r"\s+"), lambda t: F.length(t) > 0)
        n_tokens = F.size(toks).cast("long")
        n_stop = F.size(
            F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t)))
        ).cast("long")
        stop_ppm = F.when(n_tokens == 0, F.lit(0).cast("long")).otherwise(
            F.floor(n_stop * F.lit(1_000_000) / n_tokens)
        )
        is_link = lambda sp: F.coalesce(sp["kind"] == F.lit("link"), F.lit(False))  # noqa: E731
        sandwiched = is_link(F.get(spans, i - 1)) & is_link(F.get(spans, i + 1))
        is_content = (
            (s["kind"] == F.lit("text"))
            & (n_tokens >= F.lit(min_tokens))
            & (stop_ppm >= F.lit(min_stop_ppm))
            & ~sandwiched
        )
        return F.struct(
            s["kind"].alias("kind"),
            s["offset"].alias("offset"),
            n_tokens.alias("n_tokens"),
            stop_ppm.alias("stop_ppm"),
            sandwiched.alias("sandwiched"),
            is_content.alias("is_content"),
        )

    return F.transform(F.sequence(F.lit(0), F.size(spans) - 1), one)


def classify_spans(
    documents: DataFrame,
    stopwords: tuple[str, ...] = BOILERPLATE_STOPWORDS,
    min_tokens: int = 4,
    min_stop_ppm: int = 100_000,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Boilerplate classification of TEXT spans in interleaved documents —
    the jusText/readability-style content-extraction rule set, integerized
    so a DuckDB oracle reproduces every flag bit-for-bit:

      * token floor: a span with < ``min_tokens`` whitespace tokens is
        boilerplate (nav labels, buttons, copyright lines);
      * stop density: ``stop_ppm = floor(n_stopwords·10⁶ / n_tokens)``
        below ``min_stop_ppm`` marks keyword-list/menu text — real prose
        carries function words (jusText's core signal);
      * link sandwich: a text span whose BOTH array neighbors are link
        spans is navigation chrome regardless of length (the interleaved-
        span analog of jusText's link-density rule — links are separate
        spans here, so adjacency IS the density signal).

    A span is content iff it passes all three. Returns one row per text
    span: (id_col, offset, n_tokens, stop_ppm, sandwiched, is_content).

    Scale shape: ZERO shuffle — neighbor probes are F.get on the spans
    array and every statistic is higher-order token algebra inside one
    codegen projection; the explode to span rows is narrow. Reference
    parity: the reference stores whole bodies and leaves content
    extraction to user extensions (`src/kermit/Extractor.coffee:11-18`
    exposes the selector hook); this op is the curation-pipeline pass a
    training-data user runs downstream."""
    if min_tokens < 0 or min_stop_ppm < 0:
        raise ValueError(
            f"need min_tokens >= 0 and min_stop_ppm >= 0; "
            f"got {min_tokens}, {min_stop_ppm}"
        )
    if not stopwords:
        raise ValueError("stopwords must be non-empty")
    stop_arr = F.array(*[F.lit(w) for w in stopwords])
    flags = _span_content_flags(
        F.col(spans_col), stop_arr, min_tokens, min_stop_ppm
    )
    return (
        documents.select(
            F.col(id_col).alias(id_col),
            F.explode(F.filter(flags, lambda x: x["kind"] == F.lit("text"))).alias("_s"),
        )
        .select(
            id_col,
            F.col("_s.offset").alias("offset"),
            F.col("_s.n_tokens").alias("n_tokens"),
            F.col("_s.stop_ppm").alias("stop_ppm"),
            F.col("_s.sandwiched").alias("sandwiched"),
            F.col("_s.is_content").alias("is_content"),
        )
    )


def strip_boilerplate(
    documents: DataFrame,
    stopwords: tuple[str, ...] = BOILERPLATE_STOPWORDS,
    min_tokens: int = 4,
    min_stop_ppm: int = 100_000,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Content extraction over interleaved documents: drop boilerplate TEXT
    spans (classify_spans rules) and LINK spans, keep content text and all
    media spans — the cleaned-document form the packing/quality ops want
    as input. Span order and offsets are preserved (offsets are document
    positions, not re-numbered). ZERO shuffle: one array filter aligned by
    index with the flags transform, all inside a single projection."""
    stop_arr = F.array(*[F.lit(w) for w in stopwords])
    spans = F.col(spans_col)
    flags = _span_content_flags(spans, stop_arr, min_tokens, min_stop_ppm)
    kept = F.filter(
        spans,
        lambda s, i: (s["kind"] == F.lit("media"))
        | F.get(flags, i)["is_content"],
    )
    others = [c for c in documents.columns if c != spans_col]
    return documents.select(*others, kept.alias(spans_col))


#: Placeholder token a media span contributes to the rendered training
#: string — the single-sentinel convention interleaved pretraining sets use
#: (the tokenizer maps it to the vision-encoder slot downstream).
MEDIA_SENTINEL = "<|image|>"


def render_interleaved(
    documents: DataFrame,
    sentinel: str = MEDIA_SENTINEL,
    sep: str = " ",
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Render an interleaved document to ONE training string — the last
    pipeline stage before tokenization, as in interleaved image-text
    pretraining corpora (OBELICS, Laurençon et al. 2023, public): text
    spans contribute their trimmed text, media spans the ``sentinel``
    placeholder, link spans and blank text spans drop; pieces join with
    ``sep`` in span order.

    Returns (id_col, rendered, n_text_tokens, n_media) — the token count
    covers text only (the sentinel's cost is model-dependent; see
    pack_interleaved's media_cost for budgeting).

    Scale shape: ZERO shuffle — one filter/transform/array_join chain plus
    a token-cost fold, all higher-order array algebra in a single codegen
    projection."""
    spans = F.col(spans_col)
    txt = lambda s: F.trim(F.coalesce(s["text"], F.lit("")))  # noqa: E731
    kept = F.filter(
        spans,
        lambda s: (s["kind"] == F.lit("media"))
        | ((s["kind"] == F.lit("text")) & (F.length(txt(s)) > 0)),
    )
    pieces = F.transform(
        kept,
        lambda s: F.when(s["kind"] == F.lit("media"), F.lit(sentinel)).otherwise(
            txt(s)
        ),
    )
    n_tokens = F.aggregate(
        F.filter(kept, lambda s: s["kind"] == F.lit("text")),
        F.lit(0).cast("long"),
        lambda acc, s: acc + _span_token_cost(s["text"]),
    )
    n_media = F.size(
        F.filter(kept, lambda s: s["kind"] == F.lit("media"))
    ).cast("long")
    return documents.select(
        F.col(id_col).alias(id_col),
        F.array_join(pieces, sep).alias("rendered"),
        n_tokens.alias("n_text_tokens"),
        n_media.alias("n_media"),
    )


def media_run_stats(
    documents: DataFrame,
    max_run: int = 3,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Consecutive-media (gallery) filter for interleaved documents — the
    OBELICS-style rule that drops image-gallery pages: long runs of media
    spans with no prose between them carry no alignment signal. Any
    non-media span (text, link) breaks a run.

    Returns (id_col, n_media, max_media_run, keep) with
    keep = max_media_run <= ``max_run``.

    Scale shape: ZERO shuffle — the run length is one left fold
    (F.aggregate with a (current, best) struct accumulator) over the spans
    array inside a single codegen projection."""
    if max_run < 0:
        raise ValueError(f"need max_run >= 0, got {max_run}")
    spans = F.col(spans_col)
    zero = F.lit(0).cast("long")
    acc0 = F.struct(zero.alias("cur"), zero.alias("best"))

    def step(acc, s):
        cur = F.when(s["kind"] == F.lit("media"), acc["cur"] + 1).otherwise(zero)
        return F.struct(cur.alias("cur"), F.greatest(acc["best"], cur).alias("best"))

    run = F.aggregate(spans, acc0, step, lambda a: a["best"])
    n_media = F.size(
        F.filter(spans, lambda s: s["kind"] == F.lit("media"))
    ).cast("long")
    return documents.select(
        F.col(id_col).alias(id_col),
        n_media.alias("n_media"),
        run.alias("max_media_run"),
        (run <= F.lit(max_run)).alias("keep"),
    )


def audio_segment_plan(
    media: DataFrame,
    window_ms: int = 30_000,
    hop_ms: int | None = None,
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Audio segmentation plan — the audio analog of ``frame_sample``:
    deterministic fixed-window segments (optionally overlapping via
    ``hop_ms`` < ``window_ms``, the ASR-pipeline convention) per media id
    from DURATION METADATA alone; decoding the samples of a segment is the
    stubbed codec step. Pure JVM (sequence + explode + least), so planning
    over billions of tracks is whole-stage codegen with zero Python.

    Segments start at 0, hop, 2·hop, …; each ends at min(start + window,
    duration). A segment is emitted only while it EXTENDS coverage — the
    first always, a later one iff its end exceeds the previous segment's
    end (start + window − hop < duration) — so a genuine short tail is
    kept (ASR wants the last words) but a window wholly contained in its
    predecessor is not. The condition is monotone in start, so seg_no
    stays a dense 0..k prefix. Tracks with duration ≤ 0 produce no rows.
    Output: (media_id, seg_no, start_ms, end_ms, seg_ref)."""
    hop = int(hop_ms if hop_ms is not None else window_ms)
    if hop <= 0 or window_ms <= 0:
        raise ValueError("window_ms and hop_ms must be positive")
    overlap = window_ms - hop
    dur = F.col(duration_col).cast("long")
    starts = F.when(
        dur > 0, F.sequence(F.lit(0).cast("long"), dur - 1, F.lit(hop).cast("long"))
    ).otherwise(F.array().cast("array<long>"))
    starts = F.filter(
        starts, lambda s: (s == 0) | (s + F.lit(overlap) < dur)
    )
    return media.select(
        "media_id",
        dur.alias("_dur"),
        F.posexplode(starts).alias("seg_no", "start_ms"),
    ).select(
        "media_id",
        F.col("seg_no").cast("int"),
        "start_ms",
        F.least(F.col("start_ms") + F.lit(window_ms), F.col("_dur")).alias("end_ms"),
        F.concat(
            F.col("media_id"), F.lit("#s"), F.col("seg_no").cast("string")
        ).alias("seg_ref"),
    )


def frame_sample(media: DataFrame, every_n: int = 10, max_frames: int = 5) -> DataFrame:
    """Video frame-sampling plan: deterministic frame indices per media id
    (the decode of those frames is the stubbed codec step). JVM-side:
    sequence + transform, exploded."""
    frames = F.slice(
        F.sequence(F.lit(0), F.lit(every_n * (max_frames - 1)), F.lit(every_n)),
        1,
        max_frames,
    )
    return media.select(
        "media_id",
        F.posexplode(frames).alias("frame_idx", "frame_no"),
    ).select(
        "media_id",
        F.col("frame_idx").cast("int"),
        F.col("frame_no").cast("int"),
        F.concat(F.col("media_id"), F.lit("#f"), F.col("frame_no").cast("string")).alias("frame_ref"),
    )


# ---------------------------------------------------------------------------
# magic-byte content sniffing (codec-free, pure JVM)
# ---------------------------------------------------------------------------

# THE canonical magic table: the sniff expression below AND the driver
# oracle's generated CASE both derive from these constants. Plain rules
# match a hex prefix at byte 1; first match wins (longer/more specific
# prefixes listed before shorter ones that share a stem).
MAGIC_PREFIXES: tuple[tuple[str, str], ...] = (
    ("89504E470D0A1A0A", "image/png"),
    ("474946383761", "image/gif"),
    ("474946383961", "image/gif"),
    ("377ABCAF271C", "application/x-7z-compressed"),
    ("FFD8FF", "image/jpeg"),
    ("25504446", "application/pdf"),
    ("504B0304", "application/zip"),
    ("504B0506", "application/zip"),
    ("504B0708", "application/zip"),
    ("4F676753", "application/ogg"),
    ("1A45DFA3", "video/webm"),
    ("494433", "audio/mpeg"),
    ("425A68", "application/x-bzip2"),
    ("1F8B", "application/gzip"),
    ("FFFB", "audio/mpeg"),
    ("FFF3", "audio/mpeg"),
    ("FFF2", "audio/mpeg"),
)
# RIFF containers: 'RIFF' at byte 1, the form tag at bytes 9-12 decides.
RIFF_FORMS: tuple[tuple[str, str], ...] = (
    ("57454250", "image/webp"),   # WEBP
    ("57415645", "audio/wav"),    # WAVE
    ("41564920", "video/x-msvideo"),  # 'AVI '
)
# ISO-BMFF: any size prefix, 'ftyp' at bytes 5-8.
FTYP_HEX = "66747970"
# markup sniff (HTML5 §'determining the character encoding' spirit): decoded,
# whitespace-trimmed, case-folded prefix of the first 32 bytes — gated on the
# prefix being pure ASCII (hex pairs 00-7F), because Spark 4's decode() throws
# on malformed UTF-8 rather than replacing; real markup leads with ASCII
HTML_SNIFF_BYTES = 32
ASCII_HEX_RE = "^([0-7][0-9A-F])*$"
HTML_SNIFF_PREFIXES: tuple[tuple[str, str], ...] = (
    ("<!doctype html", "text/html"),
    ("<html", "text/html"),
    ("<?xml", "application/xml"),
)


def sniff_mime(data: Column) -> Column:
    """Magic-byte content-type detection over an opaque binary column —
    the server-independent truth crawlers need (Content-Type headers lie;
    kermit trusts the header with an extension fallback,
    extensions/core.streaming.coffee:59 — sniffing the BYTES beats both).
    Pure JVM: one hex() of the first 16 bytes compared against the
    MAGIC_PREFIXES table, RIFF/ISO-BMFF container dispatch at their fixed
    offsets, and a decoded-prefix markup sniff. NULL = unknown (caller
    falls back to declared header / extension map). Zero shuffle, no
    Python, no decode of the payload body."""
    h = F.hex(F.substring(data, 1, 16))
    prefix = F.substring(data, 1, HTML_SNIFF_BYTES)
    # CASE branches evaluate lazily, so decode() never sees non-ASCII bytes
    text = F.when(
        F.hex(prefix).rlike(ASCII_HEX_RE),
        F.lower(F.regexp_replace(F.decode(prefix, "UTF-8"), r"^\s+", "")),
    )
    riff = F.substring(h, 17, 8)  # bytes 9-12
    expr: Column = F.lit(None).cast("string")
    # build the CASE back-to-front so earlier rules win
    for prefix, mime in reversed(HTML_SNIFF_PREFIXES):
        expr = F.when(text.startswith(prefix), F.lit(mime)).otherwise(expr)
    expr = F.when(F.substring(h, 9, 8) == FTYP_HEX, F.lit("video/mp4")).otherwise(expr)
    riff_expr: Column = F.lit(None).cast("string")
    for form_hex, mime in reversed(RIFF_FORMS):
        riff_expr = F.when(riff == form_hex, F.lit(mime)).otherwise(riff_expr)
    expr = F.when(F.substring(h, 1, 8) == "52494646", riff_expr).otherwise(expr)
    for prefix, mime in sorted(MAGIC_PREFIXES, key=lambda r: len(r[0])):
        expr = F.when(F.substring(h, 1, len(prefix)) == prefix, F.lit(mime)).otherwise(
            expr
        )
    return expr


def detect_content_type(
    df: DataFrame,
    bytes_col: str = "data",
    declared_col: str = "content_type",
) -> DataFrame:
    """Adds ``sniffed_type`` (magic bytes; NULL = unknown), ``effective_type``
    (sniffed, else the declared header value — the column downstream routing
    should trust) and ``type_mismatch`` (both present and disagreeing — the
    lying-server signal worth a metrics counter). One codegen projection."""
    sniffed = sniff_mime(F.col(bytes_col))
    declared = F.lower(F.trim(F.split(F.col(declared_col), ";").getItem(0)))
    return df.select(
        "*",
        sniffed.alias("sniffed_type"),
        F.coalesce(sniffed, declared).alias("effective_type"),
        (
            sniffed.isNotNull()
            & declared.isNotNull()
            & (sniffed != declared)
        ).alias("type_mismatch"),
    )


def chunk_signatures(
    media: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "data",
    n_chunks: int = 8,
) -> DataFrame:
    """Sectional content fingerprints for opaque media bytes: split each
    asset into ``n_chunks`` fixed-boundary sections and md5 each — the
    codec-free near-dup signature (a real pipeline would add a perceptual
    pHash after decode; section hashing is what works on undecoded bytes and
    is how binary-dedup systems fingerprint blobs). Pure JVM: substring on
    the binary column + md5, no Python, no decode.

    Output: one row per non-empty chunk (id_col, chunk_idx, chunk_md5).
    Chunk width = ceil(len/n); a short asset simply yields fewer chunks —
    trailing empty sections are dropped so universally-empty chunks can't
    form a junk join bucket."""
    w = f"CAST(ceil(length({bytes_col}) / {float(n_chunks)}) AS INT)"
    chunks = F.expr(
        f"transform(sequence(0, {n_chunks - 1}),"
        f" i -> substring({bytes_col}, 1 + i * {w}, {w}))"
    )
    return (
        media.filter(F.length(F.col(bytes_col)) > 0)
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "_c"))
        # filter AFTER the explode so chunk_idx stays the ORIGINAL section
        # index (filtering the array first would renumber trailing chunks)
        .filter(F.length("_c") > 0)
        .select(id_col, "chunk_idx", F.md5("_c").alias("chunk_md5"))
    )


def media_chunk_near_dups(
    media: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "data",
    n_chunks: int = 8,
    min_shared: int = 6,
    max_bucket: int = 50,
) -> DataFrame:
    """Near-duplicate media assets by shared content sections: two assets
    are near-dups when >= ``min_shared`` of their ``n_chunks`` sections hash
    identically — catches the dominant crawl cases (same image re-served
    with appended/patched metadata, byte-identical mirrors, single-section
    watermark stamps) without any codec.

    Scale shape mirrors the text dedup family (simhash_candidates): an
    exact-key band join on (chunk_idx, chunk_md5) — never all-pairs — with
    ``max_bucket`` capping pathological buckets (a blank-thumbnail section
    shared by millions of assets would otherwise explode quadratically;
    capped buckets keep the lowest ids as canonical representatives), then
    one hash-agg counting shared sections per candidate pair.

    Output: (a, b, shared) with a < b, shared >= min_shared."""
    from pyspark.sql.window import Window

    sigs = chunk_signatures(
        media, id_col=id_col, bytes_col=bytes_col, n_chunks=n_chunks
    )
    wcap = Window.partitionBy("chunk_idx", "chunk_md5").orderBy(id_col)
    sigs = (
        sigs.withColumn("_rn", F.row_number().over(wcap))
        .filter(F.col("_rn") <= max_bucket)
        .drop("_rn")
    )
    left = sigs.select("chunk_idx", "chunk_md5", F.col(id_col).alias("a"))
    right = sigs.select("chunk_idx", "chunk_md5", F.col(id_col).alias("b"))
    return (
        left.join(right, ["chunk_idx", "chunk_md5"])
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.countDistinct("chunk_idx").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def interleaved_span_dedup(
    documents: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Corpus-wide SPAN-level dedup over interleaved documents — the
    multimodal pipelines' (MMC4, OBELICS) step that document-level dedup
    can't do: the same boilerplate text block or the same image appears
    inside thousands of otherwise-distinct pages, and only its FIRST
    occurrence should survive into training data.

    Content identity per span kind: text spans by md5(text) (the hash,
    never the body, is the shuffle key), media spans by media_ref, link
    spans by (text, media_ref). The keeper is the globally first
    occurrence — lowest (doc_id, offset) — so the result is deterministic
    under any partitioning. Each document's surviving spans keep their
    relative order and are re-indexed to dense offsets 0..n-1 (the
    span-sequence contract expects gapless offsets).

    Scale shape: one hash-shuffle on the 16-byte content key for the
    first-occurrence window, one shuffle on doc_id to rebuild arrays —
    never the span bodies as join keys, no all-pairs anything. Documents
    whose spans are all duplicates come back with an empty spans array
    (drop or route them with a filter on n_spans_after).

    Returns (id_col, n_spans_before, n_spans_after, spans) with spans
    re-indexed.
    """
    ex = documents.select(
        F.col(id_col).alias("_doc"), F.posexplode(F.col(spans_col)).alias("_pos", "s")
    ).select(
        "_doc", "_pos", "s",
        F.when(F.col("s.kind") == "text",
               F.concat(F.lit("t:"), F.md5(F.coalesce(F.col("s.text"), F.lit("")))))
        .when(F.col("s.kind") == "media",
              F.concat(F.lit("m:"), F.coalesce(F.col("s.media_ref"), F.lit(""))))
        .otherwise(F.concat(
            F.col("s.kind"), F.lit(":"),
            F.coalesce(F.col("s.text"), F.lit("")), F.lit("|"),
            F.coalesce(F.col("s.media_ref"), F.lit("")),
        ))
        .alias("_key"),
    )
    w = Window.partitionBy("_key").orderBy("_doc", "_pos")
    kept = ex.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    rebuilt = (
        kept.groupBy("_doc")
        .agg(
            F.count(F.lit(1)).alias("n_spans_after"),
            F.sort_array(F.collect_list(F.struct("_pos", "s"))).alias("_ordered"),
        )
        .select(
            "_doc",
            "n_spans_after",
            F.expr(
                "transform(_ordered, (e, i) -> named_struct("
                "'kind', e.s.kind, 'text', e.s.text, "
                "'media_ref', e.s.media_ref, 'offset', CAST(i AS INT)))"
            ).alias("spans"),
        )
    )
    base = documents.select(
        F.col(id_col).alias("_doc"),
        F.size(F.col(spans_col)).cast("long").alias("n_spans_before"),
    )
    return (
        base.join(rebuilt, "_doc", "left")
        .select(
            F.col("_doc").alias(id_col),
            "n_spans_before",
            F.coalesce(F.col("n_spans_after"), F.lit(0)).cast("long").alias("n_spans_after"),
            F.coalesce(
                F.col("spans"),
                F.expr(
                    "CAST(array() AS array<struct<kind:string,text:string,"
                    "media_ref:string,offset:int>>)"
                ),
            ).alias("spans"),
        )
    )


# ---------------------------------------------------------------------------
# content-defined chunking (CDC) — insertion-robust binary near-dup
# ---------------------------------------------------------------------------

CDC_SIG_SCHEMA = "media_id string, chunk_idx int, chunk_md5 string, chunk_len int"

#: rolling-hash parameters: window K, base B, modulus P (prime < 2^31 so the
#: whole recurrence stays in exact int64 — portable across engines by
#: construction, unlike uint64 wraparound)
_CDC_K, _CDC_B, _CDC_P = 16, 1000003, 2147483647


def cdc_chunk_signatures(
    media: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "data",
    mask_bits: int = 6,
    min_chunk: int = 16,
    max_chunk: int = 1024,
) -> DataFrame:
    """CONTENT-DEFINED chunk fingerprints for opaque media bytes (Rabin-
    style CDC — LBFS, Muthitacharoen et al. SOSP'01; the dedup layout of
    every modern backup/dedup store): a K-byte polynomial rolling hash
    scans the payload and cuts a boundary wherever ``hash % 2^mask_bits
    == 2^mask_bits - 1`` (expected chunk ≈ 2^mask_bits bytes), bounded to
    [min_chunk, max_chunk] with forced cuts at max.

    Why it exists next to :func:`chunk_signatures`: fixed boundaries shift
    under ANY byte insertion/deletion — prepend 1 byte of metadata and all
    8 sections change, the near-dup is lost. CDC boundaries move WITH the
    content, so an insertion re-aligns within ~one chunk and every later
    chunk hash still matches. The join key is the chunk HASH alone (no
    index — indices shift by construction).

    Arrow-batched mapInPandas; the per-position hash is one vectorized
    numpy strided matmul per asset (the winnowing kernel of
    ops.text._winnow_batch on bytes), only the boundary walk is a short
    python loop over CANDIDATE cuts (≈ len/2^mask_bits per asset).
    Output: (media_id, chunk_idx, chunk_md5, chunk_len) — the id column is
    stringified and named media_id regardless of ``id_col`` (the Arrow
    schema is fixed); chunk_idx is ordinal (reassembly order), not a join
    key."""
    import hashlib

    mask = (1 << mask_bits) - 1
    K, B, P = _CDC_K, _CDC_B, _CDC_P

    def chunk(batches):
        powers = np.array(
            [pow(B, K - 1 - j, P) for j in range(K)], dtype=np.int64
        )
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                raw = r[bytes_col]
                if raw is None or len(raw) == 0:
                    continue
                data = np.frombuffer(bytes(raw), dtype=np.uint8)
                n = len(data)
                cuts = []
                if n >= K:
                    win = np.lib.stride_tricks.sliding_window_view(data, K).astype(np.int64)
                    hashes = (win * powers % P).sum(axis=1) % P
                    # candidate boundary AFTER position i+K (window end)
                    cand = (np.nonzero((hashes & mask) == mask)[0] + K).tolist()
                else:
                    cand = []
                last = 0
                ci = 0
                for pos in cand:
                    while pos - last > max_chunk:
                        cuts.append(last + max_chunk)
                        last += max_chunk
                    if pos - last >= min_chunk and pos < n:
                        cuts.append(pos)
                        last = pos
                while n - last > max_chunk:
                    cuts.append(last + max_chunk)
                    last += max_chunk
                bounds = [0] + cuts + [n]
                for ci, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
                    piece = data[lo:hi].tobytes()
                    rows.append(
                        (
                            r[id_col],
                            ci,
                            hashlib.md5(piece).hexdigest(),
                            hi - lo,
                        )
                    )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["media_id", "chunk_idx", "chunk_md5", "chunk_len"]
                )

    src = media.select(
        F.col(id_col).cast("string").alias(id_col), F.col(bytes_col)
    )
    return src.mapInPandas(chunk, CDC_SIG_SCHEMA)


def media_cdc_near_dups(
    media: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "data",
    mask_bits: int = 6,
    min_chunk: int = 16,
    max_chunk: int = 1024,
    min_shared: int = 4,
    max_bucket: int = 50,
) -> DataFrame:
    """Near-duplicate media by shared CONTENT-DEFINED chunks: pairs of
    assets sharing >= ``min_shared`` distinct chunk hashes — robust to
    byte insertion/deletion (appended EXIF, prepended header rewrites,
    spliced watermark bytes), the cases fixed-section
    media_chunk_near_dups misses by construction.

    Scale shape: equi-join on chunk_md5 ONLY (indices shift, so they stay
    out of the key), bucket-capped at ``max_bucket`` lowest ids (a chunk
    of zeros shared by millions of assets can never go quadratic), one
    hash-agg counting distinct shared hashes per pair. Output:
    (a, b, shared), a < b."""
    sigs = cdc_chunk_signatures(
        media, id_col=id_col, bytes_col=bytes_col,
        mask_bits=mask_bits, min_chunk=min_chunk, max_chunk=max_chunk,
    ).select(F.col("media_id").alias("_id"), "chunk_md5").distinct()
    wcap = Window.partitionBy("chunk_md5").orderBy("_id")
    sigs = (
        sigs.withColumn("_rn", F.row_number().over(wcap))
        .filter(F.col("_rn") <= max_bucket)
        .drop("_rn")
    )
    left = sigs.select("chunk_md5", F.col("_id").alias("a"))
    right = sigs.select("chunk_md5", F.col("_id").alias("b"))
    return (
        left.join(right, ["chunk_md5"])
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
