"""Text analysis for training-data pipelines — all JVM-side expressions
(regexp_count / higher-order array fns inside whole-stage codegen) except
winnowing, which is a vectorized numpy UDF.

  language-ID      stopword-hit heuristic across candidate languages
  quality scoring  length / alpha-ratio / stopword-ratio / punctuation
  token counting   word-regex tokens + a BPE-ish chars/4 estimate
  fingerprinting   portable min-shingle-hash fingerprint (oracle-checkable)
                   + true winnowing (rolling-hash window minima) in numpy
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from ..udf import session_safe_pandas_udf
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

# small, discriminative stopword sets (word-boundary regexes below).
# THE canonical marker constant: __spark_entry__ queries and their DuckDB
# oracles derive their regexes from this dict — keep the sets disjoint
# enough to be discriminative (no marker appears in two languages).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "that"],
    "de": ["der", "die", "und", "ist", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "es": ["el", "que", "los", "una", "es", "las"],
}


def _marker_count(text: Column, words: list[str]) -> Column:
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.regexp_count(text, F.lit(pat))


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: _marker_count(text, ws) for lang, ws in LANG_MARKERS.items()}


def detect_language(text: Column) -> Column:
    """argmax over marker counts; 'und' (undetermined) when all zero.
    Ties break in fixed lang order (en, de, fr, es) — deterministic:
    iterating forward with a strict '>' means a later language only
    displaces the incumbent when strictly higher, so the earliest
    language keeps ties."""
    scores = lang_scores(text)
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in LANG_MARKERS:
        s = scores[lang]
        cond = s > best_n
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, s).otherwise(best_n)
    return best


def token_count(text: Column) -> Column:
    """Word tokens by regex (the reference for quality ratios)."""
    return F.regexp_count(text, F.lit(r"[A-Za-z0-9]+"))


def bpe_token_estimate(text: Column) -> Column:
    """The usual chars/4 BPE estimate — cheap proxy for budget accounting."""
    return F.ceil(F.length(text) / F.lit(4.0)).cast("long")


def round_half_up(x: Column, digits: int = 4) -> Column:
    """Portable HALF_UP rounding: floor(x * 10^d + 0.5) / 10^d is
    bit-identical in any IEEE-double engine, unlike round() (HALF_UP in
    Spark vs banker's rounding elsewhere) — the property the DuckDB
    correctness oracles rely on."""
    scale = F.lit(float(10 ** digits))
    return F.floor(x * scale + F.lit(0.5)) / scale


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features + a composite score in [0, 1]:
    favors texts with healthy word length, some stopwords, low symbol
    noise — the standard crawl-corpus heuristics."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_alpha = F.regexp_count(t, F.lit(r"[A-Za-z]"))
    n_punct = F.regexp_count(t, F.lit(r"[.,;:!?]"))
    n_stop = _marker_count(t, LANG_MARKERS["en"])
    alpha_ratio = round_half_up(n_alpha / F.greatest(n_chars, F.lit(1)))
    stop_ratio = round_half_up(n_stop / F.greatest(n_tokens, F.lit(1)))
    punct_ratio = round_half_up(n_punct / F.greatest(n_chars, F.lit(1)))
    mean_word_len = round_half_up(n_alpha / F.greatest(n_tokens, F.lit(1)))
    score = round_half_up(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * F.lit(0.3)
        + alpha_ratio * F.lit(0.4)
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * F.lit(0.3)
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tokens.alias("q_tokens"),
        alpha_ratio.alias("q_alpha_ratio"),
        stop_ratio.alias("q_stop_ratio"),
        punct_ratio.alias("q_punct_ratio"),
        mean_word_len.alias("q_mean_word_len"),
        score.alias("q_score"),
    )


def domain_quality_rollup(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    low_threshold: float = 0.5,
    min_docs: int = 3,
    max_low_ppm: int = 500_000,
) -> DataFrame:
    """Domain-level quality aggregation — the RefinedWeb/C4-style rollup
    that blocks whole domains whose pages are mostly junk, instead of (or
    before) filtering page by page. The reference filters per-URL only
    (`src/kermit/Filters.coffee`); at 100 TB the domain rollup is what
    keeps a spam host from costing a billion per-page evaluations.

    Per ``group_col`` group: doc and token counts, the mean
    :func:`quality_features` composite score, and the fraction of docs
    scoring below ``low_threshold``. A group is ``blocked`` when it has at
    least ``min_docs`` docs AND its low-quality fraction reaches
    ``max_low_ppm`` (parts per million).

    All statistics are integerized before aggregating (score -> e4 units,
    ratios -> ppm) so sums are order-independent longs and the rollup is
    bit-reproducible on any engine — float sums would depend on partition
    order. One shuffle, on ``group_col``, with map-side partial
    aggregation; domains are tiny relative to docs, so the output is
    broadcast-able into :func:`filter_blocked_domains`."""
    if not 0.0 <= low_threshold <= 1.0:
        raise ValueError(f"need 0 <= low_threshold <= 1, got {low_threshold}")
    if min_docs < 1 or max_low_ppm < 0:
        raise ValueError(
            f"need min_docs >= 1 and max_low_ppm >= 0; got {min_docs}, {max_low_ppm}"
        )
    feats = quality_features(df, text_col)
    # q_score is round_half_up(.., 4): q_score*1e4 is integral up to 1 ulp,
    # so floor(x + 0.5) recovers the exact integer e4 representation
    score_e4 = F.floor(F.col("q_score") * F.lit(10_000.0) + F.lit(0.5)).cast("long")
    thr_e4 = int(low_threshold * 10_000)
    rolled = (
        feats.select(
            F.col(group_col),
            F.col("q_tokens").cast("long").alias("_tok"),
            score_e4.alias("_s4"),
        )
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("sum_tokens"),
            F.floor(F.sum("_s4") / F.count(F.lit(1))).cast("long").alias("avg_score_e4"),
            F.sum((F.col("_s4") < F.lit(thr_e4)).cast("long")).alias("n_low"),
        )
    )
    low_ppm = F.floor(F.col("n_low") * F.lit(1_000_000) / F.col("n_docs")).cast("long")
    return rolled.select(
        group_col,
        "n_docs",
        "sum_tokens",
        "avg_score_e4",
        "n_low",
        low_ppm.alias("low_ppm"),
        (
            (F.col("n_docs") >= F.lit(min_docs))
            & (low_ppm >= F.lit(max_low_ppm))
        ).alias("blocked"),
    )


def filter_blocked_domains(
    df: DataFrame, rollup: DataFrame, group_col: str = "source"
) -> DataFrame:
    """Drop every doc whose domain the :func:`domain_quality_rollup`
    blocked. Broadcast anti-join: the blocked-domain list is tiny, the
    corpus never shuffles."""
    blocked = rollup.filter(F.col("blocked")).select(group_col)
    return df.join(F.broadcast(blocked), group_col, "left_anti")


# Gopher document-shape rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", §A1.1 — public). The
# paper's 8 high-frequency English stopwords for the ≥2-stopwords rule:
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ngram: int = 2,
    dup_ngram: int = 5,
) -> DataFrame:
    """Gopher repetition + word-shape quality rules, fully engine-portable
    (every fraction is integer-arithmetic + one IEEE division, rounded
    half-up — a DuckDB oracle reproduces the output bit-for-bit).

    Word-shape rules are pure JVM array/regexp expressions. The repetition
    rules (duplicate lines, top-``top_ngram``-gram and duplicate-
    ``dup_ngram``-gram character fractions) need per-value occurrence
    counts, which are computed the scalable way: ONE explode of tagged
    (unit, value) tokens -> groupBy (doc, unit, value) -> per-doc
    conditional aggregation — shuffle keys are fine-grained, no O(len²)
    per-document work, no driver collection. Thresholds are the paper's:
    50 ≤ words ≤ 100k, 3 ≤ mean word length ≤ 10, symbol/word < 0.1,
    <90% bullet lines, <30% ellipsis lines, ≥80% alpha words, ≥2
    stopwords, dup-line ≤ 0.30, dup-line-chars ≤ 0.20, top-2-gram chars
    ≤ 0.20, dup-5-gram chars ≤ 0.15.

    Ties for the top n-gram resolve by (count, char-length, value) MAX —
    deterministic and identical under Spark struct-max and the oracle's
    ORDER BY ... DESC window."""
    did = F.col(id_col)
    words = F.expr("filter(split(_t, '\\\\s+'), w -> length(w) > 0)")
    lines = F.split(F.col("_t"), "\n")

    def grams(n: int) -> Column:
        return F.expr(
            f"case when size(_words) >= {n} then "
            f"transform(sequence(1, size(_words) - {n - 1}), "
            f"i -> concat_ws(' ', slice(_words, i, {n}))) "
            "else array() end"
        )

    n_words = F.size(F.col("_words"))
    base = (
        df.select(did, F.coalesce(F.col(text_col), F.lit("")).alias("_t"))
        .select(did, F.col("_t"), words.alias("_words"), lines.alias("_lines"))
        .select(
            did,
            F.length("_t").alias("n_chars"),
            n_words.alias("n_words"),
            F.size("_lines").alias("n_lines"),
            round_half_up(
                F.length(F.array_join("_words", "")) / F.greatest(n_words, F.lit(1))
            ).alias("mean_word_len"),
            round_half_up(
                F.size(F.expr("filter(_words, w -> w rlike '[A-Za-z]')"))
                / F.greatest(n_words, F.lit(1))
            ).alias("frac_alpha_words"),
            round_half_up(
                F.regexp_count("_t", F.lit(r"#|\.\.\.|…")) / F.greatest(n_words, F.lit(1))
            ).alias("symbol_ratio"),
            F.size(
                F.expr(
                    "filter(_words, w -> array_contains(array("
                    + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
                    + "), lower(w)))"
                )
            ).alias("stop_hits"),
            round_half_up(
                F.size(F.expr(r"filter(_lines, l -> l rlike '^\\s*[-*•]')"))
                / F.size("_lines")
            ).alias("frac_bullet_lines"),
            round_half_up(
                F.size(F.expr(r"filter(_lines, l -> l rlike '(\\.\\.\\.|…)\\s*$')"))
                / F.size("_lines")
            ).alias("frac_ellipsis_lines"),
            grams(top_ngram).alias("_gtop"),
            grams(dup_ngram).alias("_gdup"),
            F.col("_lines").alias("_lines"),
        )
    )
    tagged = base.select(
        did,
        F.explode(
            F.concat(
                F.expr("transform(_lines, v -> struct('line' as unit, v as value))"),
                F.expr("transform(_gtop, v -> struct('gtop' as unit, v as value))"),
                F.expr("transform(_gdup, v -> struct('gdup' as unit, v as value))"),
            )
        ).alias("u"),
    ).select(did, F.col("u.unit").alias("unit"), F.col("u.value").alias("value"))
    # count() only: a long buffer keeps this stage a HashAggregate (a
    # first(value) here would drag it to SortAggregate); vlen derives from
    # the group key afterwards for free
    counts = (
        tagged.groupBy(id_col, "unit", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("vlen", F.length("value"))
    )
    is_line, is_top, is_dup = (F.col("unit") == u for u in ("line", "gtop", "gdup"))
    rep = counts.groupBy(id_col).agg(
        F.sum(F.when(is_line, F.col("cnt")).otherwise(0)).alias("_lines_tot"),
        F.sum(F.when(is_line, 1).otherwise(0)).alias("_lines_distinct"),
        F.sum(
            F.when(is_line & (F.col("cnt") > 1), F.col("cnt") * F.col("vlen")).otherwise(0)
        ).alias("_dup_line_chars"),
        F.max(
            F.when(is_top, F.struct(F.col("cnt"), F.col("vlen"), F.col("value")))
        ).alias("_top"),
        F.sum(
            F.when(is_dup & (F.col("cnt") > 1), F.col("cnt") * F.col("vlen")).otherwise(0)
        ).alias("_dup_gram_chars"),
    )
    feats = (
        base.drop("_gtop", "_gdup", "_lines")
        .join(rep, id_col, "left")
        .select(
            "*",
            round_half_up(
                (F.col("_lines_tot") - F.col("_lines_distinct"))
                / F.greatest(F.col("_lines_tot"), F.lit(1))
            ).alias("dup_line_frac"),
            F.least(
                round_half_up(F.col("_dup_line_chars") / F.greatest("n_chars", F.lit(1))),
                F.lit(1.0),
            ).alias("dup_line_char_frac"),
            F.least(
                round_half_up(
                    F.coalesce(F.col("_top.cnt") * F.col("_top.vlen"), F.lit(0))
                    / F.greatest("n_chars", F.lit(1))
                ),
                F.lit(1.0),
            ).alias("top_ngram_char_frac"),
            F.least(
                round_half_up(F.col("_dup_gram_chars") / F.greatest("n_chars", F.lit(1))),
                F.lit(1.0),
            ).alias("dup_ngram_char_frac"),
        )
        .drop("_lines_tot", "_lines_distinct", "_dup_line_chars", "_top", "_dup_gram_chars")
    )
    passes = (
        F.col("n_words").between(50, 100_000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("frac_bullet_lines") < 0.9)
        & (F.col("frac_ellipsis_lines") < 0.3)
        & (F.col("frac_alpha_words") >= 0.8)
        & (F.col("stop_hits") >= 2)
        & (F.col("dup_line_frac") <= 0.3)
        & (F.col("dup_line_char_frac") <= 0.2)
        & (F.col("top_ngram_char_frac") <= 0.2)
        & (F.col("dup_ngram_char_frac") <= 0.15)
    )
    return feats.withColumn("gopher_pass", passes)


def gopher_filter(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep only documents passing all Gopher rules (the curation form).
    Original columns are preserved via a semi-join on the id (the features
    frame carries only the computed columns)."""
    keep = gopher_features(df, text_col, id_col).filter(F.col("gopher_pass")).select(id_col)
    return df.join(keep, id_col, "semi")


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into word-token windows of ``chunk_tokens`` with
    ``overlap`` tokens of context carried between consecutive chunks — the
    standard pre-training / RAG chunking step. Pure JVM (split + sequence +
    posexplode): map-side only, no shuffle, no Python.

    Chunk starts are 1, 1+step, 1+2*step, ... (step = chunk_tokens -
    overlap) up to the last index holding at least one token; docs with no
    tokens yield no rows, and a tail window of ≤ overlap tokens is dropped
    (it is entirely contained in its predecessor). Output: (doc_id,
    chunk_id, n_tokens, chunk)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    words = F.expr(
        f"filter(split(coalesce({text_col}, '')," + r" '\\s+'), w -> length(w) > 0)"
    )
    starts = F.expr(
        f"case when size(_words) > 0 then sequence(1, size(_words), {step}) "
        "else array() end"
    )
    return (
        df.select(F.col(id_col), words.alias("_words"))
        .select(F.col(id_col), F.col("_words"), F.posexplode(starts).alias("chunk_id", "_start"))
        .select(
            id_col,
            "chunk_id",
            F.least(
                F.lit(chunk_tokens), F.size("_words") - F.col("_start") + 1
            ).alias("n_tokens"),
            F.concat_ws(" ", F.slice("_words", F.col("_start"), chunk_tokens)).alias("chunk"),
        )
        .filter((F.col("chunk_id") == 0) | (F.col("n_tokens") > overlap))
    )


def corpus_vocabulary(
    df: DataFrame,
    top_k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    exclude: tuple[str, ...] = GOPHER_STOPWORDS,
) -> DataFrame:
    """Corpus-level vocabulary statistics: per-term total occurrences and
    document frequency (lowercased word tokens, stopwords excluded), as a
    deterministic top-k (tf DESC, term ASC). Explode → hash aggregate on
    the fine-grained term key → TakeOrdered top-k; the per-(doc, term)
    distinct for df_count is a partial-aggregated hash agg, never a global
    sort. Output: (term, tf, df_count)."""
    words = F.expr(
        f"filter(split(coalesce({text_col}, '')," + r" '\\s+'), w -> length(w) > 0)"
    )
    terms = (
        df.select(F.col(id_col).alias("_doc"), F.explode(words).alias("_w"))
        .select("_doc", F.lower(F.col("_w")).alias("term"))
        .filter(~F.col("term").isin(*exclude))
    )
    stats = terms.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct(F.col("_doc")).alias("df_count"),
    )
    return stats.orderBy(F.col("tf").desc(), F.col("term").asc()).limit(top_k)


def tfidf_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    round_digits: int = 4,
) -> DataFrame:
    """Per-(doc, term) TF-IDF scores over lowercased word tokens — the
    classic sparse text representation (feeds keyword extraction, BM25-ish
    ranking, linear quality classifiers).

    idf = ln((N + 1) / (df + 1)) + 1 (smoothed, sklearn-style);
    score = tf * idf, rounded half-up for engine portability. N (corpus
    size) rides the plan as a broadcast scalar subquery via a crossJoin of
    the one-row count — no driver round-trip, no collect. Shuffles on the
    fine-grained (doc, term) and term keys only; all hash aggregates.
    Output: (doc_id, term, tf, df_count, score)."""
    words = F.expr(
        f"filter(split(coalesce({text_col}, '')," + r" '\\s+'), w -> length(w) > 0)"
    )
    terms = (
        df.select(F.col(id_col), F.explode(words).alias("_w"))
        .select(id_col, F.lower(F.col("_w")).alias("term"))
    )
    doc_tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    term_df = doc_tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    if min_df > 1:
        term_df = term_df.filter(F.col("df_count") >= min_df)
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    scored = (
        doc_tf.join(term_df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df_count",
            round_half_up(
                F.col("tf")
                * (F.log((F.col("_n") + 1) / (F.col("df_count") + 1)) + F.lit(1.0)),
                round_digits,
            ).alias("score"),
        )
    )
    return scored


def bm25_rank(
    df: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """BM25 document ranking for a fixed bag of query terms (Robertson/
    Sparck Jones, public) — the lexical-retrieval complement to the ANN
    ops. idf = ln((N - df + 0.5)/(df + 0.5) + 1); per-term contribution
    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)); score = sum over matched
    query terms, rounded half-up.

    Corpus statistics (N, avgdl) ride the plan as a broadcast one-row
    aggregate; term df comes from one hash-agg over the (doc, term) pairs
    restricted to the query terms — work is proportional to documents
    CONTAINING a query term, not the corpus vocabulary. Deterministic
    top-k: (score DESC, doc id ASC). Output: (doc_id, rnk, score)."""
    terms_lit = [t.lower() for t in query_terms]
    words = F.expr(
        f"filter(split(coalesce({text_col}, '')," + r" '\\s+'), w -> length(w) > 0)"
    )
    base = df.select(
        F.col(id_col), words.alias("_words")
    ).select(F.col(id_col), F.col("_words"), F.size("_words").alias("dl"))
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("dl").alias("_avgdl")
    )
    hits = (
        base.select(F.col(id_col), "dl", F.explode("_words").alias("_w"))
        .select(F.col(id_col), "dl", F.lower(F.col("_w")).alias("term"))
        .filter(F.col("term").isin(*terms_lit))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    term_df = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    idf = F.log(
        (F.col("_n") - F.col("df_count") + 0.5) / (F.col("df_count") + 0.5) + 1.0
    )
    contrib = idf * (
        (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl")))
    )
    per_term = (
        hits.join(F.broadcast(term_df), "term")
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), "term", contrib.alias("_c"))
    )
    # per-doc score folds contributions IN TERM ORDER (sorted struct array,
    # left fold) — a plain sum()'s float addition order is partition-
    # dependent; the fold is bit-reproducible and mirrored by the oracle's
    # ORDER BY term list_reduce
    scored = per_term.groupBy(id_col).agg(
        round_half_up(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct(F.col("term"), F.col("_c")))),
                F.lit(0.0),
                lambda acc, x: acc + x["_c"],
            ),
            round_digits,
        ).alias("score")
    )
    # TakeOrdered top-k first (per-partition top-k + bounded merge), then
    # rank the k survivors — never a partitionless window over all docs
    topk = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        topk.withColumn("rnk", F.row_number().over(w))
        .select(id_col, "rnk", "score")
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """Corpus-unigram LM quality score: per-document average negative
    log-likelihood of its tokens under the corpus's own unigram
    distribution — the cheap stand-in for the KenLM-perplexity filters
    training-data pipelines run (CCNet-style: low NLL ≈ typical prose,
    high NLL ≈ gibberish/boilerplate-soup relative to the corpus).

      p(w)   = corpus_count(w) / total_tokens      (no smoothing needed:
               every scored token is in the corpus by construction)
      nll(d) = -(Σ tf_d(w) · ln p(w)) / dl(d)

    Determinism discipline as in bm25_rank: per-document contributions
    fold IN TERM ORDER over a sorted struct array (a plain float sum's
    association order is partition-dependent), total_tokens rides the
    plan as a broadcast one-row aggregate, and the result is rounded
    half-up — bit-identical to the DuckDB oracle. Scale shape: one
    hash-agg for the vocabulary, one for (doc, term) counts, one
    broadcast join vocabulary→doc-terms — all map-side-partial, nothing
    all-pairs. Empty documents score null.

    Output: (id_col, n_tokens, nll)."""
    words = F.expr(
        f"transform(filter(split(coalesce({text_col}, '')," + r" '\\s+'),"
        " w -> length(w) > 0), w -> lower(w))"
    )
    base = df.select(F.col(id_col), words.alias("_ws")).select(
        F.col(id_col), "_ws", F.size("_ws").alias("dl")
    )
    total = base.agg(F.sum("dl").cast("double").alias("_t"))
    exploded = base.select(F.col(id_col), F.explode("_ws").alias("term"))
    freq = exploded.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    doc_terms = exploded.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    contrib = (
        doc_terms.join(freq, "term")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            "term",
            (F.col("tf") * F.log(F.col("cf") / F.col("_t"))).alias("_c"),
        )
    )
    folded = contrib.groupBy(id_col).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("term"), F.col("_c")))),
            F.lit(0.0),
            lambda acc, x: acc + x["_c"],
        ).alias("_s")
    )
    return (
        base.join(folded, id_col, "left")
        .select(
            F.col(id_col),
            F.col("dl").alias("n_tokens"),
            F.when(
                F.col("dl") > 0,
                round_half_up(-F.col("_s") / F.col("dl"), round_digits),
            ).alias("nll"),
        )
    )


def bigram_backoff_logprob(
    df: DataFrame,
    lm: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    round_digits: int = 4,
) -> DataFrame:
    """Stupid Backoff bigram LM quality score (Brants et al. 2007, "Large
    Language Models in Machine Translation"): per document, the average
    negative log-score of each token given its predecessor under the LM
    corpus's bigram counts, backing off to the scaled unigram when the
    bigram is unseen:

      S(w | v) = count(v w) / count(v)          when count(v w) > 0
               = (alpha * count(w)) / N          otherwise
      nll2(d)  = -(Σ_{i>=2} ln S(w_i | w_{i-1})) / (dl - 1)

    ``lm`` is the corpus the counts come from (the CCNet pattern: score
    crawl text against a trusted reference corpus); when None the input
    scores against itself — then every bigram is self-seen and the measure
    reduces to in-corpus word-ORDER typicality. The bigram upgrade over
    :func:`unigram_logprob` is what separates fluent word order from a
    fluent bag of words — "the cat sat" and "sat the cat" share a unigram
    score but not this one. Stupid Backoff (vs Kneser-Ney) is the
    large-corpus choice on purpose: no discount tuning, counts only,
    embarrassingly aggregatable — the paper's point. Words the LM never
    saw floor at count 1 (OOV guard: keeps every ln finite, mirrored in
    the oracle).

    Determinism discipline as in unigram_logprob: integer counts feed ONE
    explicitly-parenthesized double expression per ln — cb/cv for the seen
    branch, (alpha * cw) / N for the backoff — per-document contributions
    fold IN BIGRAM-STRING ORDER over a sorted struct array, and the result
    is half-up rounded, so a DuckDB oracle is bit-identical. Scale shape:
    two hash-aggs over the LM corpus (bigram + unigram counts), one
    hash-agg of per-doc bigram tfs, equi-joins keyed on bigram/word —
    nothing all-pairs, no windows. Documents with fewer than 2 tokens
    score null. Output: (id_col, n_bigrams, nll2)."""
    words = F.expr(
        f"transform(filter(split(coalesce({text_col}, '')," + r" '\\s+'),"
        " w -> length(w) > 0), w -> lower(w))"
    )
    bigrams = F.expr(
        "case when size(_ws) >= 2 then transform(sequence(1, size(_ws) - 1),"
        " i -> concat(_ws[i - 1], ' ', _ws[i])) else array() end"
    )
    base = df.select(F.col(id_col), words.alias("_ws")).select(
        F.col(id_col), "_ws", F.size("_ws").alias("dl")
    )
    lm_base = (
        base
        if lm is None
        else lm.select(words.alias("_ws")).select(
            "_ws", F.size("_ws").alias("dl")
        )
    )
    total = lm_base.agg(F.sum("dl").cast("double").alias("_n"))
    uni = (
        lm_base.select(F.explode("_ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    bi = (
        lm_base.select(F.explode(bigrams).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    doc_bi = (
        base.select(F.col(id_col), F.explode(bigrams).alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    contrib = (
        doc_bi.withColumn("_v", F.expr("substring_index(bg, ' ', 1)"))
        .withColumn("_w", F.expr("substring_index(bg, ' ', -1)"))
        .join(bi, "bg", "left")
        .join(uni.select(F.col("w").alias("_v"), F.col("cw").alias("cv")), "_v", "left")
        .join(uni.select(F.col("w").alias("_w"), F.col("cw").alias("cw")), "_w", "left")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            "bg",
            (
                F.col("tf")
                * F.log(
                    F.when(
                        F.coalesce(F.col("cb"), F.lit(0)) > 0,
                        F.col("cb") / F.coalesce(F.col("cv"), F.lit(1)),
                    ).otherwise(
                        (F.lit(alpha) * F.coalesce(F.col("cw"), F.lit(1)))
                        / F.col("_n")
                    )
                )
            ).alias("_c"),
        )
    )
    folded = contrib.groupBy(id_col).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("bg"), F.col("_c")))),
            F.lit(0.0),
            lambda acc, x: acc + x["_c"],
        ).alias("_s")
    )
    return (
        base.join(folded, id_col, "left")
        .select(
            F.col(id_col),
            F.greatest(F.col("dl") - 1, F.lit(0)).alias("n_bigrams"),
            F.when(
                F.col("dl") >= 2,
                round_half_up(-F.col("_s") / (F.col("dl") - 1), round_digits),
            ).alias("nll2"),
        )
    )


def ccnet_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    document with the corpus-unigram NLL (`unigram_logprob` — the sandbox
    stand-in for CCNet's KenLM wiki-LM perplexity), compute the corpus's
    exact NLL terciles, and label each document head / middle / tail
    (head = most fluent third, the slice CCNet keeps for LM pretraining).
    The reference engine has no quality pipeline — this belongs to the
    LLM-training-data layer the brief adds on top of it.

    Scale shape: NO global sort and NO partitionless window — the two
    tercile cutpoints ride the plan as ONE broadcast one-row
    exact-percentile aggregate (Spark ``percentile``, a sort-based partial
    agg), and the bucket label is a broadcast-joined CASE over each row. At
    10^10 docs the cutpoints would come from ``percentile_approx`` on a
    sample (CCNet itself fixes thresholds from a sampled histogram); the
    exact percentile keeps the DuckDB oracle bit-comparable at test scale.

    Determinism: nll is half-up-rounded (inside unigram_logprob) BEFORE the
    percentile, both cutpoints are half-up-rounded too, and buckets compare
    rounded-to-rounded with <= — ties share a bucket independent of row
    order, and Spark's percentile interpolation (lower + frac*(higher-lower)
    at position p*(n-1)) matches DuckDB's quantile_cont bit-for-bit on the
    same rounded inputs. Output: (id_col, n_tokens, nll, bucket); empty
    documents get a NULL bucket."""
    scored = unigram_logprob(
        df, text_col=text_col, id_col=id_col, round_digits=round_digits
    )
    cuts = scored.filter(F.col("nll").isNotNull()).agg(
        round_half_up(
            F.expr("percentile(nll, 1.0d / 3.0d)"), round_digits
        ).alias("_c1"),
        round_half_up(
            F.expr("percentile(nll, 2.0d / 3.0d)"), round_digits
        ).alias("_c2"),
    )
    return scored.crossJoin(F.broadcast(cuts)).select(
        F.col(id_col),
        "n_tokens",
        "nll",
        F.when(F.col("nll").isNull(), F.lit(None).cast("string"))
        .when(F.col("nll") <= F.col("_c1"), F.lit("head"))
        .when(F.col("nll") <= F.col("_c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def dsir_logratio(
    df: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """DSIR-style importance weight (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per document, the average
    per-token log-likelihood RATIO between a target unigram LM (built from
    the rows where ``target_pred`` holds — the stand-in for the paper's
    trusted/high-quality seed corpus) and the raw LM (the whole input).
    Documents that look more like the target than like the bulk crawl get
    positive scores; selection = rank by score, keep the budget.

      p_t(w) = (target_count(w) + 1) / (target_tokens + V)   (add-one,
      p_r(w) = (raw_count(w)    + 1) / (raw_tokens    + V)    union vocab)
      score(d) = (Σ_w tf_d(w) · (ln p_t(w) − ln p_r(w))) / dl(d)

    Determinism discipline as in unigram_logprob: integer counts feed ONE
    double division per ln, contributions fold IN TERM ORDER, half-up
    rounding — bit-identical to the DuckDB oracle. Scale shape: two
    hash-aggs over the exploded tokens (term frequencies carry a
    target-partial via sum-of-flag, so ONE pass), a broadcast one-row
    totals aggregate, one broadcast-joinable vocab→doc-terms join —
    nothing all-pairs, no Python. Empty documents score null.

    Output: (id_col, n_tokens, is_target, logratio)."""
    words = F.expr(
        f"transform(filter(split(coalesce({text_col}, '')," + r" '\\s+'),"
        " w -> length(w) > 0), w -> lower(w))"
    )
    base = df.select(
        F.col(id_col), words.alias("_ws"), target_pred.alias("_tgt")
    ).select(F.col(id_col), "_ws", "_tgt", F.size("_ws").alias("dl"))
    totals = base.agg(
        F.sum("dl").alias("_tr"),
        F.sum(F.when(F.col("_tgt"), F.col("dl")).otherwise(F.lit(0))).alias("_tt"),
    )
    exploded = base.select(F.col(id_col), "_tgt", F.explode("_ws").alias("term"))
    freq = exploded.groupBy("term").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("_tgt"), F.lit(1)).otherwise(F.lit(0))).alias("ct"),
    )
    vocab = freq.agg(F.count(F.lit(1)).alias("_v"))
    doc_terms = exploded.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    contrib = (
        doc_terms.join(freq, "term")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            "term",
            (
                F.col("tf")
                * (
                    F.log((F.col("ct") + 1).cast("double") / (F.col("_tt") + F.col("_v")).cast("double"))
                    - F.log((F.col("cr") + 1).cast("double") / (F.col("_tr") + F.col("_v")).cast("double"))
                )
            ).alias("_c"),
        )
    )
    folded = contrib.groupBy(id_col).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("term"), F.col("_c")))),
            F.lit(0.0),
            lambda acc, x: acc + x["_c"],
        ).alias("_s")
    )
    return base.join(folded, id_col, "left").select(
        F.col(id_col),
        F.col("dl").alias("n_tokens"),
        F.col("_tgt").alias("is_target"),
        F.when(
            F.col("dl") > 0, round_half_up(F.col("_s") / F.col("dl"), round_digits)
        ).alias("logratio"),
    )


def dsir_select(
    df: DataFrame,
    target_pred: Column,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR selection: keep the ``k`` documents with the highest importance
    ratio under dsir_logratio (ties → smallest id — deterministic). The
    global top-k is a TakeOrdered (partial per partition, no full sort).
    Output: (rnk, id_col, n_tokens, is_target, logratio)."""
    scored = dsir_logratio(df, target_pred, text_col=text_col, id_col=id_col)
    w = Window.orderBy(F.col("logratio").desc_nulls_last(), F.col(id_col))
    topk = scored.orderBy(
        F.col("logratio").desc_nulls_last(), F.col(id_col)
    ).limit(k)
    return topk.withColumn("rnk", F.row_number().over(w)).select(
        "rnk", id_col, "n_tokens", "is_target", "logratio"
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 256,
    by: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy sequence packing — the pre-training batching step that fills
    fixed-size token budgets with whole documents. Within each ``by`` group
    (the packing shard — sources, or any sharding column), documents in
    ``id_col`` order are appended to the current bin; a document that would
    overflow ``max_tokens`` starts the next bin (an oversized document gets
    a bin of its own). Deterministic by construction.

    Packing is inherently sequential WITHIN a shard, so the scan runs as
    ``applyInPandas`` per group — one Arrow batch per shard, a tight loop
    over per-document token counts (counted JVM-side beforehand; Python
    never touches text). Shards are the parallelism unit at scale: 10⁵
    shards pack concurrently. Output: (by, id, n_tokens, bin_id)."""
    import pandas as pd

    words = F.expr(
        f"filter(split(coalesce({text_col}, '')," + r" '\\s+'), w -> length(w) > 0)"
    )
    base = df.select(
        F.col(by), F.col(id_col), F.size(words).cast("int").alias("n_tokens")
    )
    out_schema = StructType(
        list(base.schema.fields) + [StructField("bin_id", LongType(), False)]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins = np.zeros(len(pdf), dtype=np.int64)
        cur, tot = 0, 0
        for i, n in enumerate(pdf["n_tokens"].to_numpy()):
            if i == 0:
                tot = int(n)
            elif tot + int(n) <= max_tokens:
                tot += int(n)
            else:
                cur += 1
                tot = int(n)
            bins[i] = cur
        pdf["bin_id"] = bins
        return pdf

    return base.groupBy(by).applyInPandas(pack, out_schema)


# PII redaction — regex patterns restricted to the Java-regex ∩ RE2 common
# subset (no backreferences/lookaround) so Spark and the DuckDB oracle
# replace identically. Order matters and is fixed: email → IPv4 → long
# digit runs (card/account-ish) → phone.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (
        "ipv4",
        r"\b(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])){3}\b",
        "<IP>",
    ),
    ("idnum", r"\b[0-9]{13,19}\b", "<ID>"),
    ("phone", r"\+[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub common PII shapes from a text column, keeping per-kind match
    counts (counted on the text as each pattern sees it, i.e. after the
    preceding replacements). Pure JVM regexp codegen — no Python, no
    shuffle; scales as a map-only stage."""
    out = df
    cur = F.coalesce(F.col(text_col), F.lit(""))
    for kind, pat, repl in PII_PATTERNS:
        out = out.withColumn(f"n_{kind}", F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, repl)
    return out.withColumn(f"{text_col}_redacted", cur)


#: Soft-404 marker families. Each pattern is deliberately portable across
#: Java regex (Spark) and RE2 (DuckDB oracle): inline (?i), alternation and
#: optional groups only — no lookaround, no backreferences.
SOFT404_MARKERS = (
    ("notfound", r"(?i)(page|file|document) not found|error 404|404 (error|not found)"),
    ("gone", r"(?i)no longer (available|exists)|has been (removed|deleted|moved)"),
    ("missing", r"(?i)(does not|doesn.t) exist|could ?n.t find|nothing was found"),
    ("gohome", r"(?i)try searching|return to (the )?home ?page|back to (the )?home"),
)


def soft404_score(
    df: DataFrame,
    text_col: str = "text",
    threshold: int = 2,
) -> DataFrame:
    """Soft-404 detection: pages that answer HTTP 200 but are really error
    pages ("Page not found — return to homepage"). They poison both the
    crawl (their links are chrome, not content) and training data (they
    are near-identical boilerplate at enormous multiplicity). Heritrix and
    Common Crawl both post-filter these; the reference stores whatever the
    server sends (`src/kermit/extensions/ext.offline.coffee` keeps any
    FETCHED body).

    Per SOFT404_MARKERS family, counts occurrences in ``text_col``
    (null-safe); ``soft404_score`` is the total across families and
    ``is_soft404`` flags score >= ``threshold`` (default 2: one phrase
    alone — a page ABOUT 404 handling — shouldn't trip it). Combine with
    the http status column upstream if only 200-responses should be
    considered; the op itself is pure text.

    Scale shape: map-only regexp codegen, no Python, no shuffle — same
    cost model as redact_pii."""
    if threshold < 1:
        raise ValueError(f"need threshold >= 1, got {threshold}")
    cur = F.coalesce(F.col(text_col), F.lit(""))
    out = df
    score = F.lit(0)
    for kind, pat in SOFT404_MARKERS:
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(cur, F.lit(pat)).cast("long")
        )
        score = score + F.col(f"n_{kind}")
    return out.withColumn("soft404_score", score.cast("long")).withColumn(
        "is_soft404", F.col("soft404_score") >= F.lit(threshold)
    )


def dedupe_lines(
    df: DataFrame, text_col: str = "text", min_chars: int = 1
) -> DataFrame:
    """Within-document exact repeated-line removal — the classic crawl
    cleanup for per-page boilerplate (nav items, cookie banners, footers
    repeated inside one page). CCNet/RefinedWeb run the same pass before
    corpus-level dedup; the reference stores bodies verbatim
    (`src/kermit/extensions/ext.offline.coffee`) and leaves cleanup
    downstream — this is that downstream pass.

    Splits ``text_col`` on newlines and keeps a line iff it is the FIRST
    occurrence of that exact string in the document; lines shorter than
    ``min_chars`` (e.g. blank separators) are always kept. Adds
    ``{text_col}_deduped`` (kept lines re-joined with newlines, original
    order), ``n_lines`` and ``n_kept``.

    Scale shape: map-only — one higher-order array expression per row
    inside codegen, no Python, no shuffle. Per-row cost is O(lines²)
    string compares (array_position scan), fine for web pages; chunk
    pathological documents upstream."""
    if min_chars < 0:
        raise ValueError(f"need min_chars >= 0, got {min_chars}")
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), r"\n")
    kept = F.filter(
        lines,
        lambda x, i: (F.length(x) < F.lit(min_chars))
        | (F.array_position(lines, x) == i + F.lit(1)),
    )
    return df.select(
        "*",
        F.array_join(kept, "\n").alias(f"{text_col}_deduped"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
    )


# C4 cleaning constants (Raffel et al. 2020 §2.2, the C4 corpus heuristics).
# THE canonical constants: the __spark_entry__ oracle derives its SQL from
# these same values, so the rule set cannot drift between engine and oracle.
# Terminal-punctuation test: sentence-final . ! ? optionally followed by a
# closing quote (straight or curly) — Java regex ∩ RE2 (DuckDB) safe.
C4_TERMINAL_RE = "[.!?][\"'”’]?$"
# line-level drop: the paper removes any line with the word "javascript"
# (cookie/JS-required banners); substring match on the lowercased line.
C4_LINE_BLOCKWORD = "javascript"
# page-level drops: boilerplate filler and leaked code/templates.
C4_PAGE_BLOCK_SUBSTRINGS = ("lorem ipsum", "{")


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2 — the heuristics
    that turned Common Crawl into C4, the canonical LLM pretraining
    cleanup): keep only lines that read like prose sentences, then gate
    the page. The reference stores bodies verbatim
    (`src/kermit/extensions/ext.offline.coffee`); this is the downstream
    pass every text pipeline runs on the stored corpus.

    Line rules (applied to each newline-split, whitespace-trimmed line):
      * must end in terminal punctuation — ``C4_TERMINAL_RE`` (. ! ? with
        an optional closing quote), the paper's "terminal punctuation
        mark" rule;
      * must contain at least ``min_words_per_line`` whitespace words
        (paper: 5);
      * must not contain the word "javascript" (case-insensitive) —
        cookie/JS-required banner lines.
    Page rules (paper: drop the whole page):
      * any ``C4_PAGE_BLOCK_SUBSTRINGS`` hit in the lowercased original
        text ("lorem ipsum" filler, "{" leaked code/templates);
      * fewer than ``min_sentences`` sentences in the CLEANED text
        (sentence = terminal-punct occurrence; paper: 3).

    Adds ``{text_col}_clean`` (kept trimmed lines re-joined with
    newlines), ``n_lines``, ``n_kept_lines``, ``n_sentences``, one
    boolean per page rule and the aggregate ``c4_keep``. Rows are never
    dropped — compose with ``.filter("c4_keep")`` so curation stays
    inspectable (same contract as gopher_filter).

    Scale shape: map-only — split / higher-order filter / regexp inside
    one whole-stage-codegen projection, no Python, no shuffle; the
    corpus-level "three-sentence span dedup" half of C4 is the separate
    substring_dup_spans op (ops/dedup.py)."""
    if min_words_per_line < 1:
        raise ValueError(f"need min_words_per_line >= 1, got {min_words_per_line}")
    if min_sentences < 0:
        raise ValueError(f"need min_sentences >= 0, got {min_sentences}")
    raw = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.transform(F.split(raw, r"\n"), lambda x: F.trim(x))
    # sentence-terminal regex without the end anchor counts occurrences
    sent_re = C4_TERMINAL_RE[:-1]
    kept = F.filter(
        lines,
        lambda x: x.rlike(C4_TERMINAL_RE)
        & (
            F.size(F.filter(F.split(x, r"\s+"), lambda w: F.length(w) > 0))
            >= F.lit(min_words_per_line)
        )
        & ~F.lower(x).contains(C4_LINE_BLOCKWORD),
    )
    clean = F.array_join(kept, "\n")
    out = df.select(
        "*",
        clean.alias(f"{text_col}_clean"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        F.regexp_count(clean, F.lit(sent_re)).cast("long").alias("n_sentences"),
        *[
            F.lower(raw).contains(s).alias(f"has_block_{i}")
            for i, s in enumerate(C4_PAGE_BLOCK_SUBSTRINGS)
        ],
    )
    page_ok = F.col("n_sentences") >= F.lit(min_sentences)
    for i in range(len(C4_PAGE_BLOCK_SUBSTRINGS)):
        page_ok = page_ok & ~F.col(f"has_block_{i}")
    return out.withColumn("c4_keep", page_ok)


def min_shingle_fingerprint(text: Column, k: int = 8, n_mins: int = 4) -> Column:
    """Portable document fingerprint: the n smallest md5(shingle) digests,
    concatenated. Engine-independent (md5 + sort) — the oracle-checkable
    variant of winnowing."""
    sh = F.expr(
        f"transform(sequence(1, greatest(length({_c(text)}) - {k - 1}, 1)), "
        f"i -> md5(substring({_c(text)}, i, {k})))"
    )
    return F.concat_ws("", F.slice(F.array_sort(F.array_distinct(sh)), 1, n_mins))


def _c(col: Column) -> str:
    return col._jc.toString()


# ---------------------------------------------------------------------------
# winnowing (rolling hash) — numpy inside an Arrow batch
# ---------------------------------------------------------------------------


def _winnow_batch(texts: pd.Series) -> pd.Series:
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03): k-gram rolling
    hashes, window minima, rightmost-min rule; returns the distinct selected
    hashes per document. Fully vectorized per document via numpy strides."""
    K, W = 8, 4
    out = []
    for t in texts:
        if not t or len(t) < K:
            out.append([])
            continue
        data = np.frombuffer(str(t).encode("utf-8", "ignore"), dtype=np.uint8)
        n = len(data) - K + 1
        if n <= 0:
            out.append([])
            continue
        # polynomial rolling hash over uint64 via cumulative trick:
        # hash_i = sum(data[i+j] * B^(K-1-j)) computed with a strided matmul
        B = np.uint64(1000003)
        powers = np.array([B ** np.uint64(K - 1 - j) for j in range(K)], dtype=np.uint64)
        windows = np.lib.stride_tricks.sliding_window_view(data, K).astype(np.uint64)
        hashes = (windows * powers).sum(axis=1, dtype=np.uint64)
        if n <= W:
            out.append([int(hashes.min().astype(np.int64))])
            continue
        hw = np.lib.stride_tricks.sliding_window_view(hashes, W)
        # rightmost minimum per window (argmin on reversed view)
        rev_arg = W - 1 - np.argmin(hw[:, ::-1], axis=1)
        sel = hashes[rev_arg + np.arange(len(hw))]
        # reinterpret as signed int64 for the Arrow LongType column
        out.append(sorted(int(x) for x in np.unique(sel).astype(np.int64)))
    return pd.Series(out)


winnow_fingerprint = session_safe_pandas_udf(_winnow_batch, ArrayType(LongType()))


# ---------------------------------------------------------------------------
# unicode normalization — the canonical-form pass before any hashing/dedup
# ---------------------------------------------------------------------------


def _nfc_batch(texts: pd.Series) -> pd.Series:
    import unicodedata

    return texts.map(
        lambda t: unicodedata.normalize("NFC", t) if t is not None else None
    )


#: NFC-normalize a string column (Arrow-batched; Spark SQL has no built-in
#: unicode normalizer). DuckDB's nfc_normalize reproduces it exactly, so the
#: pass stays oracle-checkable.
nfc_normalize = session_safe_pandas_udf(_nfc_batch, StringType())

# control chars except \t \n \r — Java regex and RE2 read this class the
# same way, so the Spark expression and the DuckDB oracle share it verbatim
CTRL_CHARS_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
#: any whitespace run → one space (single-line canonical form)
WS_RUN_RE = r"[ \t\r\n]+"


def normalize_text(df: DataFrame, id_col: str = "id", text_col: str = "text") -> DataFrame:
    """Canonical text normalization — the pass that must run BEFORE any
    content hashing (exact dedup, minhash, fingerprints), because 'é' as
    U+00E9 and as 'e'+U+0301 are the same text to a reader but different
    bytes to md5: NFC-compose, strip non-printing control characters,
    collapse every whitespace run to a single space, trim.

    Returns (id_col, text, n_chars_raw, n_chars, changed) where ``text`` is
    the normalized form and ``changed`` flags rows the pass rewrote.

    Scale shape: NFC is the one step Spark SQL cannot express — it runs as
    an Arrow-batched pandas UDF (vectorized transfer, no per-row Python
    call overhead); the control-strip / whitespace-collapse / trim chain is
    pure-JVM regexp_replace in the same projection, and the whole pass is
    a stateless narrow map — no shuffle, pushdown-transparent."""
    raw = F.col(text_col)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(nfc_normalize(raw), CTRL_CHARS_RE, ""),
            WS_RUN_RE,
            " ",
        )
    )
    return df.select(
        F.col(id_col).alias(id_col),
        norm.alias("text"),
        F.length(raw).cast("long").alias("n_chars_raw"),
        F.length(norm).cast("long").alias("n_chars"),
        (norm != raw).alias("changed"),
    )


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The full text-analysis surface in one projection."""
    t = F.col(text_col)
    return quality_features(df, text_col).select(
        "*",
        detect_language(t).alias("lang_pred"),
        bpe_token_estimate(t).alias("bpe_tokens"),
        min_shingle_fingerprint(t).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# hashed linear classifier — apply an EXTERNAL model, fastText-style
# ---------------------------------------------------------------------------


def hashed_linear_score(
    df: DataFrame,
    weights_ppm: dict[int, int],
    n_buckets: int,
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained linear text classifier over hashed bag-of-words
    features (the fastText / Vowpal-Wabbit hashing trick) — the
    model-based quality-filter primitive (GPT-3/LLaMA-style "looks like
    reference corpus" classifiers): each token hashes to a bucket in
    [0, n_buckets); the document score is the sum of the buckets' weights.
    Training happens elsewhere; this op is the corpus-scale APPLY.

    ``weights_ppm`` maps bucket → integer weight in parts-per-million
    (quantize trained floats once at load time), so scores are exact
    integers — bit-reproducible across engines/partitionings and
    DuckDB-oracle-checkable, same convention as the samplers' p_ppm.
    Buckets absent from the dict weigh 0. Token hashing uses the portable
    48-bit md5 prefix every deterministic op here shares.

    Returns (id_col, n_tokens, score_ppm). Thresholding/keep policy is the
    caller's (scores mean nothing without the model's calibration).

    Scale shape: ZERO shuffle — tokenize/hash/lookup/sum is one
    higher-order aggregate over the split array inside a single codegen
    projection; the weight table rides the PLAN as a map literal (it is a
    model artifact, small by construction — hash dims are 10³-10⁶; for the
    top of that range, broadcast-join an exploded form instead)."""
    if n_buckets < 1:
        raise ValueError(f"need n_buckets >= 1, got {n_buckets}")
    if not weights_ppm:
        raise ValueError("weights_ppm must be non-empty")
    bad = [b for b in weights_ppm if not 0 <= int(b) < n_buckets]
    if bad:
        raise ValueError(f"buckets out of range [0, {n_buckets}): {sorted(bad)[:5]}")
    tokens = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    wmap = F.create_map(
        *[
            x
            for b, w in sorted(weights_ppm.items())
            for x in (F.lit(int(b)).cast("long"), F.lit(int(w)).cast("long"))
        ]
    )

    def bucket(t):
        return F.pmod(
            F.conv(F.substring(F.md5(t), 1, 12), 16, 10).cast("long"),
            F.lit(n_buckets).cast("long"),
        )

    score = F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.coalesce(F.element_at(wmap, bucket(t)), F.lit(0).cast("long")),
    )
    return df.select(
        F.col(id_col).alias(id_col),
        F.size(tokens).cast("long").alias("n_tokens"),
        score.alias("score_ppm"),
    )


def train_hashed_classifier(
    df: DataFrame,
    n_buckets: int,
    iterations: int = 4,
    id_col: str = "id",
    text_col: str = "text",
    label_col: str = "label",
    track_errors: bool = True,
) -> tuple[dict[int, int], list[int]]:
    """Train the hashed linear classifier ``hashed_linear_score`` applies —
    distributed batch perceptron over hashed bag-of-words features (the
    fastText / Vowpal-Wabbit hashing trick), the missing half of the
    model-based quality-filter loop: label a seed set ("looks like
    reference corpus" = 1), train here, apply corpus-wide with
    ``hashed_linear_score(df, weights, n_buckets)``, threshold at 0.

    Batch (not online) perceptron, deliberately: the classic per-example
    update is sequential and order-dependent — unrunnable and
    irreproducible distributed — while the batch form aggregates one
    integer update per iteration over ALL currently-misclassified
    documents (margin·y ≤ 0), which is order- and partition-independent.
    All arithmetic is integer (weights start at 0; each misclassified
    document adds y ∈ {+1,−1} per token occurrence to its buckets), so
    trained weights are bit-reproducible across engines and feed
    ``weights_ppm`` directly (linear scores threshold at 0, so the unit is
    a free scale factor).

    Scale shape: the token→bucket hashing (the shared portable 48-bit md5
    prefix) is paid ONCE into a persisted (y, array<bucket>) projection;
    each iteration is one zero-shuffle margin projection (current weights
    ride the plan as a map literal — a model artifact, ≤ n_buckets
    entries) followed by one map-side-partial hash-agg on bucket (≤
    n_buckets distinct keys) collected to the driver. No per-row Python,
    no driver loop over rows; driver state is the O(n_buckets) model.

    ``label_col`` must be 0/1. Returns (weights, errors_per_iteration);
    ``track_errors=False`` skips the per-iteration misclassified count
    (one extra cached-scan agg per iteration).
    """
    if n_buckets < 1:
        raise ValueError(f"need n_buckets >= 1, got {n_buckets}")
    if iterations < 1:
        raise ValueError(f"need iterations >= 1, got {iterations}")
    tokens = F.filter(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda t: F.length(t) > 0,
    )

    def bucket(t: Column) -> Column:
        return F.pmod(
            F.conv(F.substring(F.md5(t), 1, 12), 16, 10).cast("long"),
            F.lit(n_buckets).cast("long"),
        )

    base = df.select(
        (F.col(label_col).cast("long") * 2 - 1).alias("_y"),
        F.transform(tokens, bucket).alias("_b"),
    ).persist()
    weights: dict[int, int] = {}
    errors: list[int] = []
    try:
        for _ in range(iterations):
            if weights:
                wmap = F.create_map(
                    *[
                        x
                        for b, w in sorted(weights.items())
                        for x in (F.lit(int(b)).cast("long"), F.lit(int(w)).cast("long"))
                    ]
                )
                margin = F.aggregate(
                    F.col("_b"),
                    F.lit(0).cast("long"),
                    lambda acc, b: acc
                    + F.coalesce(F.element_at(wmap, b), F.lit(0).cast("long")),
                )
            else:
                margin = F.lit(0).cast("long")
            mis = base.filter(F.col("_y") * margin <= 0)
            if track_errors:
                errors.append(mis.count())
            upd = (
                mis.select("_y", F.explode("_b").alias("bucket"))
                .groupBy("bucket")
                .agg(F.sum("_y").alias("delta"))
                .collect()
            )
            if not upd:
                # no misclassified document carries tokens: converged
                break
            for row in upd:
                w = weights.get(row["bucket"], 0) + int(row["delta"])
                if w:
                    weights[row["bucket"]] = w
                else:
                    weights.pop(row["bucket"], None)
    finally:
        base.unpersist()
    return weights, errors


# ---------------------------------------------------------------------------
# BPE tokenizer training / encoding (Sennrich et al. 2016)
# ---------------------------------------------------------------------------


def word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word histogram — the input BPE training actually needs. The
    classic scaling trick (and how production BPE trainers work): merges
    operate on (distinct word, count), never the raw corpus, so the
    100 TB corpus is touched ONCE by this single hash-agg and every merge
    iteration after it runs over a vocabulary-sized table. Output:
    (word, n) for lowercased whitespace tokens."""
    words = F.expr(
        f"transform(filter(split(coalesce({text_col}, '')," + r" '\\s+'),"
        " w -> length(w) > 0), w -> lower(w))"
    )
    return (
        df.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_EOW = "▁"  # end-of-word sentinel (visible, never in whitespace tokens)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
    min_count: int = 2,
    checkpoint_every: int = 6,
) -> list[tuple[str, str, int]]:
    """Train a byte-pair-encoding merge list (Sennrich et al. 2016) over
    the corpus: start from characters (+ an end-of-word sentinel), greedily
    merge the most frequent adjacent symbol pair, repeat ``num_merges``
    times or until the best pair drops under ``min_count``.

    Spark-first shape: ONE corpus scan builds the word histogram
    (:func:`word_histogram`); every iteration then runs over that
    vocabulary-sized table — an adjacent-pair explode + hash-agg + a
    TakeOrdered(1) argmax, followed by a pure-JVM left-to-right fold that
    applies the merge to the symbol arrays (the fold's "did the previous
    element just merge" semantics reproduces standard non-overlapping BPE
    merging). ``localCheckpoint`` every ``checkpoint_every`` merges
    truncates the growing lineage, the same technique wave_bfs uses for
    iterative plans. num_merges Spark jobs total, none touching the
    corpus — at a 32k-merge production vocabulary you would sample the
    histogram's head instead; the per-iteration shape is already the
    scalable one.

    Determinism: the argmax tie-breaks by (count DESC, left ASC, right
    ASC) — bit-stable across partitionings. Returns [(left, right,
    pair_count), ...] in merge order."""
    hist = word_histogram(df, text_col=text_col)
    syms = hist.select(
        F.expr(f"concat(split(word, ''), array('{_EOW}'))").alias("syms"),
        F.col("n"),
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    pair_expr = F.expr(
        "transform(sequence(1, size(syms) - 1),"
        " j -> struct(syms[j - 1] AS a, syms[j] AS b))"
    )
    for step in range(num_merges):
        best = (
            syms.filter(F.size("syms") >= 2)
            .select(F.explode(pair_expr).alias("p"), F.col("n"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        la, lb = a.replace("'", "\\'"), b.replace("'", "\\'")
        # get() is 0-based and NULL-safe out of bounds (ANSI-proof on the
        # empty accumulator); the typed empty array pins the fold's type
        merged = F.expr(
            "aggregate(syms, CAST(array() AS ARRAY<STRING>)," + f"""
            (acc, x) -> CASE
                WHEN get(acc, size(acc) - 1) = '{la}' AND x = '{lb}'
                THEN concat(slice(acc, 1, size(acc) - 1), array('{la}{lb}'))
                ELSE concat(acc, array(x)) END)
            """
        )
        syms = syms.select(merged.alias("syms"), "n")
        if (step + 1) % checkpoint_every == 0:
            syms = syms.localCheckpoint(eager=True)
    return merges


def _bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference BPE encode for one word: repeatedly merge the
    lowest-rank adjacent pair. O(len^2) worst case — applied per DISTINCT
    word inside the Arrow batch, with a cache."""
    parts = list(word) + [_EOW]
    while len(parts) >= 2:
        ranked = [
            (ranks[(parts[i], parts[i + 1])], i)
            for i in range(len(parts) - 1)
            if (parts[i], parts[i + 1]) in ranks
        ]
        if not ranked:
            break
        r, i = min(ranked)
        # standard left-to-right non-overlap: merge EVERY adjacent
        # occurrence of this pair in one pass, leftmost first
        pair = (parts[i], parts[i + 1])
        out: list[str] = []
        j = 0
        while j < len(parts):
            if (
                j < len(parts) - 1
                and (parts[j], parts[j + 1]) == pair
            ):
                out.append(parts[j] + parts[j + 1])
                j += 2
            else:
                out.append(parts[j])
                j += 1
        parts = out
    return parts


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained merge list: tokenize whitespace-lowercase like the
    trainer, BPE-encode each word by rank order. Arrow-batched pandas UDF
    (string surgery is the sanctioned slow path) with a per-batch distinct-
    word cache — web text repeats words heavily, so the O(len^2) encoder
    runs once per distinct word per batch, not per occurrence. Output:
    (id_col, tokens array<string>, n_bpe_tokens)."""
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}

    def encode_series(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc(t):
            out: list[str] = []
            for w in (t or "").lower().split():
                if w not in cache:
                    cache[w] = _bpe_encode_word(w, ranks)
                out.extend(cache[w])
            return out

        return texts.map(enc)

    udf = F.pandas_udf(encode_series, ArrayType(StringType()))
    return df.select(
        F.col(id_col),
        udf(F.col(text_col)).alias("tokens"),
    ).withColumn("n_bpe_tokens", F.size("tokens").cast("long"))


# ---------------------------------------------------------------------------
# Unicode script profiling + mojibake detection
# ---------------------------------------------------------------------------

#: (script, inclusive codepoint ranges) — the coarse Unicode blocks a crawl
#: cares about. One constant feeds the query AND the SQL oracle (the
#: LANG_MARKERS discipline), and the ranges are plain BMP literals so the
#: same character-class regex parses identically under Java regex and
#: DuckDB's RE2.
SCRIPT_RANGES: list[tuple[str, str]] = [
    ("latin", "A-Za-z\\u00C0-\\u024F"),
    ("cyrillic", "\\u0400-\\u04FF"),
    ("greek", "\\u0370-\\u03FF"),
    ("arabic", "\\u0600-\\u06FF"),
    ("hebrew", "\\u0590-\\u05FF"),
    ("devanagari", "\\u0900-\\u097F"),
    ("cjk", "\\u4E00-\\u9FFF\\u3040-\\u30FF\\uAC00-\\uD7AF"),
]

#: mojibake evidence: U+FFFD replacement chars (decode failures) plus the
#: UTF-8-read-as-Latin-1 tell-tales (Â/Ã followed by a continuation-range
#: char) — the classic double-encoding smell on real web text.
_MOJIBAKE_RE = "[\\uFFFD]|[\\u00C2\\u00C3][\\u0080-\\u00BF]"


def script_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mojibake_max_per_kchar: int = 5,
) -> DataFrame:
    """Per-document Unicode script profile + mojibake gate — the
    multilingual triage ahead of language-ID: which SCRIPT a page is in
    decides which langid model/marker set even applies, and a page whose
    bytes were decoded with the wrong charset should be dropped (or
    re-decoded), not language-scored.

    Pure regexp_count codegen per script family (one JVM pass per range
    set — no tokenization, no UDF), counts in characters. ``script`` =
    argmax of the per-family counts, 'und' when no script chars at all
    (ties break in SCRIPT_RANGES order — the langid forward-iteration
    rule). ``mojibake_per_kchar`` counts replacement chars and
    UTF-8-as-Latin-1 tell-tales per 1000 chars (integer: count*1000 div
    length); ``is_mojibake`` flags docs over ``mojibake_max_per_kchar``.

    Output: (id_col, n_chars, <family>_n per family, script,
    mojibake_per_kchar, is_mojibake).
    """
    base = df.select(
        F.col(id_col),
        F.coalesce(F.col(text_col), F.lit("")).alias("_t"),
    )
    t = F.col("_t")
    counts = [
        F.regexp_count(t, F.lit(f"[{ranges}]")).alias(f"{name}_n")
        for name, ranges in SCRIPT_RANGES
    ]
    best = F.lit("und")
    best_n = F.lit(0)
    for name, ranges in SCRIPT_RANGES:
        c = F.regexp_count(t, F.lit(f"[{ranges}]"))
        cond = c > best_n
        best = F.when(cond, F.lit(name)).otherwise(best)
        best_n = F.when(cond, c).otherwise(best_n)
    staged = base.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        *counts,
        best.alias("script"),
        F.regexp_count(t, F.lit(_MOJIBAKE_RE)).cast("long").alias("_moji"),
    )
    rate = (
        F.when(F.col("n_chars") > 0, F.expr("_moji * 1000 div n_chars"))
        .otherwise(F.lit(0))
        .cast("long")
    )
    return staged.select(
        id_col,
        "n_chars",
        *[f"{name}_n" for name, _ in SCRIPT_RANGES],
        "script",
        rate.alias("mojibake_per_kchar"),
        (rate > mojibake_max_per_kchar).alias("is_mojibake"),
    )
