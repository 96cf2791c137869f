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
from ..udf import session_safe_pandas_udf
from pyspark.sql.types import ArrayType, LongType

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


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The full text-analysis surface in one projection."""
    t = F.col(text_col)
    return quality_features(df, text_col).select(
        "*",
        detect_language(t).alias("lang_pred"),
        bpe_token_estimate(t).alias("bpe_tokens"),
        min_shingle_fingerprint(t).alias("fingerprint"),
    )
