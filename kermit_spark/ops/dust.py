"""DUST-style URL alias-parameter mining (Bar-Yossef et al., WWW 2007,
"Do Not Crawl in the DUST: Different URLs with Similar Text").

Large crawls waste fetch budget and pollute dedup when the same content
hides behind URLs that differ only in content-irrelevant query parameters
(session ids, click trackers, affiliate tags). This module mines the
crawl's OWN evidence — (url, content_hash) pairs the fetch/parse stage
already produces — for parameter keys whose value never changes the
content, so the canonicalizer can strip them on the next wave.

The reference engine's URI toolkit (tools.coffee:29-66) canonicalizes
syntax only (scheme/host case, dot-segments, fragments); it has no
data-driven alias detection. This op is the scale-path addition: at
10^10 frontier entries, session-id explosions are a top-3 frontier
pollution source (each infinite-variant URL family is a crawler trap the
shape-based TrapRules in filters.py cannot see, because every individual
URL looks benign).

Method — group-by evidence, never pairwise:
  for each URL u with query parameter k=v at position i:
    rest(u, k) = u with that single parameter removed (order preserved)
  group by (rest, k): the group holds all crawled variants of one page
  that differ ONLY in k (including, via a join back to the corpus, the
  variant with k absent). A group SUPPORTS irrelevance when it has >= 2
  distinct variants and exactly 1 distinct content hash; it VIOLATES when
  its hashes differ. A key is declared irrelevant when support groups
  reach ``min_support`` and no group violates.

Scale shape: everything is JVM codegen (split / slice / posexplode /
hash-agg) — no UDFs, no self-join of the URL table; the only join is the
absent-variant lookup, keyed on full URL (the corpus's natural unique
key). A hot page with a million session-id variants is ONE group in a
hash aggregate, not a million-squared pair join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def explode_params(
    df: DataFrame, url_col: str = "url", hash_col: str = "content_hash"
) -> DataFrame:
    """One row per (url, query-parameter): (rest, param, variant, hash)
    where ``rest`` is the url with that parameter spliced out (parameter
    order preserved, '?' dropped when nothing remains) and ``variant`` is
    the full `k=v` token. URLs without a query contribute nothing here —
    they enter as absent-variants in :func:`mine_irrelevant_params`.

    Expects fragment-free canonical URLs (functions.urls.normalize_urls
    strips fragments); '?' inside a fragment would confuse the split."""
    base = F.substring_index(F.col(url_col), "?", 1)
    has_q = F.instr(F.col(url_col), "?") > 0
    query = F.expr(f"substr({url_col}, instr({url_col}, '?') + 1)")
    params = F.split(query, "&")
    exploded = (
        df.select(F.col(url_col), F.col(hash_col))
        .filter(has_q & (F.length(query) > 0))
        .select(
            base.alias("_base"),
            params.alias("_params"),
            F.col(hash_col).alias("hash"),
        )
        .select(
            "_base",
            "_params",
            "hash",
            F.posexplode("_params").alias("_pos", "variant"),
        )
    )
    rest_params = F.concat(
        F.slice("_params", 1, F.col("_pos")),
        F.expr("slice(_params, _pos + 2, size(_params) - _pos - 1)"),
    )
    return exploded.select(
        F.when(F.size(rest_params) == 0, F.col("_base"))
        .otherwise(
            F.concat(F.col("_base"), F.lit("?"), F.array_join(rest_params, "&"))
        )
        .alias("rest"),
        F.expr("split_part(variant, '=', 1)").alias("param"),
        F.col("variant"),
        F.col("hash"),
    )


def mine_irrelevant_params(
    df: DataFrame,
    url_col: str = "url",
    hash_col: str = "content_hash",
    min_support: int = 2,
) -> DataFrame:
    """Mine query-parameter keys that never change content (module
    docstring has the method). Input: one row per crawled URL with its
    content hash (duplicates are collapsed). Output, one row per parameter
    key:

      (param, n_groups, n_support, n_violation, irrelevant)

    ``irrelevant`` = n_support >= min_support AND n_violation == 0 — the
    conservative verdict a canonicalizer can act on (one counterexample
    anywhere vetoes the key)."""
    urls = df.select(
        F.col(url_col).alias("url"), F.col(hash_col).alias("hash")
    ).distinct()
    present = explode_params(urls, url_col="url", hash_col="hash")
    # the k-absent variant: a crawled URL exactly equal to a group's rest —
    # its hash joins the group's hash set, its existence counts as a variant
    absent = (
        present.select("rest", "param")
        .distinct()
        .join(urls.withColumnRenamed("url", "rest"), "rest")
        .select("rest", "param", F.lit("∅").alias("variant"), "hash")
    )
    groups = (
        present.unionByName(absent)
        .groupBy("rest", "param")
        .agg(
            F.countDistinct("variant").alias("_nv"),
            F.countDistinct("hash").alias("_nh"),
        )
    )
    return (
        groups.groupBy("param")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(
                ((F.col("_nv") >= 2) & (F.col("_nh") == 1)).cast("long")
            ).alias("n_support"),
            F.sum((F.col("_nh") >= 2).cast("long")).alias("n_violation"),
        )
        .select(
            "param",
            "n_groups",
            "n_support",
            "n_violation",
            (
                (F.col("n_support") >= F.lit(min_support))
                & (F.col("n_violation") == 0)
            ).alias("irrelevant"),
        )
    )


def strip_params(
    df: DataFrame, keys: list[str], url_col: str = "url"
) -> DataFrame:
    """Rewrite ``url_col`` with the given parameter keys removed (the
    action step after :func:`mine_irrelevant_params`): pure JVM filter over
    the split parameter list, order preserved, '?' dropped when the query
    empties. Non-query URLs pass through untouched."""
    if not keys:
        return df
    arr = ", ".join("'" + k.replace("'", "\\'") + "'" for k in keys)
    kept = (
        f"filter(split(substr({url_col}, instr({url_col}, '?') + 1), '&'),"
        f" kv -> NOT array_contains(array({arr}), split_part(kv, '=', 1)))"
    )
    stripped = F.expr(
        f"""
        CASE WHEN instr({url_col}, '?') = 0 THEN {url_col}
        ELSE concat(
            substring_index({url_col}, '?', 1),
            CASE WHEN size({kept}) = 0 THEN ''
                 ELSE concat('?', array_join({kept}, '&')) END
        ) END
        """
    )
    return df.withColumn(url_col, stripped)
