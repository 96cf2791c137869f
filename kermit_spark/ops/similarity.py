"""Similarity search over an embedding column (array<float>).

Two paths with the same output contract (query_id, rnk, neighbor_id, score):

  brute_force_topk   exact: queries × corpus cosine, per-query window top-k.
                     The QUERY side is broadcast (queries ≪ corpus); the
                     corpus is scanned once, never shuffled — at 100 TB the
                     only movement is the per-partition partial top-k.
  lsh_topk           approximate: random-hyperplane sign-bucket both sides
                     with multi-probe (flip each bit once → num_planes + 1
                     probes per query), cosine only within colliding
                     buckets. Trades recall for a corpus-scan-sized join
                     against a tiny fraction of candidates.

Scores are rounded so results are reproducible across engines/architectures
(float reduction order); rank ties break by neighbor id — fully deterministic
output, same contract the frontier dequeue follows (SURVEY §2.8 spirit).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import _deterministic_planes, cosine_expr


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "neighbor_id", "score")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    rank_digits: int | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector (self-matches by id
    are excluded).

    ``rank_digits`` (default: same as ``round_digits``) sets the precision
    used for RANKING; the reported ``score`` is then rounded to
    ``round_digits``. Ranking at higher precision than the report keeps the
    order stable while emitting compact scores."""
    rd = round_digits if rank_digits is None else rank_digits
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr("qv", "cv"), rd).alias("score"),
        )
    )
    topk = _topk_per_query(scored, k)
    if rd != round_digits:
        topk = topk.withColumn("score", F.round("score", round_digits))
    return topk


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "id",
    vec_col: str = "embedding",
    num_planes: int = 6,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k: corpus bucketed once by sign bits; queries probe
    their own bucket plus each 1-bit-flip neighbor bucket."""
    dim = len(corpus.select(vec_col).first()[0])
    planes = _deterministic_planes(num_planes, dim)

    def bucket_expr(v):
        bits = []
        for p in range(num_planes):
            plane_lit = F.array(*[F.lit(float(x)) for x in planes[p]])
            d = F.aggregate(
                F.zip_with(v, plane_lit, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(d >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2 ** p))
        return sum(bits[1:], bits[0])

    cv = F.col(vec_col).cast("array<double>")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), cv.alias("cvec"), bucket_expr(cv).alias("bucket")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), cv.alias("qvec"), bucket_expr(cv).alias("qbucket")
    )
    # multi-probe: own bucket + flip each bit once
    probes = F.array(
        F.col("qbucket"),
        *[F.col("qbucket").bitwiseXOR(F.lit(2 ** p)) for p in range(num_planes)],
    )
    q = q.select("query_id", "qvec", F.explode(probes).alias("bucket"))
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr("qvec", "cvec"), round_digits).alias("score"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return _topk_per_query(scored, k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    round_digits: int = 4,
) -> DataFrame:
    """IVF (inverted-file) ANN — the data-adaptive scale path next to
    :func:`lsh_topk`'s data-oblivious one.

    A coarse quantizer partitions the corpus into ``n_centroids`` cells
    (each vector joins its most-cosine-similar centroid); a query probes
    only its ``n_probe`` nearest cells, so the exact-cosine stage touches
    ~n_probe/n_centroids of the corpus instead of all of it.

    Centroids here are a DETERMINISTIC sample: the corpus vectors with the
    smallest md5(id) — seedless, engine-portable (a DuckDB oracle recomputes
    the identical centroids, assignments, probes and scores). A production
    deployment would swap in k-means centroids (pyspark.ml KMeans) trained
    once per corpus snapshot; everything downstream is unchanged.

    Plan shape at scale: centroids ride the plan as literals (no side
    table), assignment is one JVM scan of the corpus, the probe join is an
    equi-join on the cell id with the (tiny) probe set broadcast.
    """
    cent_rows = (
        corpus.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).cast("array<double>").alias("cv"),
            F.md5(F.col(id_col).cast("string")).alias("_m"),
        )
        .orderBy("_m")
        .limit(n_centroids)
        .collect()
    )
    cents = [list(r["cv"]) for r in cent_rows]

    def cos_lit(vcol, cent):
        plane = F.array(*[F.lit(float(x)) for x in cent])
        dot = F.aggregate(
            F.zip_with(vcol, plane, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        nv = F.sqrt(F.aggregate(vcol, F.lit(0.0), lambda a, x: a + x * x))
        # LEFT-fold norm (not numpy pairwise sum): bit-identical to the
        # DuckDB oracle's list_reduce association
        sq = 0.0
        for x in cent:
            sq += float(x) * float(x)
        import math

        return dot / (nv * F.lit(math.sqrt(sq)))

    v = F.col(vec_col).cast("array<double>")
    sims_arr = F.array(*[cos_lit(v, c) for c in cents])
    # corpus cell = FIRST index of the max similarity (ties -> lowest cell,
    # the same order the oracle's (sim DESC, cell ASC) window picks)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        v.alias("cvec"),
        (F.array_position(sims_arr, F.array_max(sims_arr)) - 1).cast("int").alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        v.alias("qvec"),
        F.posexplode(sims_arr).alias("cell", "sim"),
    )
    wp = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cell").asc())
    probes = (
        q.withColumn("_pr", F.row_number().over(wp))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "qvec", "cell")
    )
    scored = (
        c.join(F.broadcast(probes), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr("qvec", "cvec"), round_digits).alias("score"),
        )
    )
    return _topk_per_query(scored, k)


def recall_at_k(exact: DataFrame, approx: DataFrame) -> float:
    """Fraction of exact top-k pairs the approximate index recovered."""
    e = exact.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id")
    hits = e.join(a, ["query_id", "neighbor_id"]).count()
    total = e.count()
    return hits / total if total else 1.0
