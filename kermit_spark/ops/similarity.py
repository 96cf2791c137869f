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
from pyspark.sql import Column, DataFrame
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
    # deterministic md5-sample centroids; LEFT-fold norms (not numpy
    # pairwise sums) keep the scores bit-identical to the DuckDB oracle's
    # list_reduce association. Corpus cell = FIRST index of the max
    # similarity (ties -> lowest cell, the same order the oracle's
    # (sim DESC, cell ASC) window picks). Shared with the persistent index
    # (build_ivf_index) so the two paths cannot drift.
    cents = _centroids_of(corpus, n_centroids, id_col, vec_col)
    cell_expr, probes_of = _cell_and_probes(cents, vec_col, n_probe)
    v = F.col(vec_col).cast("array<double>")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        v.alias("cvec"),
        cell_expr.alias("cell"),
    )
    probes = probes_of(queries, id_col)
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


def _centroids_of(corpus: DataFrame, n_centroids: int, id_col: str, vec_col: str):
    """The deterministic centroid sample shared by ivf_topk and the
    persistent index: corpus vectors with the smallest md5(id)."""
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
    return [list(r["cv"]) for r in cent_rows]


def _cell_and_probes(cents, vec_col: str, n_probe: int):
    """(corpus cell expr, probe-per-query builder) for a fixed centroid list
    — one code path for transient ivf_topk and the persistent index."""
    import math

    def cos_lit(vcol, cent):
        plane = F.array(*[F.lit(float(x)) for x in cent])
        dot = F.aggregate(
            F.zip_with(vcol, plane, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        nv = F.sqrt(F.aggregate(vcol, F.lit(0.0), lambda a, x: a + x * x))
        sq = 0.0
        for x in cent:
            sq += float(x) * float(x)
        return dot / (nv * F.lit(math.sqrt(sq)))

    v = F.col(vec_col).cast("array<double>")
    sims_arr = F.array(*[cos_lit(v, c) for c in cents])
    cell_expr = (F.array_position(sims_arr, F.array_max(sims_arr)) - 1).cast("int")

    def probes_of(queries: DataFrame, id_col: str) -> DataFrame:
        q = queries.select(
            F.col(id_col).alias("query_id"),
            v.alias("qvec"),
            F.posexplode(sims_arr).alias("cell", "sim"),
        )
        wp = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cell").asc())
        return (
            q.withColumn("_pr", F.row_number().over(wp))
            .filter(F.col("_pr") <= n_probe)
            .select("query_id", "qvec", "cell")
        )

    return cell_expr, probes_of


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int,
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 20,
):
    """K-means coarse quantizer (pyspark.ml, seeded) — the production
    centroid choice the md5 sample stands in for: data-adaptive cells give
    balanced inverted lists and better probe recall. Deterministic for a
    fixed seed/platform, but float reduction orders vary across engines, so
    indexes built this way are certified by recall tests rather than a SQL
    oracle (the md5-sample default keeps the bit-exact oracle)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(feats)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def build_ivf_index(
    catalog,
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "id",
    vec_col: str = "embedding",
    prefix: str = "ivf",
    centroids: str = "md5",
) -> None:
    """Persist an IVF index into the snapshot catalog — the build-once /
    search-many form of :func:`ivf_topk`:

      {prefix}_centroids  (p=cell, cell, centroid:array<double>) — tiny.
      {prefix}_cells      (p=cell, neighbor_id, cvec) — the corpus
                          PARTITIONED BY CELL.

    The at-scale payoff is the partitioning: a search reads ONLY the probed
    cells' files (catalog partition pruning — the same mechanism the
    frontier's p column uses), so per-query scan cost is
    ~n_probe/n_centroids of the corpus with no assignment recompute and no
    full-corpus join. Rebuild on corpus snapshot changes.

    ``centroids``: 'md5' (default) = the deterministic sample — engine-
    portable, hash-oracle-able, reproducible rebuilds; 'kmeans' = seeded
    pyspark.ml quantizer — balanced cells / better recall, certified by
    recall tests instead of a SQL oracle."""
    if centroids == "kmeans":
        cents = kmeans_centroids(corpus, n_centroids, vec_col)
    else:
        cents = _centroids_of(corpus, n_centroids, id_col, vec_col)
    spark = corpus.sparkSession
    cell_expr, _ = _cell_and_probes(cents, vec_col, n_probe=1)
    cent_df = spark.createDataFrame(
        [(i, i, c) for i, c in enumerate(cents)],
        "p int, cell int, centroid array<double>",
    )
    catalog.create(f"{prefix}_centroids", cent_df, n_centroids)
    assigned = corpus.select(
        cell_expr.alias("p"),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )
    catalog.create(f"{prefix}_cells", assigned, n_centroids)


def extend_ivf_index(
    catalog,
    new_vectors: DataFrame,
    id_col: str = "id",
    vec_col: str = "embedding",
    prefix: str = "ivf",
) -> None:
    """Append new vectors to a persisted IVF index WITHOUT a rebuild — the
    daily-increment path (the :func:`ops.dedup.extend_minhash_index`
    analog): centroids are read back FROZEN from ``{prefix}_centroids``,
    the increment is assigned with the exact same first-max rule, and the
    rows fast-append into only the touched cell partitions
    (catalog.merge_write with an empty replace set — commit cost O(new
    data), untouched cells keep their files byte-for-byte).

    Equivalence contract (pinned in pytest): searching the extended index
    == searching an index built from the union corpus with the SAME
    centroid list. Quantizer drift is the caller's tradeoff: frozen
    centroids skew cell balance as the distribution shifts — rebuild when
    recall or cell-size skew degrades (the same advice as the minhash
    caps)."""
    cent_rows = catalog.read(f"{prefix}_centroids").orderBy("cell").collect()
    cents = [list(r["centroid"]) for r in cent_rows]
    cell_expr, _ = _cell_and_probes(cents, vec_col, n_probe=1)
    assigned = new_vectors.select(
        cell_expr.alias("p"),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )
    catalog.merge_write(f"{prefix}_cells", assigned, replace_parts=())


def ivf_index_topk(
    catalog,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    prefix: str = "ivf",
) -> DataFrame:
    """Search a :func:`build_ivf_index` index. Output is IDENTICAL to
    ivf_topk(corpus, queries, ...) with the same parameters (same centroid
    sample, assignment, probe order, scoring) — but the corpus side is a
    partition-pruned read of the probed cells only."""
    cent_rows = catalog.read("%s_centroids" % prefix).orderBy("cell").collect()
    cents = [list(r["centroid"]) for r in cent_rows]
    _, probes_of = _cell_and_probes(cents, vec_col, n_probe)
    probes = probes_of(queries, id_col)
    # the distinct probed cells (≤ n_centroids values) drive partition
    # pruning on the cells table — the scan never touches unprobed cells
    probe_cells = sorted(r["cell"] for r in probes.select("cell").distinct().collect())
    cells = catalog.read(f"{prefix}_cells").filter(F.col("p").isin(probe_cells))
    scored = (
        cells.join(F.broadcast(probes), cells["p"] == probes["cell"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr("qvec", "cvec"), round_digits).alias("score"),
        )
    )
    return _topk_per_query(scored, k)


def pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    ks: int = 8,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou et al. TPAMI 2011): split the
    d-dim space into ``m`` subspaces of d/m dims; subspace ``s``'s codebook
    is the s-th subvector of the ``ks`` deterministic sample rows (smallest
    md5(id) — the same engine-portable quantizer sample the IVF path uses,
    so codebooks are hash-oracle-able and rebuilds reproduce). Returns
    ``books[s][j]`` = centroid j of subspace s. A seeded-kmeans-per-
    subspace variant would plug in exactly like kmeans_centroids does for
    IVF — sample codebooks keep the whole PQ path SQL-certifiable."""
    if m < 1 or ks < 1:
        raise ValueError(f"need m >= 1 and ks >= 1, got m={m} ks={ks}")
    sample = _centroids_of(corpus, ks, id_col, vec_col)
    if len(sample) < ks:
        raise ValueError(f"corpus has {len(sample)} rows < ks={ks}")
    d = len(sample[0])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    return [[vec[s * sub : (s + 1) * sub] for vec in sample] for s in range(m)]


def _sq_dist(vec_slice, cent: list[float]):
    """Left-fold squared L2 distance between a vector-slice column and a
    literal centroid — the fold order the DuckDB oracle replays."""
    plane = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(
        F.zip_with(vec_slice, plane, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def pq_encode(
    corpus: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ encoding: each vector becomes ``m`` small codes — the nearest
    codebook centroid per subspace (squared-L2 argmin, ties to the lowest
    code, matching array_position-of-min semantics in the oracle).

    THE scale move of the similarity family: a 64-dim float corpus (256 B/
    row) compresses to m=4 ints (≤4 B/row as bytes on disk) — at 100 TB of
    embeddings the searchable representation drops to sub-TB, which is the
    difference between ANN fitting in cluster page cache or not. Pure JVM:
    m·ks literal fold expressions inside one codegen projection, zero
    shuffle; persist the output like any DataFrame (the snapshot catalog
    or parquet) and re-encode only on corpus change."""
    v = F.col(vec_col).cast("array<double>")
    return corpus.select(
        F.col(id_col).alias("neighbor_id"), _pq_codes_expr(v, books).alias("codes")
    )


def _pq_codes_expr(v, books) -> Column:
    """array<int> of per-subspace codes for a vector column — first-min
    argmin per subspace (array_position-of-array_min), shared by pq_encode
    and the composed IVF-PQ scan so the two paths cannot drift."""
    m = len(books)
    sub = len(books[0][0])
    code_cols = []
    for s in range(m):
        sl = F.slice(v, s * sub + 1, sub)
        dists = F.array(*[_sq_dist(sl, c) for c in books[s]])
        code_cols.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
    return F.array(*code_cols)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    ks: int = 8,
    id_col: str = "id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    codes: DataFrame | None = None,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) over PQ
    codes: each query precomputes one ks-entry distance table per subspace
    (query-subvector to every centroid), then every corpus code row scores
    as m table LOOKUPS summed in subspace order — no float vectors on the
    scan side at all. Returns (query_id, rnk, neighbor_id, adc_dist),
    ranked ascending by rounded distance with neighbor-id tie-break;
    self-matches excluded.

    Scale shape: queries (with their tables, m·ks doubles each) broadcast;
    the codes table streams through one codegen projection of integer
    lookups — per-candidate cost O(m) instead of O(d), scan bytes ~d/m·8×
    smaller than brute force, and only (query_id, neighbor_id, dist)
    shuffles into the per-query top-k. Pass precomputed ``codes``/``books``
    (pq_encode/pq_codebooks) for the build-once/search-many form."""
    if books is None:
        books = pq_codebooks(corpus, m=m, ks=ks, id_col=id_col, vec_col=vec_col)
    if codes is None:
        codes = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), *_pq_table_cols(vec_col, books)
    )
    scored = codes.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(_adc_score(len(books)), round_digits).alias("adc_dist"),
    )
    return _rank_adc(scored, k)


def _pq_table_cols(vec_col: str, books) -> list[Column]:
    """Per-query ADC distance tables: one ks-entry array per subspace
    (query subvector to every codebook centroid), shared by pq_topk and
    ivf_pq_topk so scoring cannot drift between the two paths."""
    v = F.col(vec_col).cast("array<double>")
    sub = len(books[0][0])
    return [
        F.array(
            *[_sq_dist(F.slice(v, s * sub + 1, sub), c) for c in books[s]]
        ).alias(f"_dt{s}")
        for s in range(len(books))
    ]


def _adc_score(m: int) -> Column:
    """ADC score = the m table lookups summed in subspace order (the exact
    left-to-right double fold the SQL oracles replay)."""
    score = F.lit(0.0)
    for s in range(m):
        score = score + F.element_at(
            F.col(f"_dt{s}"), F.element_at(F.col("codes"), s + 1) + 1
        )
    return score


def _rank_adc(scored: DataFrame, k: int) -> DataFrame:
    """Ascending-ADC per-query top-k with neighbor-id tie-break — the one
    ranking contract for both PQ paths."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "neighbor_id", "adc_dist")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 4,
    ks: int = 16,
    id_col: str = "id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Composed IVF-PQ ANN — the FAISS IVFPQ shape (non-residual variant):
    the IVF coarse quantizer prunes candidates to each query's ``n_probe``
    nearest of ``n_centroids`` cells, and PQ asymmetric distance scores
    the survivors from ``m`` table lookups. The two compressions multiply:
    ~n_probe/n_centroids of the corpus is touched, at ~d/(m·lookup) the
    bytes per candidate — at 100 TB of embeddings this is the difference
    between an ANN query being a full-corpus float scan and a sub-percent
    integer-code probe.

    Candidate semantics are EXACTLY ivf_topk's (same md5-sample centroids,
    same first-max cell assignment, same probe windows) and scoring is
    EXACTLY pq_topk's (same codebooks, codes and fold order) — pinned by
    the n_probe == n_centroids equivalence test and the shared helpers
    (_cell_and_probes, _pq_codes_expr). Returns (query_id, rnk,
    neighbor_id, adc_dist), ascending ADC distance, self excluded."""
    cents = _centroids_of(corpus, n_centroids, id_col, vec_col)
    cell_expr, probes_of = _cell_and_probes(cents, vec_col, n_probe)
    books = pq_codebooks(corpus, m=m, ks=ks, id_col=id_col, vec_col=vec_col)
    v = F.col(vec_col).cast("array<double>")
    # ONE corpus scan: cell + codes in the same codegen projection
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        cell_expr.alias("cell"),
        _pq_codes_expr(v, books).alias("codes"),
    )
    # distance tables computed ONCE PER QUERY (the probe explode would
    # evaluate the m*ks folds n_probe times), then joined to the probe set
    qt = queries.select(F.col(id_col).alias("query_id"), *_pq_table_cols(vec_col, books))
    q = probes_of(queries, id_col).select("query_id", "cell").join(qt, "query_id")
    scored = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_adc_score(len(books)), round_digits).alias("adc_dist"),
        )
    )
    return _rank_adc(scored, k)


def random_projection(
    emb: DataFrame,
    out_dim: int = 16,
    id_col: str = "id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: map each embedding to
    ``out_dim`` components, component p = dot(vec, plane_p)/sqrt(out_dim),
    using the SAME md5-derived deterministic hyperplanes the LSH ops use
    (ops.dedup._deterministic_planes) — engine-portable, so the projected
    vectors are bit-reproducible on any run/cluster and DuckDB-oracle
    checkable. JL preserves pairwise distances within (1±eps) w.h.p., so
    downstream ANN / clustering / near-dup passes can run on the small
    vectors — at 100 TB the projection pays for itself the first time a
    shuffle carries vectors (64→16 dims = 4× less vector traffic).

    Returns (id_col, projected array<double>) with components rounded to
    ``round_digits``.

    Scale shape: map-only — planes ride the plan as literal arrays, the
    whole projection is one codegen projection; no Python, no shuffle, no
    data-dependent state."""
    if out_dim < 1:
        raise ValueError(f"need out_dim >= 1, got {out_dim}")
    import math

    dim = len(emb.select(vec_col).first()[0])
    planes = _deterministic_planes(out_dim, dim)
    v = F.col(vec_col).cast("array<double>")
    scale = F.lit(math.sqrt(float(out_dim)))
    comps = []
    for p in range(out_dim):
        plane_lit = F.array(*[F.lit(float(x)) for x in planes[p]])
        d = F.aggregate(
            F.zip_with(v, plane_lit, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        comps.append(F.round(d / scale, round_digits))
    return emb.select(F.col(id_col).alias(id_col), F.array(*comps).alias("projected"))


def semdedup(
    corpus: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.95,
    id_col: str = "id",
    vec_col: str = "embedding",
    max_cluster: int | None = 200,
    round_digits: int = 6,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540, public): cluster the embedding space coarsely, then
    drop within-cluster cosine near-duplicates — the cluster step bounds
    the pair search so the method scales where all-pairs cannot.

    Clustering reuses the IVF machinery: the deterministic md5-sample
    centroids (:func:`_centroids_of`) and the argmax-cosine cell
    assignment (ties -> lowest cell), so the whole decision is
    engine-portable and DuckDB-oracle-checkable (the paper uses k-means;
    :func:`kmeans_centroids` plugs in where bit-reproducibility isn't
    required). Within each cell, a row is DROPPED iff some kept-pool
    member with a smaller id has round(cosine, round_digits) >=
    threshold — the keep-lowest-id greedy every other dedup op here uses
    (the paper keeps the member farthest from the centroid; id-greedy is
    the deterministic, join-expressible variant).

    ``max_cluster`` bounds the keeper pool per cell (lowest ids): rows
    beyond it can still be dropped but never cause drops, so per-row work
    is <= max_cluster comparisons — no B² blowup when a giant boilerplate
    cluster lands in one cell.

    Returns one row per input row: (id_col, cell, keep).

    Scale shape: cell assignment is map-only (centroids are literal
    arrays in the plan). With ``max_cluster`` set, the pool is at most
    n_clusters × max_cluster rows, extracted with ONE narrow (cell, id)
    shuffle — vectors never shuffle — and both the pool-vector fetch and
    the verification join broadcast the pool, so the corpus itself is
    scanned twice and shuffled never."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"need 0 < threshold <= 1, got {threshold}")
    if n_clusters < 1:
        raise ValueError(f"need n_clusters >= 1, got {n_clusters}")
    cents = _centroids_of(corpus, n_clusters, id_col, vec_col)
    cell_expr, _ = _cell_and_probes(cents, vec_col, n_probe=1)
    tagged = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        cell_expr.alias("cell"),
    )
    if max_cluster is not None:
        if max_cluster < 1:
            raise ValueError(f"need max_cluster >= 1, got {max_cluster}")
        # pool ids first WITHOUT vectors (narrow shuffle), then fetch the
        # pool's vectors with a broadcast semi-join — map-only on the corpus
        wcap = Window.partitionBy("cell").orderBy("_id")
        pool_ids = (
            tagged.select("cell", "_id")
            .withColumn("_rn", F.row_number().over(wcap))
            .filter(F.col("_rn") <= max_cluster)
            .drop("_rn")
        )
        pool = tagged.join(F.broadcast(pool_ids), ["cell", "_id"], "semi")
        right = F.broadcast(
            pool.select("cell", F.col("_id").alias("_yid"), F.col("_v").alias("_yv"))
        )
    else:
        right = tagged.select(
            "cell", F.col("_id").alias("_yid"), F.col("_v").alias("_yv")
        )
    left = tagged.select("cell", F.col("_id").alias("_xid"), F.col("_v").alias("_xv"))
    dropped = (
        left.join(right, "cell")
        .filter(F.col("_yid") < F.col("_xid"))
        .filter(F.round(cosine_expr("_xv", "_yv"), round_digits) >= F.lit(threshold))
        .select(F.col("_xid").alias("_did"))
        .distinct()
    )
    return tagged.join(
        dropped, tagged["_id"] == dropped["_did"], "left"
    ).select(
        F.col("_id").alias(id_col),
        "cell",
        F.col("_did").isNull().alias("keep"),
    )


def recall_at_k(exact: DataFrame, approx: DataFrame) -> float:
    """Fraction of exact top-k pairs the approximate index recovered."""
    e = exact.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id")
    hits = e.join(a, ["query_id", "neighbor_id"]).count()
    total = e.count()
    return hits / total if total else 1.0
