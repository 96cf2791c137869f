"""Similarity search: exact brute-force top-k vs a numpy oracle; LSH ANN
recall + contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kermit_spark.ops.similarity import brute_force_topk, lsh_topk, recall_at_k

N, DIM, K = 60, 16, 5


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(7)
    # three clusters so LSH has structure to find
    centers = rng.standard_normal((3, DIM)) * 3
    vecs = np.vstack([
        centers[i % 3] + rng.standard_normal(DIM) * 0.4 for i in range(N)
    ])
    return vecs


@pytest.fixture(scope="module")
def emb(spark, vectors):
    rows = [(i, [float(x) for x in vectors[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "id long, embedding array<double>").cache()


def _numpy_topk(vectors, qids, k):
    norms = np.linalg.norm(vectors, axis=1)
    out = {}
    for q in qids:
        scores = vectors @ vectors[q] / (norms * norms[q])
        scores = np.round(scores, 4)
        order = sorted(
            (i for i in range(N) if i != q), key=lambda i: (-scores[i], i)
        )
        out[q] = [(rank + 1, i, scores[i]) for rank, i in enumerate(order[:k])]
    return out


def test_brute_force_matches_numpy(spark, emb, vectors):
    qids = [0, 7, 23]
    queries = emb.filter(F.col("id").isin(qids))
    got = {}
    for r in brute_force_topk(emb, queries, k=K).collect():
        got.setdefault(r["query_id"], []).append((r["rnk"], r["neighbor_id"], r["score"]))
    want = _numpy_topk(vectors, qids, K)
    for q in qids:
        got[q].sort()
        assert [(rk, nid) for rk, nid, _ in got[q]] == [(rk, nid) for rk, nid, _ in want[q]]
        for (_, _, s_got), (_, _, s_want) in zip(got[q], want[q]):
            assert s_got == pytest.approx(s_want, abs=2e-4)


def test_lsh_recall_reasonable(spark, emb):
    queries = emb.filter(F.col("id") < 10)
    exact = brute_force_topk(emb, queries, k=K)
    approx = lsh_topk(emb, queries, k=K, num_planes=6)
    r = recall_at_k(exact, approx)
    assert r >= 0.5, f"LSH recall too low: {r}"


def test_topk_contract(spark, emb):
    queries = emb.filter(F.col("id") < 3)
    out = brute_force_topk(emb, queries, k=K).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        ranks = sorted(r["rnk"] for r in rows)
        assert ranks == list(range(1, K + 1))
        assert all(r["neighbor_id"] != q for r in rows)
        ordered = sorted(rows, key=lambda r: r["rnk"])
        scores = [r["score"] for r in ordered]
        assert scores == sorted(scores, reverse=True)


def test_ivf_topk_recall_and_contract(spark, emb, vectors):
    """IVF with enough probes recovers most of the exact top-k on clustered
    data; output contract matches the other ANN paths (query_id, rnk,
    neighbor_id, score), ranks dense from 1, deterministic across runs."""
    from kermit_spark.ops.similarity import ivf_topk

    queries = emb.filter(F.col("id") < 6)
    exact = brute_force_topk(emb, queries, k=K)
    approx = ivf_topk(emb, queries, k=K, n_centroids=8, n_probe=4)
    rows = approx.collect()
    assert {r["query_id"] for r in rows} == set(range(6))
    for q in range(6):
        ranks = sorted(r["rnk"] for r in rows if r["query_id"] == q)
        assert ranks == list(range(1, len(ranks) + 1))
    assert recall_at_k(exact, approx) >= 0.6
    # deterministic: same result on a second evaluation (seedless quantizer)
    again = ivf_topk(emb, queries, k=K, n_centroids=8, n_probe=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ivf_full_probe_equals_exact(spark, emb):
    """Probing EVERY cell degenerates IVF to the exact search — recall 1.0
    (the correctness anchor for the cell partitioning: no vector is lost)."""
    from kermit_spark.ops.similarity import ivf_topk

    queries = emb.filter(F.col("id") < 4)
    exact = brute_force_topk(emb, queries, k=K)
    full = ivf_topk(emb, queries, k=K, n_centroids=8, n_probe=8)
    assert recall_at_k(exact, full) == 1.0


def test_ivf_index_matches_transient_ivf(spark, emb, tmp_path):
    """The persistent index (build_ivf_index + ivf_index_topk) returns the
    EXACT same result as the transient ivf_topk — same centroids,
    assignments, probes, scores — while reading only probed cells."""
    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.ops.similarity import build_ivf_index, ivf_index_topk, ivf_topk

    queries = emb.filter(F.col("id") < 8)
    transient = sorted(
        tuple(r) for r in ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3).collect()
    )
    cat = SnapshotCatalog(spark, str(tmp_path / "ivf"))
    build_ivf_index(cat, emb, n_centroids=8)
    indexed = sorted(
        tuple(r) for r in ivf_index_topk(cat, queries, k=5, n_probe=3).collect()
    )
    assert indexed == transient
    # the probe scan is partition-pruned: fewer probed cells than centroids
    # means a filtered read plan with a p-restricted PartitionFilters set
    probes = ivf_index_topk(cat, queries.limit(1), k=5, n_probe=2)
    plan = probes._sc._jvm.PythonSQLUtils.explainString(
        probes._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan


def test_ivf_kmeans_centroids_recall(spark, emb, tmp_path):
    """The kmeans quantizer option builds a working index whose recall@k vs
    exact brute force beats random probing on clustered data."""
    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.ops.similarity import (
        build_ivf_index,
        brute_force_topk,
        ivf_index_topk,
        recall_at_k,
    )

    queries = emb.filter(F.col("id") < 10)
    cat = SnapshotCatalog(spark, str(tmp_path / "ivf_km"))
    build_ivf_index(cat, emb, n_centroids=6, centroids="kmeans")
    approx = ivf_index_topk(cat, queries, k=K, n_probe=2)
    exact = brute_force_topk(emb, queries, k=K)
    r = recall_at_k(exact, approx)
    # 3 natural clusters, 6 cells, 2 probes: the data-adaptive quantizer
    # should recover most exact neighbors
    assert r >= 0.6, r


# ---------------------------------------------------------------------------
# semdedup
# ---------------------------------------------------------------------------


def test_semdedup_drops_near_identical_keeps_lowest_id(spark, emb, vectors):
    from kermit_spark.ops.similarity import semdedup

    # append exact copies of vectors 0 and 1 under higher ids
    dup_rows = [(100, [float(x) for x in vectors[0]]),
                (101, [float(x) for x in vectors[1]])]
    dups = spark.createDataFrame(dup_rows, "id long, embedding array<double>")
    corpus = emb.unionByName(dups)
    out = {r["id"]: r for r in semdedup(corpus, n_clusters=4, threshold=0.999).collect()}
    assert len(out) == N + 2                       # one row per input row
    assert out[0]["keep"] and out[1]["keep"]       # originals (lowest ids) kept
    assert not out[100]["keep"] and not out[101]["keep"]
    # an exact copy lands in the SAME cell as its original
    assert out[100]["cell"] == out[0]["cell"]


def test_semdedup_threshold_monotone_and_validates(spark, emb):
    from kermit_spark.ops.similarity import semdedup

    strict = semdedup(emb, n_clusters=4, threshold=0.999)
    loose = semdedup(emb, n_clusters=4, threshold=0.8)
    n_strict = strict.filter("NOT keep").count()
    n_loose = loose.filter("NOT keep").count()
    assert n_strict <= n_loose
    with pytest.raises(ValueError):
        semdedup(emb, threshold=0.0)
    with pytest.raises(ValueError):
        semdedup(emb, n_clusters=0)
    with pytest.raises(ValueError):
        semdedup(emb, max_cluster=0)


def test_semdedup_max_cluster_bounds_droppers(spark):
    """With max_cluster=1 only the single lowest id per cell can cause
    drops — a chain of identicals loses everyone but the pool member."""
    from kermit_spark.ops.similarity import semdedup

    vec = [1.0] * 8
    rows = [(i, vec) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    out = semdedup(df, n_clusters=2, threshold=0.99, max_cluster=1)
    kept = sorted(r["id"] for r in out.filter("keep").collect())
    assert kept == [0]                 # id 0 is the pool; everyone else drops
    # uncapped gives the same answer here (all pairwise identical)
    out2 = semdedup(df, n_clusters=2, threshold=0.99, max_cluster=None)
    assert sorted(r["id"] for r in out2.filter("keep").collect()) == [0]


def test_semdedup_plan_broadcasts_pool(spark, emb):
    """With the cap on, the verification join must broadcast the pool —
    the corpus side never shuffles for the join."""
    from kermit_spark.ops.similarity import semdedup

    plan = (
        semdedup(emb, n_clusters=4, threshold=0.95, max_cluster=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# random projection
# ---------------------------------------------------------------------------


def test_random_projection_matches_numpy_and_preserves_geometry(spark, emb, vectors):
    from kermit_spark.ops.dedup import _deterministic_planes
    from kermit_spark.ops.similarity import random_projection

    out_dim = 16
    out = {r["id"]: np.array(r["projected"])
           for r in random_projection(emb, out_dim=out_dim).collect()}
    planes = _deterministic_planes(out_dim, DIM)
    ref = vectors @ planes.T / np.sqrt(out_dim)
    for i in range(N):
        assert np.allclose(out[i], np.round(ref[i], 6), atol=1e-6)
    # JL: pairwise cosine roughly preserved on the clustered data
    rng = np.random.default_rng(3)
    errs = []
    for _ in range(40):
        a, b = rng.integers(0, N, 2)
        if a == b:
            continue
        cos = lambda x, y: x @ y / (np.linalg.norm(x) * np.linalg.norm(y))  # noqa: E731
        errs.append(abs(cos(vectors[a], vectors[b]) - cos(out[a], out[b])))
    assert np.mean(errs) < 0.15, np.mean(errs)


def test_random_projection_validates_and_zero_shuffle(spark, emb):
    from kermit_spark.ops.similarity import random_projection

    with pytest.raises(ValueError):
        random_projection(emb, out_dim=0)
    plan = (
        random_projection(emb, out_dim=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_pq_encode_and_adc_match_numpy(spark, emb, vectors):
    import hashlib

    from kermit_spark.ops.similarity import pq_codebooks, pq_encode, pq_topk

    m, ks = 4, 8
    sub = DIM // m
    books = pq_codebooks(emb, m=m, ks=ks)

    # numpy mirror: same md5(id)-smallest sample, same subvector split
    order = sorted(range(N), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    samp = [vectors[i] for i in order[:ks]]
    exp_books = [
        [[float(x) for x in v[s * sub : (s + 1) * sub]] for v in samp]
        for s in range(m)
    ]
    assert books == exp_books

    codes = {r["neighbor_id"]: r["codes"] for r in pq_encode(emb, books).collect()}

    def np_code(vec, s):
        dists = [
            float(np.sum((vec[s * sub : (s + 1) * sub] - np.array(c)) ** 2))
            for c in exp_books[s]
        ]
        return int(np.argmin(dists))  # argmin takes the first = lowest code

    for i in range(N):
        assert codes[i] == [np_code(vectors[i], s) for s in range(m)], i

    # ADC search mirror for 3 queries
    got = pq_topk(emb, emb.filter(F.col("id") < 3), k=K, m=m, ks=ks)
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            (r["rnk"], r["neighbor_id"], r["adc_dist"])
        )
    for q in range(3):
        dt = [
            [
                float(np.sum((vectors[q][s * sub : (s + 1) * sub] - np.array(c)) ** 2))
                for c in exp_books[s]
            ]
            for s in range(m)
        ]
        dist = {
            i: round(sum(dt[s][codes[i][s]] for s in range(m)), 4)
            for i in range(N)
            if i != q
        }
        exp = sorted(dist.items(), key=lambda kv: (kv[1], kv[0]))[:K]
        assert [(n, d) for _, n, d in sorted(by_q[q])] == exp, q


def test_pq_recall_vs_brute_force(spark, emb):
    from kermit_spark.ops.similarity import pq_topk, recall_at_k

    queries = emb.filter(F.col("id") < 10)
    exact = brute_force_topk(emb, queries, k=K)
    approx = pq_topk(emb, queries, k=K, m=4, ks=16).withColumnRenamed(
        "adc_dist", "score"
    )
    # clustered data: coarse 4x16 codes must still put most true neighbors
    # in the ADC top-k
    assert recall_at_k(exact, approx) >= 0.5


def test_pq_plan_and_validation(spark, emb):
    from kermit_spark.ops.similarity import pq_codebooks, pq_encode, pq_topk

    books = pq_codebooks(emb, m=4, ks=8)
    plan = pq_encode(emb, books)._jdf.queryExecution().executedPlan().toString()
    # encoding is one map-side codegen projection: no shuffle, no Python
    assert "Exchange" not in plan and "EvalPython" not in plan
    plan2 = (
        pq_topk(emb, emb.filter(F.col("id") < 2), k=3, m=4, ks=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # queries (with their distance tables) broadcast against the codes scan
    assert "BroadcastNestedLoopJoin" in plan2 or "BroadcastHashJoin" in plan2
    assert "EvalPython" not in plan2
    with pytest.raises(ValueError):
        pq_codebooks(emb, m=5, ks=8)   # 16 % 5 != 0
    with pytest.raises(ValueError):
        pq_codebooks(emb, m=0)
    with pytest.raises(ValueError):
        pq_codebooks(emb.limit(3), m=4, ks=8)


def test_ivfpq_full_probe_equals_pq(spark, emb):
    """n_probe == n_centroids probes every cell, so the IVF pruning is a
    no-op and IVF-PQ must equal plain PQ ADC exactly — the composition
    invariant that pins the two shared helpers together."""
    from kermit_spark.ops.similarity import ivf_pq_topk, pq_topk

    queries = emb.filter(F.col("id") < 5)
    full = sorted(map(tuple, pq_topk(emb, queries, k=K, m=4, ks=16).collect()))
    comp = sorted(
        map(
            tuple,
            ivf_pq_topk(
                emb, queries, k=K, n_centroids=8, n_probe=8, m=4, ks=16
            ).collect(),
        )
    )
    assert comp == full


def test_ivfpq_recall_and_plan(spark, emb):
    from kermit_spark.ops.similarity import brute_force_topk, ivf_pq_topk, recall_at_k

    queries = emb.filter(F.col("id") < 10)
    exact = brute_force_topk(emb, queries, k=K)
    approx = ivf_pq_topk(
        emb, queries, k=K, n_centroids=8, n_probe=4, m=4, ks=16
    ).withColumnRenamed("adc_dist", "score")
    # clustered data: pruned cells + coarse codes still find most neighbors
    assert recall_at_k(exact, approx) >= 0.4
    plan = (
        ivf_pq_topk(emb, emb.filter(F.col("id") < 2), k=3, n_centroids=8, n_probe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # probe set broadcast against the single-scan (cell, codes) projection
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_extend_ivf_index_equals_frozen_centroid_rebuild(spark, emb, vectors, tmp_path):
    """Incremental append: extending the index with new vectors must search
    identically to an index holding the union corpus under the SAME frozen
    centroids — and the untouched cells' files must not be rewritten."""
    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.ops.similarity import (
        build_ivf_index,
        extend_ivf_index,
        ivf_index_topk,
    )

    base = emb.filter(F.col("id") < 40)
    inc_rows = [(200 + i, [float(x) for x in vectors[40 + i]]) for i in range(10)]
    inc = spark.createDataFrame(inc_rows, "id long, embedding array<double>")
    queries = emb.filter(F.col("id") < 5)

    cat = SnapshotCatalog(spark, str(tmp_path / "a"))
    build_ivf_index(cat, base, n_centroids=8)
    extend_ivf_index(cat, inc)
    got = sorted(tuple(r) for r in ivf_index_topk(cat, queries, k=K, n_probe=3).collect())

    # independent numpy mirror: base's frozen md5-sample centroids, first-max
    # assignment of the UNION corpus, 3-cell probes, exact rounded cosine
    import hashlib

    base_ids = sorted(range(40), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[:8]
    cents = np.array([vectors[i] for i in base_ids])
    corpus = {i: vectors[i] for i in range(40)} | {200 + i: vectors[40 + i] for i in range(10)}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    def cell_of(v):
        sims = [cos(v, c) for c in cents]
        return int(np.argmax(sims))  # first max = lowest cell on ties

    cells = {i: cell_of(v) for i, v in corpus.items()}
    want = []
    for q in range(5):
        sims = [cos(vectors[q], c) for c in cents]
        probe = sorted(range(8), key=lambda c: (-sims[c], c))[:3]
        cand = [i for i, c in cells.items() if c in probe and i != q]
        scored = sorted(
            ((round(cos(vectors[q], corpus[i]), 4), i) for i in cand),
            key=lambda t: (-t[0], t[1]),
        )[:K]
        want += [(q, rk + 1, i, s) for rk, (s, i) in enumerate(scored)]
    assert got == sorted(want)
    # increment ids surface as true neighbors of their cluster
    assert any(r[2] >= 200 for r in got)
