"""connected_components / canonicalize_near_dups — the cluster-collapse step
of the dedup pipeline (pairs → components → one canonical doc per cluster).

Shape coverage: star clusters (the LSH-typical case), a long chain (worst
diameter for min-label propagation — exercises multi-round convergence), two
separate components, isolated documents, and an empty pair list.
"""

from pyspark.sql import functions as F

from kermit_spark.ops.graph import canonicalize_near_dups, connected_components


def _cc_dict(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_two_components_and_star(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (10, 11)], "a int, b int"
    )
    got = _cc_dict(connected_components(pairs))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_chain_needs_multiple_rounds(spark):
    # 9-8, 8-7, ..., 2-1: diameter 8; min label must walk the whole chain
    pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 9)], "a int, b int")
    got = _cc_dict(connected_components(pairs))
    assert got == {i: 1 for i in range(1, 10)}


def test_max_iter_caps_rounds(spark):
    # with max_iter=1 the far end of the chain cannot have reached label 1
    pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 9)], "a int, b int")
    got = _cc_dict(connected_components(pairs, max_iter=1))
    assert got[2] == 1
    assert got[9] != 1


def test_canonicalize_flags_non_canonical_members(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id int")
    pairs = spark.createDataFrame([(2, 5), (5, 6)], "a int, b int")
    rows = {
        r["doc_id"]: (r["canonical_id"], r["is_duplicate"])
        for r in canonicalize_near_dups(docs, pairs).collect()
    }
    # cluster {2,5,6} canonicalizes to 2; everything else is its own canonical
    assert rows[2] == (2, False)
    assert rows[5] == (2, True)
    assert rows[6] == (2, True)
    for isolated in (1, 3, 4, 7):
        assert rows[isolated] == (isolated, False)


def test_canonicalize_empty_pairs(spark):
    docs = spark.createDataFrame([(1,), (2,)], "doc_id int")
    pairs = spark.createDataFrame([], "a int, b int")
    rows = canonicalize_near_dups(docs, pairs).collect()
    assert all(r["canonical_id"] == r["doc_id"] and not r["is_duplicate"] for r in rows)


def test_component_plan_shuffles_on_node_only(spark):
    # scale guard: the propagation join must not be a cartesian product
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a int, b int")
    plan = connected_components(pairs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# -- pagerank (integer fixed-point) -----------------------------------------


def _pagerank_python(edges, num_iters=3, damping_pct=85, scale=10**12):
    """Independent reference: the documented integer recurrence, computed
    with plain dicts — no Spark, no SQL."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    init = scale // n
    base = ((100 - damping_pct) * init) // 100
    outdeg = {}
    for a, _ in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
    rank = {v: init for v in nodes}
    for _ in range(num_iters):
        incoming = {}
        for a, b in edges:
            incoming[b] = incoming.get(b, 0) + rank[a] // outdeg[a]
        rank = {
            v: base + (damping_pct * incoming.get(v, 0)) // 100 for v in nodes
        }
    return rank


def test_pagerank_matches_python_reference(spark):
    from kermit_spark.ops.graph import pagerank

    # a hub (1 -> everyone) plus a cycle and a dangling node (6 has no
    # out-edges: its mass leaks, per the documented semantics)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (3, 1), (4, 5), (5, 1), (3, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_fp"] for r in pagerank(df, num_iters=4).collect()}
    assert got == _pagerank_python(edges, num_iters=4)
    # sanity: the cycle hub 1 outranks the dangler 6
    assert got[1] > got[6]


def test_pagerank_bit_identical_across_partitionings(spark):
    from kermit_spark.ops.graph import pagerank

    # fixed-point arithmetic promise: same bits regardless of partition count
    edges = [(i, (i * 7 + 1) % 97) for i in range(97)] + [
        (i, (i * 13 + 3) % 97) for i in range(97)
    ]
    base = None
    for parts in (1, 7):
        df = spark.createDataFrame(edges, "src long, dst long").repartition(parts)
        got = sorted(pagerank(df, num_iters=3).collect())
        if base is None:
            base = got
        else:
            assert got == base
    assert {r["node"] for r in base} == set(range(97))


def test_pagerank_total_mass_bounded(spark):
    from kermit_spark.ops.graph import pagerank

    # floor divisions only ever drop mass: sum(rank) <= scale always holds,
    # which is the no-BIGINT-overflow argument in the docstring
    edges = [(i, j) for i in range(12) for j in (2 * i % 12, (3 * i + 1) % 12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    total = (
        pagerank(df, num_iters=5)
        .agg(F.sum("rank_fp").alias("s"))
        .collect()[0]["s"]
    )
    assert 0 < total <= 10**12


def test_anchor_text_stats_counts_and_top_anchor(spark):
    """Inlink totals, distinct source docs, most-frequent anchor with
    lexicographic tie-break, null anchors excluded from the top pick."""
    from kermit_spark.ops.graph import anchor_text_stats

    rows = [
        ("http://a/1", [("link", "home", "http://t/h", 0),
                        ("link", "Home", "http://t/h", 1),
                        ("text", "prose", None, 2)]),
        ("http://a/2", [("link", "home", "http://t/h", 0),
                        ("link", None, "http://t/h", 1)]),
        ("http://a/3", [("link", "zz", "http://t/tie", 0),
                        ("link", "aa", "http://t/tie", 1)]),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    got = {r["url"]: r for r in anchor_text_stats(df, clean=False).collect()}
    h = got["http://t/h"]
    assert (h["n_inlinks"], h["n_docs"], h["top_anchor"], h["top_anchor_n"]) == (4, 2, "home", 2)
    # tie at n=1: lexicographically smallest anchor wins
    assert got["http://t/tie"]["top_anchor"] == "aa"


def test_anchor_text_stats_cleans_relative_hrefs(spark):
    """clean=True canonicalizes hrefs against the page URL via the engine's
    clean_urls — relative and absolute forms of the same target aggregate
    into one row."""
    from kermit_spark.ops.graph import anchor_text_stats

    rows = [
        ("http://t.test/a/1.html", [("link", "x", "/p.html", 0)]),
        ("http://t.test/b/2.html", [("link", "x", "http://t.test/p.html", 0)]),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = anchor_text_stats(df, clean=True).collect()
    assert len(out) == 1
    assert out[0]["n_inlinks"] == 2 and out[0]["n_docs"] == 2


# -- HITS (integer fixed-point) -----------------------------------------------


def _hits_python(edges, num_iters, scale=10**6):
    """Independent single-threaded mirror of ops.graph.hits semantics."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    init = scale // len(nodes)
    hub = {n: init for n in nodes}
    auth = {n: 0 for n in nodes}

    def norm(raw):
        t = sum(raw.values())
        if t <= 0:
            return {n: 0 for n in raw}
        return {n: (v * scale) // t for n, v in raw.items()}

    for _ in range(num_iters):
        raw_a = {n: 0 for n in nodes}
        for u, v in edges:
            raw_a[v] += hub[u]
        auth = norm(raw_a)
        raw_h = {n: 0 for n in nodes}
        for u, v in edges:
            raw_h[u] += auth[v]
        hub = norm(raw_h)
    return {n: (auth[n], hub[n]) for n in nodes}


def test_hits_matches_python_reference(spark):
    from kermit_spark.ops.graph import hits

    # directory page 1 links to content pages; 6 is isolated-ish (dangling
    # authority with no out-edges: hub 0)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (3, 1), (4, 5), (5, 1), (3, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["auth_fp"], r["hub_fp"]) for r in hits(df, num_iters=3).collect()
    }
    assert got == _hits_python(edges, num_iters=3)
    # the directory page is the best hub; its targets beat it as authorities
    assert got[1][1] == max(v[1] for v in got.values())
    assert got[3][0] > got[1][0]
    assert got[6][1] == 0  # no out-edges -> zero hub


def test_hits_bit_identical_across_partitionings(spark):
    from kermit_spark.ops.graph import hits

    edges = [(i, (i * 11 + 3) % 89) for i in range(89)] + [
        (i, (i * 5 + 2) % 89) for i in range(89)
    ]
    base = None
    for parts in (1, 7):
        df = spark.createDataFrame(edges, "src long, dst long").repartition(parts)
        got = sorted(hits(df, num_iters=2).collect())
        if base is None:
            base = got
        else:
            assert got == base


def test_hits_l1_mass_bounded(spark):
    from kermit_spark.ops.graph import hits

    edges = [(i, j) for i in range(10) for j in ((2 * i + 1) % 10, (i * 3) % 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = hits(df, num_iters=4).agg(
        F.sum("auth_fp").alias("a"), F.sum("hub_fp").alias("h")
    ).collect()[0]
    # L1 scaling floors: totals never exceed scale
    assert 0 < row["a"] <= 10**6
    assert 0 < row["h"] <= 10**6


def _opic_python(edges, num_iters, scale=10**6):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    out = {u: 0 for u in nodes}
    for a, _ in edges:
        out[a] += 1
    cash = {u: scale // n for u in nodes}
    hist = {u: 0 for u in nodes}
    pot = scale - n * (scale // n)
    for _ in range(num_iters):
        share = {u: (cash[u] // out[u] if out[u] else 0) for u in nodes}
        rem = {u: cash[u] - out[u] * share[u] for u in nodes}
        carry = pot + sum(rem.values())
        base, pot = carry // n, carry % n
        new_cash = {u: base for u in nodes}
        for a, b in edges:
            new_cash[b] += share[a]
        for u in nodes:
            hist[u] += cash[u]
        cash = new_cash
    return {u: (hist[u], cash[u]) for u in nodes}


def test_opic_matches_python_reference(spark):
    from kermit_spark.ops.graph import opic

    # hub + cycle + dangling node (6): dangling cash must recirculate via
    # the pot, not leak
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (3, 1), (4, 5), (5, 1), (3, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["hist_fp"], r["cash_fp"]) for r in opic(df, num_iters=4).collect()}
    assert got == _opic_python(edges, num_iters=4)
    # the cycle hub accumulates more history than the dangler
    assert got[1][0] > got[6][0]


def test_opic_mass_conserved_and_partition_stable(spark):
    from kermit_spark.ops.graph import opic

    edges = [(i, (i * 7 + 1) % 53) for i in range(53)] + [
        (i, (i * 11 + 5) % 53) for i in range(53)
    ]
    base = None
    for parts in (1, 5):
        df = spark.createDataFrame(edges, "src long, dst long").repartition(parts)
        rows = sorted(opic(df, num_iters=3).collect())
        if base is None:
            base = rows
        else:
            assert rows == base  # bit-identical across partitionings
    # invariant: all circulating cash + pot == scale, so sum(cash) <= scale
    # and the per-round banked history sums to round * scale minus pot drift
    total_cash = sum(r["cash_fp"] for r in base)
    assert 10**6 - 53 < total_cash <= 10**6


def _trustrank_python(edges, seeds, num_iters, d=85, scale=10**12):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    s = len(seeds)
    out = {u: 0 for u in nodes}
    for a, _ in edges:
        out[a] += 1
    init = scale // s
    tele = (((100 - d) * scale) // 100) // s
    rank = {u: (init if u in seeds else 0) for u in nodes}
    for _ in range(num_iters):
        inc = {u: 0 for u in nodes}
        for a, b in edges:
            inc[b] += rank[a] // out[a]
        rank = {
            u: (tele if u in seeds else 0) + (d * inc[u]) // 100 for u in nodes
        }
    return rank


def test_trustrank_matches_python_and_zeroes_spam(spark):
    from kermit_spark.ops.graph import trustrank

    # trusted cluster 1-2-3; spam farm 10<->11<->12 linking to itself and
    # pointing AT the trusted cluster (classic rank-leech) but unreachable
    # FROM the seeds
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10),
             (10, 1), (11, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["trust_fp"] for r in trustrank(df, seeds, num_iters=4).collect()}
    assert got == _trustrank_python(edges, {1}, num_iters=4)
    # spam farm holds exactly zero trust; the seed cluster holds plenty
    assert got[10] == got[11] == got[12] == 0
    assert min(got[1], got[2], got[3]) > 0


# -- star-contraction connected components -----------------------------------


def _union_find_cc(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # second pass: canonical min label per component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def test_star_cc_matches_union_find_on_random_graphs(spark):
    import random

    from kermit_spark.ops.graph import connected_components_star

    rng = random.Random(13)
    for trial in range(3):
        n = 60
        edges = list(
            {
                (rng.randrange(n), rng.randrange(n))
                for _ in range(40 + trial * 30)
            }
        )
        nodes = sorted({x for e in edges for x in e})
        pairs = spark.createDataFrame(edges, "a int, b int")
        got = _cc_dict(connected_components_star(pairs))
        assert got == _union_find_cc(edges, nodes), trial


def test_star_cc_long_path_converges_in_log_rounds(spark):
    """The whole point of star contraction: a 300-node path has diameter
    299, far beyond min-label's budget — star contraction closes it within
    max_iter=12 ≈ O(log n) alternations."""
    from kermit_spark.ops.graph import connected_components_star

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "a int, b int"
    )
    got = _cc_dict(connected_components_star(pairs, max_iter=12))
    assert got == {i: 0 for i in range(301)}


def test_star_cc_agrees_with_min_label_on_lsh_shapes(spark):
    from kermit_spark.ops.graph import connected_components_star

    # star/clique shapes (what banded LSH emits) + an isolated pair +
    # a self-loop that must not create a phantom component
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (10, 11), (7, 7), (20, 21), (21, 22)]
    pairs = spark.createDataFrame(edges, "a int, b int")
    star = _cc_dict(connected_components_star(pairs))
    label = _cc_dict(connected_components(pairs))
    # min-label keeps self-loop node 7 (it appears in pairs); star must too
    assert star == label
    assert star[7] == 7


def test_star_cc_partition_invariance(spark):
    from kermit_spark.ops.graph import connected_components_star

    edges = [(i, (i * 7 + 3) % 40) for i in range(40) if i != (i * 7 + 3) % 40]
    pairs = spark.createDataFrame(edges, "a int, b int")
    a = _cc_dict(connected_components_star(pairs.repartition(1)))
    b = _cc_dict(connected_components_star(pairs.repartition(13)))
    assert a == b


def test_canonicalize_star_algorithm_equals_label(spark):
    import pytest

    from kermit_spark.ops.graph import canonicalize_near_dups

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id int")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (7, 8)], "a int, b int"
    )
    label = sorted(map(tuple, canonicalize_near_dups(docs, pairs).collect()))
    star = sorted(
        map(tuple, canonicalize_near_dups(docs, pairs, algorithm="star").collect())
    )
    assert label == star
    with pytest.raises(ValueError):
        canonicalize_near_dups(docs, pairs, algorithm="bogus")


def _weighted_pr_python(edges, num_iters, scale=10**12, d=85):
    """Python mirror of the weighted integer recurrence."""
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    init = scale // len(nodes)
    base = ((100 - d) * init) // 100
    sum_w = {}
    for u, _, w in edges:
        sum_w[u] = sum_w.get(u, 0) + w
    rank = {n: init for n in nodes}
    for _ in range(num_iters):
        incoming = {n: 0 for n in nodes}
        for u, v, w in edges:
            incoming[v] += (rank[u] * w) // sum_w[u]
        rank = {n: base + (d * incoming[n]) // 100 for n in nodes}
    return rank


def test_pagerank_weighted_matches_python_reference(spark):
    from kermit_spark.ops.graph import pagerank

    edges = [(1, 2, 5), (1, 3, 1), (2, 3, 2), (3, 1, 4), (3, 2, 1)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank(df, num_iters=4, weight_col="w").collect()
    }
    assert got == _weighted_pr_python(edges, num_iters=4)
    # weight sensitivity: node 2 receives 5/6 of node 1's mass, node 3 only
    # 1/6 + 2/... — an UNWEIGHTED run must produce a different profile
    unw = {
        r["node"]: r["rank_fp"] for r in pagerank(df, num_iters=4).collect()
    }
    assert got != unw


def test_host_graph_rollup(spark):
    from kermit_spark.ops.graph import host_graph

    links = spark.createDataFrame(
        [
            ("http://a.test/1", "http://b.test/x"),
            ("http://a.test/2", "http://b.test/y"),   # same host pair -> weight 2
            ("http://a.test/1", "http://A.TEST/self"),  # intra-host (case-folded)
            ("http://b.test:8080/p", "http://b.test/q"),  # port kept: distinct hosts
            ("http://a.test/3", "http://c.test/z"),
        ],
        "referer string, url string",
    )
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_graph(links).collect()
    }
    assert got == {
        ("a.test", "b.test"): 2,
        ("b.test:8080", "b.test"): 1,
        ("a.test", "c.test"): 1,
    }
    # keep_self variant retains the intra-host edge
    with_self = host_graph(links, drop_self=False).count()
    assert with_self == 4


def test_trustrank_weighted_matches_python_reference(spark):
    """Weighted trust flow (the host-graph setting of the TrustRank
    paper): contrib floored per edge as (rank*w)//sum_w; unreachable
    nodes still score exactly 0."""
    from kermit_spark.ops.graph import trustrank

    edges = [(1, 2, 3), (1, 3, 1), (2, 4, 2), (5, 6, 7)]  # 5,6 unreachable from seed 1
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["trust_fp"]
        for r in trustrank(df, seeds, num_iters=3, weight_col="w").collect()
    }

    scale, d = 10**12, 85
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    init = scale // 1
    tele = (((100 - d) * scale) // 100) // 1
    sum_w = {}
    for u, _, w in edges:
        sum_w[u] = sum_w.get(u, 0) + w
    rank = {n: (init if n == 1 else 0) for n in nodes}
    for _ in range(3):
        inc = {n: 0 for n in nodes}
        for u, v, w in edges:
            inc[v] += (rank[u] * w) // sum_w[u]
        rank = {n: (tele if n == 1 else 0) + (d * inc[n]) // 100 for n in nodes}
    assert got == rank
    assert got[5] == 0 and got[6] == 0
    # weight sensitivity: 2 gets 3/4 of the seed's flow, 3 only 1/4
    assert got[2] > got[3]


def test_weighted_ranker_rejects_zero_weight_sums(spark):
    """A src whose weights sum to 0 must FAIL LOUDLY (raise_error guard),
    not silently drop the node's outgoing mass via NULL division."""
    import pytest

    from kermit_spark.ops.graph import pagerank

    df = spark.createDataFrame([(1, 2, 0)], "src long, dst long, w long")
    with pytest.raises(Exception, match="weight_col sums"):
        pagerank(df, num_iters=1, weight_col="w").collect()
