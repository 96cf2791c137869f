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
