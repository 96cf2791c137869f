"""Dedup operator family: exact, MinHash+LSH, n-gram Jaccard, SimHash,
embedding-cosine near-dup."""

import pytest
from pyspark.sql import functions as F

from kermit_spark.ops.dedup import (
    add_minhash,
    embedding_near_dups,
    exact_dedup,
    lsh_candidates,
    minhash_near_dups,
    ngram_jaccard,
    simhash,
    simhash_candidates,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the late afternoon sun"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1
        (3, BASE.replace("lazy", "sleepy")),  # near dup of 1
        (4, "completely different content about spark shuffle partitions and bloom filters"),
        (5, "unrelated short text"),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_exact_dedup(spark, docs):
    out = {r["keep_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert out[1] == 2  # ids 1,2 collapse
    assert out[3] == 1 and out[4] == 1 and out[5] == 1


def test_ngram_jaccard_exact_value(spark, docs):
    sigs = add_minhash(docs, "text", k=5)
    pairs = spark.createDataFrame([(1, 3)], "a long, b long")
    got = ngram_jaccard(pairs, sigs, "id").first()
    # python oracle
    def sh(t):
        return {t[i : i + 5] for i in range(max(len(t) - 4, 1))}
    a, b = sh(BASE), sh(BASE.replace("lazy", "sleepy"))
    want = round(len(a & b) / len(a | b), 6)
    assert got["jaccard"] == pytest.approx(want, abs=1e-6)


def test_minhash_near_dups_finds_near_and_exact(docs):
    out = {(r["a"], r["b"]): r["jaccard"] for r in minhash_near_dups(docs, threshold=0.5).collect()}
    assert (1, 2) in out and out[(1, 2)] == 1.0
    assert (1, 3) in out and 0.5 < out[(1, 3)] < 1.0
    assert all(4 not in pair and 5 not in pair for pair in out)


def test_lsh_candidates_no_self_or_reversed_pairs(docs):
    sigs = add_minhash(docs, "text")
    pairs = lsh_candidates(sigs, "id").collect()
    assert all(r["a"] < r["b"] for r in pairs)


def test_simhash_deterministic_and_near(spark, docs):
    one = docs.filter("id = 1").select(simhash(F.col("text")).alias("s")).first()["s"]
    two = docs.filter("id = 2").select(simhash(F.col("text")).alias("s")).first()["s"]
    assert one == two
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_candidates(docs, max_hamming=6).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and 0 < pairs[(1, 3)] <= 6
    assert (1, 4) not in pairs


def test_embedding_near_dups(spark):
    base = [1.0, 0.2, -0.3, 0.8, 0.1, -0.5, 0.4, 0.9]
    near = [x + 0.01 for x in base]
    ortho = [-0.9, 0.5, 0.7, -0.2, 0.3, 0.8, -0.6, 0.1]
    emb = spark.createDataFrame(
        [(1, base), (2, near), (3, ortho)], "id long, embedding array<double>"
    )
    out = {(r["a"], r["b"]): r["cosine"] for r in embedding_near_dups(emb, threshold=0.95).collect()}
    assert (1, 2) in out and out[(1, 2)] > 0.99
    assert (1, 3) not in out and (2, 3) not in out


def test_embedding_near_dups_bucket_cap_bounds_pairs(spark):
    """A cluster of B near-identical embeddings — exactly the dedup workload —
    lands in ONE sign-bucket; without the max_bucket cap that is B(B-1)/2
    pairs. The cap keeps the lowest-id members, bounding the pair count."""
    import pyspark.sql.functions as F

    n = 1000
    base = [1.0, 0.2, -0.3, 0.8, 0.1, -0.5, 0.4, 0.9]
    emb = spark.range(n).select(
        F.col("id"),
        F.array(*[F.lit(x) + F.col("id").cast("double") * 1e-6 for x in base]).alias(
            "embedding"
        ),
    )
    cap = 50
    out = embedding_near_dups(emb, threshold=0.99, max_bucket=cap).collect()
    assert 0 < len(out) <= cap * (cap - 1) // 2
    # capped buckets keep the deterministically-first (lowest) ids
    ids = {r["a"] for r in out} | {r["b"] for r in out}
    assert max(ids) < cap
    # uncapped on a small slice still yields the full pair set
    small = embedding_near_dups(emb.filter(F.col("id") < 10), threshold=0.99, max_bucket=None)
    assert small.count() == 10 * 9 // 2


def test_ngram_contamination_detects_buried_eval(spark):
    """A short eval doc buried verbatim inside a long training doc must be
    flagged (containment 1.0) even though its Jaccard vs the page is tiny;
    unrelated pairs stay below threshold; the eval side is broadcast."""
    from kermit_spark.ops.dedup import ngram_contamination

    eval_text = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"filler{i} paragraph token" for i in range(80))
    train = spark.createDataFrame(
        [
            (1, filler + " " + eval_text + " " + filler),  # contaminated
            (2, filler + " entirely unrelated training content " + filler),
            (3, eval_text),  # exact copy
        ],
        "id long, text string",
    )
    evals = spark.createDataFrame([(100, eval_text)], "eval_id long, text string")
    out = ngram_contamination(train, evals, k=5, threshold=0.8)
    rows = {(r["train_id"], r["eval_id"]): r for r in out.collect()}
    assert set(rows) == {(1, 100), (3, 100)}
    assert rows[(1, 100)]["containment"] == 1.0
    assert rows[(3, 100)]["containment"] == 1.0
    # jaccard of the buried pair really is tiny — the op is not dedup
    from kermit_spark.ops.dedup import shingles
    import pyspark.sql.functions as F

    sets = {
        r["id"]: set(r["s"])
        for r in train.select("id", shingles(F.col("text"), 5).alias("s")).collect()
    }
    ev_set = set(
        evals.select(shingles(F.col("text"), 5).alias("s")).collect()[0]["s"]
    )
    jac = len(sets[1] & ev_set) / len(sets[1] | ev_set)
    assert jac < 0.2
    # plan: the eval side must broadcast (no shuffle of the train shingles
    # onto eval keys)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_paragraph_dedup_first_occurrence_wins(spark):
    """Corpus-wide: a paragraph survives only at its smallest (id, pos);
    docs whose every paragraph was deduped away drop out; survivors are
    stitched back in original order with counts."""
    from kermit_spark.ops.dedup import paragraph_dedup

    rows = [
        (1, "alpha\n\nshared\n\nbeta"),
        (2, "shared\n\ngamma"),
        (3, "shared"),           # fully deduped -> dropped
        (4, "alpha\n\nalpha"),   # both copies lose to doc 1 -> dropped
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r for r in paragraph_dedup(df).collect()}
    assert set(got) == {1, 2}
    assert got[1]["text"] == "alpha\n\nshared\n\nbeta"
    assert (got[1]["n_kept"], got[1]["n_removed"]) == (3, 0)
    assert got[2]["text"] == "gamma"
    assert (got[2]["n_kept"], got[2]["n_removed"]) == (1, 1)


def test_paragraph_dedup_deterministic_across_partitionings(spark):
    """The winner pick is (id, pos)-min, not partition order: same result
    at 1 and 8 partitions."""
    from kermit_spark.ops.dedup import paragraph_dedup
    from pyspark.sql import functions as F

    df = spark.range(200).select(
        F.col("id"),
        F.concat(
            F.lit("boiler "), F.pmod("id", F.lit(3)).cast("string"),
            F.lit("\n\nuniq "), F.col("id").cast("string"),
        ).alias("text"),
    )
    a = sorted(map(tuple, paragraph_dedup(df.repartition(1)).collect()))
    b = sorted(map(tuple, paragraph_dedup(df.repartition(8)).collect()))
    assert a == b
    # each boiler paragraph survives exactly once, in ids 0,1,2
    boiler_keepers = [t for t in a if "boiler" in t[1]]
    assert sorted(t[0] for t in boiler_keepers) == [0, 1, 2]


# ---------------------------------------------------------------------------
# exact substring dedup (Lee et al. 2022 rolling-window form)
# ---------------------------------------------------------------------------


def test_substring_dup_spans_exact_shared_passage(spark):
    """A passage shared verbatim by two docs comes back as ONE maximal span
    per doc whose character range slices out exactly the shared text."""
    from kermit_spark.ops.dedup import substring_dup_spans

    # boundary chars differ between the two docs (A/B vs C/D) so the maximal
    # shared substring is EXACTLY `shared` — no accidental shared spaces
    shared = "the quick brown fox jumps over the lazy dog once more"
    rows = [
        (1, "alpha opener wordsA" + shared + "Bclosing run one"),
        (2, "beta start tokens leadC" + shared + "Dending here two"),
        (3, "gamma has nothing in common with the others at all, honest"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = substring_dup_spans(df, k=20).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    assert 3 not in by_id
    for doc_id, text in [(1, rows[0][1]), (2, rows[1][1])]:
        spans = by_id[doc_id]
        assert len(spans) == 1
        s = spans[0]
        assert text[s["span_start"] : s["span_end"]] == shared
        assert s["n_windows"] == len(shared) - 20 + 1


def test_substring_dup_spans_two_islands_and_stride(spark):
    """Two separate shared passages merge into two distinct spans; stride>1
    still covers each passage with one (coarser) span."""
    from kermit_spark.ops.dedup import substring_dup_spans

    p1 = "first shared passage body goes here ok"
    p2 = "second shared block with different words"
    d1 = p1 + "Axxxx middle unique to oneB" + p2
    d2 = "yy openerC" + p1 + "Dzz unrelated fillerE" + p2 + "Ftail"
    df = spark.createDataFrame([(1, d1), (2, d2)], "id long, text string")

    out = {r["id"]: [] for r in substring_dup_spans(df, k=20).collect()}
    for r in substring_dup_spans(df, k=20).collect():
        out[r["id"]].append((r["span_start"], r["span_end"]))
    assert len(out[1]) == 2 and len(out[2]) == 2
    # spans slice exactly the two passages in doc 1
    got = sorted(d1[a:b] for a, b in out[1])
    assert got == sorted([p1, p2])

    # content-keyed stride: both docs sample the SAME relative windows of a
    # shared passage, so the island structure (sizes, window counts) is
    # identical across the two docs even though absolute offsets differ
    coarse = substring_dup_spans(df, k=20, stride=3).collect()
    shape = {1: [], 2: []}
    for r in coarse:
        shape[r["id"]].append((r["span_end"] - r["span_start"], r["n_windows"]))
    assert shape[1] and sorted(shape[1]) == sorted(shape[2])
    # sampling keeps ~1/3 of the full-stride windows
    full = sum(r["n_windows"] for r in substring_dup_spans(df, k=20).collect())
    kept = sum(r["n_windows"] for r in coarse)
    assert 0 < kept < full


def test_substring_dup_spans_partition_invariant(spark):
    from pyspark.sql import functions as F

    from kermit_spark.ops.dedup import substring_dup_spans

    df = spark.range(60).select(
        F.col("id"),
        F.concat(
            F.lit("shared boilerplate sentence that recurs across docs "),
            F.pmod("id", F.lit(4)).cast("string"),
            F.lit(" unique suffix "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    a = sorted(map(tuple, substring_dup_spans(df.repartition(1), k=16).collect()))
    b = sorted(map(tuple, substring_dup_spans(df.repartition(8), k=16).collect()))
    assert a == b and len(a) == 60  # every doc shares its residue-group prefix


def _mini_corpus(spark, ids, base="the quick brown fox jumps over the lazy dog "):
    rows = [(i, base * 3 + f"tail variant {i % 4}") for i in ids]
    return spark.createDataFrame(rows, "id long, text string")


def test_minhash_index_matches_batch_when_uncapped(spark, tmp_path):
    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.ops.dedup import (
        add_minhash,
        build_minhash_index,
        lsh_candidates,
        minhash_index_near_dups,
        ngram_jaccard,
    )

    old = _mini_corpus(spark, range(0, 12))
    new = _mini_corpus(spark, range(100, 108))
    cat = SnapshotCatalog(spark, str(tmp_path / "idx"))
    params = dict(k=5, num_hashes=8, num_bands=2, stride=2, max_bucket=None)
    build_minhash_index(cat, old, **params)
    got = {
        (r["new_id"], r["match_id"], round(r["jaccard"], 6))
        for r in minhash_index_near_dups(cat, new, **params).collect()
    }

    # batch pipeline over old ∪ new, restricted to pairs touching new
    both = old.unionByName(new)
    sigs = add_minhash(both, "text", k=5, num_hashes=8, stride=2)
    pairs = lsh_candidates(sigs, "id", num_bands=2, rows_per_band=4, max_bucket=None)
    verified = ngram_jaccard(pairs, sigs, "id")
    want = set()
    for r in verified.collect():
        a, b, j = r["a"], r["b"], round(r["jaccard"], 6)
        if b >= 100:  # pairs sorted a < b, so 'b' is the new-side id when mixed
            want.add((b, a, j) if a < 100 else (min(a, b), max(a, b), j))
    # incremental emits (new_id, match_id); normalize batch pairs the same way
    want = {
        ((n, m, j) if m < 100 else (min(n, m), max(n, m), j)) for (n, m, j) in want
    }
    got_norm = {
        ((n, m, j) if m < 100 else (min(n, m), max(n, m), j)) for (n, m, j) in got
    }
    assert got_norm == want
    assert any(m < 100 for _, m, _ in got)   # cross-corpus hits exist
    assert any(m >= 100 for _, m, _ in got)  # intra-increment hits exist


def test_extend_minhash_index_respects_bucket_cap(spark, tmp_path):
    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.ops.dedup import build_minhash_index, extend_minhash_index

    # every doc identical text -> all ids share every bucket
    old = spark.createDataFrame([(i, "same same same same same") for i in range(3)],
                                "id long, text string")
    new = spark.createDataFrame([(i, "same same same same same") for i in range(10, 16)],
                                "id long, text string")
    cat = SnapshotCatalog(spark, str(tmp_path / "idx2"))
    build_minhash_index(cat, old, k=5, num_hashes=8, num_bands=2, max_bucket=5)
    extend_minhash_index(cat, new, k=5, num_hashes=8, num_bands=2, max_bucket=5)
    rows = cat.read("mh_buckets").collect()
    per_bucket = {}
    for r in rows:
        per_bucket.setdefault((r["band"], r["band_sig"]), []).append(r["id"])
    for ids in per_bucket.values():
        assert len(ids) <= 5
        # lowest-id-first keep rule across increments: old 0-2 plus new 10,11
        assert sorted(ids) == [0, 1, 2, 10, 11]
