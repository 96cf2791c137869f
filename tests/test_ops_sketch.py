"""Count-Min + HyperLogLog sketches: python mirrors over the same md5 hash
family, merge laws, and estimate-accuracy bounds."""

import hashlib
import math


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_cms_build_and_estimate_match_python_mirror(spark):
    from kermit_spark.ops.sketch import cms_build, cms_estimate

    keys = [f"host{i % 7}.test" for i in range(200)] + ["rare.test"]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    depth, wd = 4, 3
    cms = cms_build(df, "key", depth=depth, width_digits=wd)

    # python mirror of the grid
    grid: dict[tuple[int, int], int] = {}
    for k in keys:
        for r in range(depth):
            col = int(_md5(f"{r}:{k}")[:wd], 16)
            grid[(r, col)] = grid.get((r, col), 0) + 1
    got_grid = {(r["row"], r["col"]): r["n"] for r in cms.collect()}
    assert got_grid == grid

    probe = spark.createDataFrame(
        [("host0.test",), ("rare.test",), ("absent.test",)], "key string"
    )
    est = {r["key"]: r["est"] for r in cms_estimate(cms, probe, "key", depth, wd).collect()}
    exact = {"host0.test": 29, "rare.test": 1, "absent.test": 0}
    for k, n in exact.items():
        assert est[k] >= n  # CMS never underestimates
        mirror = min(
            grid.get((r, int(_md5(f"{r}:{k}")[:wd], 16)), 0) for r in range(depth)
        )
        assert est[k] == mirror


def test_cms_merge_law(spark):
    from kermit_spark.ops.sketch import cms_build

    a = spark.createDataFrame([(f"k{i % 5}",) for i in range(50)], "key string")
    b = spark.createDataFrame([(f"k{i % 9}",) for i in range(90)], "key string")
    import pyspark.sql.functions as F

    merged = (
        cms_build(a, "key").unionByName(cms_build(b, "key"))
        .groupBy("row", "col").agg(F.sum("n").alias("n"))
    )
    direct = cms_build(a.unionByName(b), "key")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_hll_registers_mirror_and_estimate(spark):
    from kermit_spark.ops.sketch import hll_estimate, hll_registers

    n = 5000
    df = spark.createDataFrame(
        [(f"http://h{i % 97}.test/p/{i}",) for i in range(n)], "key string"
    )
    regs = hll_registers(df, "key")
    got = {r["bucket"]: r["max_rho"] for r in regs.collect()}

    mirror: dict[int, int] = {}
    for i in range(n):
        h = _md5(f"http://h{i % 97}.test/p/{i}")
        bucket = int(h[:2], 16)
        rest = h[2:14]
        p = next((j for j, c in enumerate(rest) if c != "0"), 12)
        if p == 12:
            rho = 49
        else:
            v = int(rest[p], 16)
            intra = 0 if v >= 8 else 1 if v >= 4 else 2 if v >= 2 else 3
            rho = 4 * p + intra + 1
        mirror[bucket] = max(mirror.get(bucket, 0), rho)
    assert got == mirror

    est = hll_estimate(regs)
    assert abs(est - n) / n < 0.15  # m=256 -> ~6.5% standard error


def _hdr_shift_py(v: int) -> int:
    from kermit_spark.ops.sketch import HDR_THRESHOLDS

    return sum(1 for t in HDR_THRESHOLDS if v >= t)


def test_hdr_build_matches_python_mirror(spark):
    from kermit_spark.ops.sketch import hdr_build

    vals = [0, 1, 2, 63, 64, 65, 100, 1000, 12345, 999_999,
            (1 << 40) + 7, 1 << 62, (1 << 62) + 12345, -5, None]
    df = spark.createDataFrame([(v,) for v in vals], "value bigint")
    got = sorted((r["shift"], r["sub"], r["n"]) for r in hdr_build(df).collect())

    mirror: dict[tuple[int, int], int] = {}
    for v in vals:
        if v is None or v < 0:  # excluded by contract
            continue
        s = _hdr_shift_py(v)
        mirror[(s, v >> s)] = mirror.get((s, v >> s), 0) + 1
    assert got == sorted((k[0], k[1], n) for k, n in mirror.items())
    # shift-0 cells are EXACT; every value < 2^(sub_bits+1) round-trips
    assert (0, 63, 1) in got and (0, 0, 1) in got


def test_hdr_merge_law_and_quantile_error_bound(spark):
    import random

    from kermit_spark.ops.sketch import (
        HDR_SUB_BITS, hdr_build, hdr_merge, hdr_quantiles,
    )

    random.seed(7)
    data = [random.randrange(0, 10**7) for _ in range(5000)] + [0] * 10
    whole = spark.createDataFrame([(v,) for v in data], "value bigint")
    half = len(data) // 2
    a = hdr_build(spark.createDataFrame([(v,) for v in data[:half]], "value bigint"))
    b = hdr_build(spark.createDataFrame([(v,) for v in data[half:]], "value bigint"))
    merged = sorted(map(tuple, hdr_merge(a, b).collect()))
    direct = sorted(map(tuple, hdr_build(whole).collect()))
    assert merged == direct

    qs = (0, 250_000, 500_000, 900_000, 990_000, 1_000_000)
    got = {r["q_ppm"]: r["est"] for r in hdr_quantiles(hdr_build(whole), qs).collect()}
    data_sorted = sorted(data)
    for q in qs:
        rank = 1 + (q * (len(data) - 1)) // 1_000_000
        true_v = data_sorted[rank - 1]
        est = got[q]
        # lower-bound estimate with bounded relative error (exact at shift 0)
        assert est <= true_v
        assert true_v - est <= max(0, est >> HDR_SUB_BITS) or true_v < (
            1 << (HDR_SUB_BITS + 1)
        )


def test_hdr_quantiles_validation_and_empty(spark):
    import pytest

    from kermit_spark.ops.sketch import hdr_build, hdr_quantiles

    empty = hdr_build(
        spark.createDataFrame([(-1,), (None,)], "value bigint")
    )
    assert hdr_quantiles(empty, (500_000,)).count() == 0
    with pytest.raises(ValueError):
        hdr_quantiles(empty, ())
    with pytest.raises(ValueError):
        hdr_quantiles(empty, (1_000_001,))
    with pytest.raises(ValueError):
        hdr_build(empty, sub_bits=3)


def _h48(s: str) -> int:
    return int(_md5(s)[:12], 16)


def _kmv_mirror(keys: list[str], k: int) -> list[int]:
    return sorted({_h48(x) for x in keys})[:k]


def test_kmv_build_matches_python_mirror(spark):
    from kermit_spark.ops.sketch import kmv_build

    rows = [(f"g{i % 3}", f"key{i % 40}") for i in range(300)]
    df = spark.createDataFrame(rows, "group string, key string")
    got = {r["group"]: list(r["hashes"]) for r in kmv_build(df, k=8).collect()}
    for g in ("g0", "g1", "g2"):
        keys = {key for grp, key in rows if grp == g}
        assert got[g] == _kmv_mirror(sorted(keys), 8)


def test_kmv_build_partial_sketch_and_validation(spark):
    import pytest

    from kermit_spark.ops.sketch import kmv_build

    df = spark.createDataFrame([("g", "a"), ("g", "b"), ("g", "a")],
                               "group string, key string")
    [row] = kmv_build(df, k=16).collect()
    assert sorted(row["hashes"]) == _kmv_mirror(["a", "b"], 16)
    assert len(row["hashes"]) == 2  # duplicates collapse, sketch stays partial
    with pytest.raises(ValueError):
        kmv_build(df, k=1)


def test_kmv_union_merge_law(spark):
    from kermit_spark.ops.sketch import kmv_build, kmv_union

    k = 12
    a_rows = [("g0", f"a{i}") for i in range(40)] + [("only_a", f"x{i}") for i in range(5)]
    b_rows = [("g0", f"b{i}") for i in range(40)] + [("only_b", f"y{i}") for i in range(30)]
    a = spark.createDataFrame(a_rows, "group string, key string")
    b = spark.createDataFrame(b_rows, "group string, key string")
    merged = kmv_union(kmv_build(a, k=k), kmv_build(b, k=k), k=k)
    direct = kmv_build(a.unionByName(b), k=k)
    got = {r["group"]: list(r["hashes"]) for r in merged.collect()}
    want = {r["group"]: list(r["hashes"]) for r in direct.collect()}
    assert got == want  # includes the one-sided groups passing through


def test_kmv_distinct_estimate_exact_below_k_and_bounded_error(spark):
    from kermit_spark.ops.sketch import kmv_build, kmv_distinct_estimate

    k = 256
    rows = [("small", f"s{i}") for i in range(50)]
    rows += [("big", f"u{i}") for i in range(20_000)]
    df = spark.createDataFrame(rows, "group string, key string")
    est = {
        r["group"]: (r["n_hashes"], r["est_distinct"])
        for r in kmv_distinct_estimate(kmv_build(df, k=k), k=k).collect()
    }
    assert est["small"] == (50, 50)  # below k -> exact
    n_hashes, e = est["big"]
    assert n_hashes == k
    # KMV relative error ~ 1/sqrt(k-2) ≈ 0.063; allow 4 sigma
    assert abs(e - 20_000) / 20_000 < 0.25
    # python mirror of the integer estimator
    hk = _kmv_mirror([f"u{i}" for i in range(20_000)], k)[-1]
    assert e == ((k - 1) * (1 << 48)) // hk


def test_kmv_pair_jaccard_finds_mirrors_and_estimates(spark):
    from kermit_spark.ops.sketch import kmv_build, kmv_pair_jaccard

    k = 32
    # h0/h1 are exact mirrors; h2 overlaps h0 on half its keys; h3 disjoint
    rows = [("h0", f"p{i}") for i in range(200)]
    rows += [("h1", f"p{i}") for i in range(200)]
    rows += [("h2", f"p{i}") for i in range(100)] + [("h2", f"q{i}") for i in range(100)]
    rows += [("h3", f"z{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "group string, key string")
    sk = kmv_build(df, k=k)
    got = {
        (r["group_a"], r["group_b"]): r
        for r in kmv_pair_jaccard(sk, k=k, min_shared=2).collect()
    }
    assert ("h0", "h1") in got
    full = got[("h0", "h1")]
    assert full["shared_k"] == full["union_k"] == k  # identical sets
    assert full["jaccard_ppm"] == 1_000_000
    # true J(h0, h2) = 100/300 = 0.333; coordinated sample keeps it near
    if ("h0", "h2") in got:
        j = got[("h0", "h2")]["jaccard_ppm"] / 1e6
        assert 0.08 < j < 0.65
    assert not any("h3" in pair for pair in got)


def test_kmv_pair_jaccard_bucket_cap_bounds_pairs(spark):
    from kermit_spark.ops.sketch import kmv_build, kmv_pair_jaccard

    # 40 groups all sharing the SAME key set (pathological boilerplate):
    # uncapped this is 40*39/2 = 780 pairs; cap 10 bounds it to 10*9/2
    rows = [(f"g{i:02d}", f"c{j}") for i in range(40) for j in range(20)]
    df = spark.createDataFrame(rows, "group string, key string")
    sk = kmv_build(df, k=16)
    pairs = kmv_pair_jaccard(sk, k=16, min_shared=2, max_bucket=10)
    got = pairs.collect()
    assert 0 < len(got) <= 45
    # deterministic keep rule: only the 10 lexicographically lowest groups
    survivors = {g for r in got for g in (r["group_a"], r["group_b"])}
    assert survivors <= {f"g{i:02d}" for i in range(10)}
