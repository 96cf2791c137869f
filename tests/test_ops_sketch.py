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
