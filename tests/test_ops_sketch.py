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
