"""Deterministic sampling ops (ops/sample.py) — reproducibility is the
contract: same key → same verdict across runs and parallelism levels."""

import pytest
from pyspark.sql import functions as F

from kermit_spark.ops.sample import hash_sample, portable_hash48, stratified_sample


def _docs(spark, n=400, strata=4):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), F.pmod("id", F.lit(strata)).cast("string")).alias("source"),
    )


def test_hash_sample_deterministic_and_rate(spark):
    df = _docs(spark)
    a = sorted(r["doc_id"] for r in hash_sample(df, "doc_id", 1, 2).collect())
    b = sorted(r["doc_id"] for r in hash_sample(df, "doc_id", 1, 2).collect())
    assert a == b
    # uniform 48-bit hash: rate 1/2 over 400 keys lands well inside [0.35, 0.65]
    assert 140 <= len(a) <= 260
    # num=den keeps everything
    assert hash_sample(df, "doc_id", 3, 3).count() == 400


def test_hash_sample_subset_nesting(spark):
    # buckets < 1 are a subset of buckets < 2: growing the rate only adds rows
    df = _docs(spark)
    small = {r["doc_id"] for r in hash_sample(df, "doc_id", 1, 4).collect()}
    large = {r["doc_id"] for r in hash_sample(df, "doc_id", 2, 4).collect()}
    assert small <= large


def test_hash_sample_validates_rate(spark):
    with pytest.raises(ValueError):
        hash_sample(_docs(spark), "doc_id", 0, 2)
    with pytest.raises(ValueError):
        hash_sample(_docs(spark), "doc_id", 3, 2)


def test_stratified_exact_k_per_stratum(spark):
    out = stratified_sample(_docs(spark), "source", "doc_id", k=7)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {f"s{i}": 7 for i in range(4)}


def test_stratified_small_stratum_keeps_all(spark):
    df = _docs(spark, n=10, strata=5)  # 2 rows per stratum
    out = stratified_sample(df, "source", "doc_id", k=7)
    assert out.count() == 10


def test_stratified_equals_single_window(spark):
    """Two-level top-k must equal the naive single window (same guarantee
    the frontier dequeue pins for itself)."""
    from pyspark.sql.window import Window

    df = _docs(spark, n=300, strata=3)
    fast = {
        (r["source"], r["doc_id"])
        for r in stratified_sample(df, "source", "doc_id", k=11, sub_salts=4).collect()
    }
    h = portable_hash48(F.col("doc_id"))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    naive = {
        (r["source"], r["doc_id"])
        for r in df.withColumn("_r", F.row_number().over(w)).filter("_r <= 11").collect()
    }
    assert fast == naive


def _weighted(spark, n=600, strata=3, zero_every=0):
    """docs with a deterministic weight column (varied, some zero when
    zero_every > 0)."""
    w = F.pmod(F.col("id") * 37 + 11, F.lit(50)) + 1
    if zero_every:
        w = F.when(F.pmod("id", F.lit(zero_every)) == 0, F.lit(0)).otherwise(w)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), F.pmod("id", F.lit(strata)).cast("string")).alias("source"),
        w.cast("long").alias("tokens"),
    )


def _naive_budget(spark, df, budget):
    """Single-window reference implementation of the strict-prefix contract."""
    from pyspark.sql.window import Window
    from kermit_spark.ops.sample import portable_hash48

    w = Window.partitionBy("source").orderBy(
        portable_hash48(F.col("doc_id")).asc(), F.col("doc_id").asc()
    )
    return (
        df.withColumn("_pre", F.coalesce(F.sum("tokens").over(w) - F.col("tokens"), F.lit(0)))
        .filter(F.col("_pre") < budget)
        .drop("_pre")
    )


def test_token_budget_equals_naive_window(spark):
    from kermit_spark.ops.sample import token_budget_sample

    df = _weighted(spark, n=600, strata=3)
    for budget in (1, 100, 2500, 10**9):
        got = {r["doc_id"] for r in token_budget_sample(
            df, "source", "doc_id", "tokens", budget, num_buckets=8).collect()}
        want = {r["doc_id"] for r in _naive_budget(spark, df, budget).collect()}
        assert got == want, budget


def test_token_budget_zero_weight_rows(spark):
    """Zero-weight rows never consume budget but ride along while the
    stratum is under budget; the strict-< contract holds at the boundary."""
    from kermit_spark.ops.sample import token_budget_sample

    df = _weighted(spark, n=400, strata=2, zero_every=5)
    got = {r["doc_id"] for r in token_budget_sample(
        df, "source", "doc_id", "tokens", 700, num_buckets=4).collect()}
    want = {r["doc_id"] for r in _naive_budget(spark, df, 700).collect()}
    assert got == want


def test_token_budget_exact_boundary_bucket(spark):
    """num_buckets=1 forces everything through the boundary (exact) path;
    a huge num_buckets makes every row its own bucket (full path)."""
    from kermit_spark.ops.sample import token_budget_sample

    df = _weighted(spark, n=200, strata=2)
    want = {r["doc_id"] for r in _naive_budget(spark, df, 900).collect()}
    for nb in (1, 1 << 20):
        got = {r["doc_id"] for r in token_budget_sample(
            df, "source", "doc_id", "tokens", 900, num_buckets=nb).collect()}
        assert got == want, nb


def test_token_budget_per_stratum_budgets(spark):
    from kermit_spark.ops.sample import token_budget_sample

    df = _weighted(spark, n=300, strata=3)
    budgets = spark.createDataFrame(
        [("s0", 100), ("s1", 10**9)], "source string, budget long"
    )  # s2 has no quota row -> dropped entirely
    out = token_budget_sample(df, "source", "doc_id", "tokens", budgets, num_buckets=8)
    by = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "s2" not in by
    assert by["s1"] == 100  # unbounded budget keeps the whole stratum
    tot_s0 = (
        out.filter(F.col("source") == "s0").agg(F.sum("tokens").alias("t")).collect()[0]["t"]
    )
    naive_s0 = {r["doc_id"] for r in _naive_budget(spark, df.filter(F.col("source") == "s0"), 100).collect()}
    got_s0 = {r["doc_id"] for r in out.filter(F.col("source") == "s0").collect()}
    assert got_s0 == naive_s0
    # greedy overshoot is at most the crossing row: pre < 100 for every kept row
    assert tot_s0 >= 100


def test_token_budget_first_row_always_kept(spark):
    from kermit_spark.ops.sample import token_budget_sample

    df = _weighted(spark, n=30, strata=3)
    out = token_budget_sample(df, "source", "doc_id", "tokens", 1, num_buckets=4)
    by = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by == {"s0": 1, "s1": 1, "s2": 1}


# ---------------------------------------------------------------------------
# temperature (alpha) domain rebalancing
# ---------------------------------------------------------------------------


def _skewed(spark):
    # 900 rows in 'big', 100 in 'small'
    return spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 900, "big").otherwise("small").alias("source"),
    )


def test_temperature_sample_flattens_head(spark):
    from kermit_spark.ops.sample import temperature_sample

    df = _skewed(spark)
    out = temperature_sample(df, "source", "doc_id", alpha=0.5, target_frac=0.5)
    rows = out.collect()
    ppm = {r["source"]: r["p_ppm"] for r in rows}
    # w_big=30, w_small=10, sw=40: p_small = 0.5*1000*10/(40*100) = 1.25 → capped
    assert ppm["small"] == 1_000_000
    # p_big = 0.5*1000*30/(40*900) = 0.41666.. → 416667 ppm (half-up)
    assert ppm["big"] == 416_667
    counts = {"big": 0, "small": 0}
    for r in rows:
        counts[r["source"]] += 1
    assert counts["small"] == 100                 # p=1 keeps everything
    assert 330 <= counts["big"] <= 500            # ~375 expected, hash-uniform
    # deterministic across runs and partitionings
    again = sorted(
        r["doc_id"]
        for r in temperature_sample(
            df.repartition(8), "source", "doc_id", alpha=0.5, target_frac=0.5
        ).collect()
    )
    assert again == sorted(r["doc_id"] for r in rows)


def test_temperature_sample_alpha_one_is_uniform(spark):
    from kermit_spark.ops.sample import temperature_sample

    df = _skewed(spark)
    out = temperature_sample(df, "source", "doc_id", alpha=1.0, target_frac=0.4)
    ppm = {r["source"]: r["p_ppm"] for r in out.collect()}
    # alpha=1 → natural frequency: every stratum keeps the same fraction
    assert ppm == {"big": 400_000, "small": 400_000}


def test_temperature_sample_validates_args(spark):
    from kermit_spark.ops.sample import temperature_sample

    df = _skewed(spark)
    with pytest.raises(ValueError):
        temperature_sample(df, "source", "doc_id", target_frac=0.0)
    with pytest.raises(ValueError):
        temperature_sample(df, "source", "doc_id", alpha=-0.1)
