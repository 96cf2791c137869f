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
