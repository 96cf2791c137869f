"""Training-shard export sink (kermit_spark/export.py): deterministic
pack → partitioned parallel write → manifest; read-back with partition
pruning."""

import os

from pyspark.sql import functions as F

from kermit_spark.export import export_training_shards, read_training_shards


def _docs(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), F.pmod("id", F.lit(3)).cast("string")).alias("source"),
        # ~ (id % 7 + 1) words per doc
        F.concat_ws(" ", F.array_repeat(F.lit("w"), (F.pmod("id", F.lit(7)) + 1).cast("int"))).alias("text"),
    )


def test_export_shards_budget_layout_and_manifest(spark, tmp_path):
    path = str(tmp_path / "shards")
    manifest = export_training_shards(_docs(spark), path, max_tokens=10).collect()
    # every shard within budget (no oversized docs here: max 7 tokens)
    assert all(r["n_tokens"] <= 10 for r in manifest)
    assert sum(r["n_docs"] for r in manifest) == 60
    # hive layout: source=… / bin_id=…
    assert any(d.startswith("source=") for d in os.listdir(path))
    back = read_training_shards(spark, path)
    assert back.count() == 60
    assert {r["doc_id"] for r in back.collect()} == set(range(60))
    # per-shard read prunes to one shard
    one = manifest[0]
    only = read_training_shards(
        spark, path, shards=[(one["source"], one["bin_id"])]
    )
    assert only.count() == one["n_docs"]
    assert {r["source"] for r in only.collect()} == {one["source"]}


def test_export_shards_deterministic(spark, tmp_path):
    a = export_training_shards(_docs(spark), str(tmp_path / "a"), max_tokens=12)
    b = export_training_shards(_docs(spark), str(tmp_path / "b"), max_tokens=12)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
