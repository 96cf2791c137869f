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


# -- indexed token-shard export (.bin + parquet index) -----------------------


def _token_docs(spark, n=40):
    # doc i: tokens [i%5, (i+1)%5, ..., length i%6+1] as vocab words w0..w4
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), F.pmod("id", F.lit(6)).cast("int")),
            lambda j: F.concat(F.lit("w"), F.pmod(F.col("id") + j, F.lit(5)).cast("string")),
        ).alias("tokens"),
    )


def test_token_vocab_frequency_rank_no_global_window(spark):
    from kermit_spark.export import build_token_vocab

    docs = _token_docs(spark)
    vocab = build_token_vocab(docs)
    rows = {r["token"]: (r["tid"], r["tf"]) for r in vocab.collect()}
    # dense 0-based ids, unique
    tids = sorted(t for t, _ in rows.values())
    assert tids == list(range(len(rows)))
    # ranks respect (tf DESC, token ASC) exactly
    order = sorted(rows.items(), key=lambda kv: (-kv[1][1], kv[0]))
    assert [kv[1][0] for kv in order] == list(range(len(rows)))


def test_token_shard_roundtrip_and_determinism(spark, tmp_path):
    import hashlib

    from kermit_spark.export import (
        build_token_vocab,
        export_token_shards,
        read_token_shards,
        tokens_to_ids,
    )

    docs = _token_docs(spark)
    vocab = build_token_vocab(docs)
    ids = tokens_to_ids(docs, vocab).persist()
    want = {r["doc_id"]: r["token_ids"] for r in ids.collect()}

    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    idx = export_token_shards(ids, p1, tokens_per_shard=32)
    export_token_shards(ids, p2, tokens_per_shard=32)
    # byte-identical across runs, shard for shard
    for f in sorted(os.listdir(p1)):
        if f.endswith(".bin"):
            h1 = hashlib.md5(open(os.path.join(p1, f), "rb").read()).hexdigest()
            h2 = hashlib.md5(open(os.path.join(p2, f), "rb").read()).hexdigest()
            assert h1 == h2, f
    # index covers every doc exactly once; offsets tile each shard
    rows = idx.collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(want)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r)
    for sid, members in by_shard.items():
        members.sort(key=lambda r: r["offset"])
        pos = 0
        for r in members:
            assert r["offset"] == pos
            pos += r["n_tokens"]
        size = os.path.getsize(os.path.join(p1, f"shard-{sid:05d}.bin"))
        assert size == pos * 2  # uint16
    # full read-back equality
    back = {r["doc_id"]: r["token_ids"] for r in read_token_shards(spark, p1).collect()}
    assert back == want
    # selective read returns exactly the asked docs
    some = sorted(want)[:5]
    sel = {r["doc_id"]: r["token_ids"] for r in read_token_shards(spark, p1, doc_ids=some).collect()}
    assert sel == {d: want[d] for d in some}
    ids.unpersist()


def test_token_shard_dtype_overflow_raises(spark, tmp_path):
    import pytest

    from kermit_spark.export import export_token_shards

    bad = spark.createDataFrame([(1, [70000])], "doc_id long, token_ids array<int>")
    with pytest.raises(Exception, match="out of uint16 range"):
        export_token_shards(bad, str(tmp_path / "x"), tokens_per_shard=8)
    # uint32 takes the same ids fine
    idx = export_token_shards(bad, str(tmp_path / "y"), tokens_per_shard=8, dtype="uint32")
    assert idx.count() == 1


def test_token_shard_plan_no_global_sort(spark, tmp_path):
    from kermit_spark.export import export_token_shards

    ids = _token_docs(spark).select(
        "doc_id", F.transform("tokens", lambda t: F.length(t)).alias("token_ids")
    )
    from kermit_spark.ops.sample import portable_hash48

    export_token_shards(ids, str(tmp_path / "p"), tokens_per_shard=16)
    # shard assignment is hash-based: no range partitioning (global sort)
    staged = ids.select(
        "doc_id", "token_ids",
        F.pmod(portable_hash48(F.col("doc_id").cast("long")), F.lit(4)).cast("int").alias("__shard"),
    )
    plan = staged.groupBy("__shard").count()._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()
