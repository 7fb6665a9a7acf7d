from __future__ import annotations

from pyspark.sql import functions as F

from ingestao_dados_poli_spark.operators import bloom as B


def test_bloom_no_false_negatives_and_selective(spark):
    members = spark.range(0, 1000)
    bf = B.build_key_bloom(members, "id", num_bits=1 << 17, num_hashes=5)
    probe = spark.range(0, 100_000)
    kept = {r.id for r in B.bloom_prune(probe, "id", bf).collect()}
    # every true member passes — the join-equivalence contract
    assert set(range(1000)) <= kept
    # ~2% fpp at 1000 keys in 2^17 bits: non-members mostly rejected
    assert len(kept) < 6000


def test_bloom_join_equivalence(spark):
    fact = spark.range(0, 5000).select(
        (F.col("id") % 700).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(0, 100).select((F.col("id") * 7).alias("k"))
    bf = B.build_key_bloom(dim, "k", num_bits=1 << 16)
    plain = fact.join(dim, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).collect()[0]
    pruned = B.bloom_prune(fact, "k", bf).join(dim, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).collect()[0]
    assert (plain.n, plain.s) == (pruned.n, pruned.s)


def test_bloom_null_keys_dropped(spark):
    dim = spark.createDataFrame([(1,), (None,)], "k: bigint")
    bf = B.build_key_bloom(dim, "k", num_bits=1 << 13)
    probe = spark.createDataFrame([(1,), (None,), (999999,)], "k: bigint")
    kept = [r.k for r in B.bloom_prune(probe, "k", bf).collect()]
    assert 1 in kept and None not in kept


def test_bloom_save_load_roundtrip(spark, tmp_path):
    dim = spark.range(0, 64)
    bf = B.build_key_bloom(dim, "id", num_bits=1 << 13, num_hashes=7)
    path = str(tmp_path / "bf.parquet")
    B.save_bloom(spark, bf, path, num_hashes=7)
    loaded, nh = B.load_bloom(spark, path)
    assert loaded == bf and nh == 7
    kept = {r.id for r in B.bloom_prune(spark.range(64), "id", loaded, nh).collect()}
    assert kept == set(range(64))


def test_bloom_save_is_overwrite(spark, tmp_path):
    """save_bloom must clear stale parquet in the destination (the old
    Spark writer left part-*-uuid files a fixed-name write would not
    replace, and load_bloom's one-row read would then return an
    arbitrary survivor)."""
    import glob
    import os

    dim = spark.range(0, 64)
    old = B.build_key_bloom(dim, "id", num_bits=1 << 13, num_hashes=7)
    path = str(tmp_path / "bf_over.parquet")
    # simulate the old Spark-writer layout: a uuid-named part file
    B.save_bloom(spark, old, path, num_hashes=7)
    os.rename(
        os.path.join(path, "part-00000.parquet"),
        os.path.join(path, "part-00000-deadbeef.c000.snappy.parquet"),
    )
    new = B.build_key_bloom(spark.range(64, 128), "id", num_bits=1 << 13, num_hashes=5)
    B.save_bloom(spark, new, path, num_hashes=5)
    assert len(glob.glob(os.path.join(path, "*.parquet"))) == 1
    loaded, nh = B.load_bloom(spark, path)
    assert loaded == new and nh == 5
