"""Session factory: the scale-posture confs must actually be set —
a silently-defaulted AQE or shuffle-partition value invalidates every
plan assumption in the operator docstrings."""

from __future__ import annotations


def test_scale_confs_applied(spark):
    conf = spark.conf
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    assert int(conf.get("spark.sql.shuffle.partitions")) > 0
    assert conf.get("spark.sql.session.timeZone") == "UTC"
    # 128 MB scan splits (the 100 TB setting; local row-group-bound
    # sources are handled by partitioning.fan_out instead)
    assert conf.get("spark.sql.files.maxPartitionBytes") == "134217728"


def test_driver_memory_raised(spark):
    # local mode = driver-only JVM; the 1g default OOMs the suite
    mem = spark.sparkContext.getConf().get("spark.driver.memory")
    assert mem.endswith("g") and int(mem[:-1]) >= 8


def test_scoped_conf_restores_and_early_outs(spark):
    from ingestao_dados_poli_spark.session import scoped_conf

    key = "spark.sql.session.timeZone"
    assert spark.conf.get(key) == "UTC"
    # equal value: no flip happens (the early-out exists because any
    # conf flip invalidates session caches — round-6 measured
    # ~0.3-0.5 s added per query when the UTC pin toggled every call)
    with scoped_conf(spark, key, "UTC"):
        assert spark.conf.get(key) == "UTC"
    assert spark.conf.get(key) == "UTC"
    # different value: applied inside, restored after
    with scoped_conf(spark, key, "America/Sao_Paulo"):
        assert spark.conf.get(key) == "America/Sao_Paulo"
    assert spark.conf.get(key) == "UTC"
    # previously-unset key: unset again afterwards (default-read ok)
    k2 = "spark.sql.legacy.parquet.nanosAsLong"
    with scoped_conf(spark, k2, "true"):
        assert spark.conf.get(k2) == "true"
    assert spark.conf.get(k2, "false") == "false"
