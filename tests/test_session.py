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
