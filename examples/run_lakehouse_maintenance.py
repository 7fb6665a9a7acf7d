"""Runnable lakehouse-maintenance demo: the table-lifecycle surface.

Walks one fact table through the maintenance cycle a 100 TB deployment
runs on a schedule, using this engine's operators end to end:

1. land it versioned (atomic snapshot publish, schema contract);
2. fragment it the way streaming sinks do (many tiny files);
3. OPTIMIZE — compaction + Z-order clustering in one rewrite shuffle;
4. prove the rewrite lossless with order-insensitive fingerprints;
5. harvest parquet-footer min/max stats and answer a selective query
   through driver-side file pruning;
6. build + persist a bloom over one slice's keys and prune a second
   table's scan with it;
7. publish a corrected snapshot, diff the two versions (change data
   feed), then vacuum down to the retention window.

    python examples/run_lakehouse_maintenance.py [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from ingestao_dados_poli_spark.operators import audit as AU
from ingestao_dados_poli_spark.operators import bloom as B
from ingestao_dados_poli_spark.operators import relational as R
from ingestao_dados_poli_spark.session import get_spark
from ingestao_dados_poli_spark.sources import stats as ST
from ingestao_dados_poli_spark.sources import versioned as V
from ingestao_dados_poli_spark.sources.writers import optimize_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="lakehouse_")
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark("lakehouse-maintenance")
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate", "l_quantity", "l_extendedprice"
    )

    # 1. versioned landing
    table = f"{work}/lineitem_versioned"
    v1 = V.publish(spark, li, table)
    print(f"published v={v1} ({li.count()} rows)")

    # 2. fragment: the small-file reality of a streaming sink
    frag = f"{work}/fragmented"
    li.repartition(64).write.mode("overwrite").parquet(frag)

    # 3. OPTIMIZE: compact + cluster on (ship-day, quantity) in one pass
    opt = f"{work}/optimized"
    li_days = spark.read.parquet(frag).withColumn(
        "_days", F.datediff("l_shipdate", F.lit("1995-01-01"))
    )
    tmp_src = f"{work}/frag_days"
    li_days.write.mode("overwrite").parquet(tmp_src)
    report = optimize_table(
        spark, tmp_src, opt, ["_days", "l_quantity"], target_file_bytes=1 << 22
    )
    print(f"optimize: {report['files_before']} files -> {report['files_after']}")

    # 4. losslessness: anti-entropy digests must match exactly
    cols = [
        F.col("l_orderkey"),
        F.col("l_shipdate").cast("string"),
        F.round("l_extendedprice", 2).cast("decimal(18,2)"),
    ]
    fp_src = AU.table_fingerprint(spark.read.parquet(frag), cols).collect()[0]
    fp_opt = AU.table_fingerprint(spark.read.parquet(opt), cols).collect()[0]
    assert (fp_src["xor_fp"], fp_src["sum_fp"]) == (fp_opt["xor_fp"], fp_opt["sum_fp"])
    print(f"fingerprints match: xor={fp_src['xor_fp']} sum={fp_src['sum_fp']}")

    # 5. footer stats + file pruning for a one-month slice
    stats = ST.collect_file_stats(spark, opt, ["l_shipdate"])
    df, read, total = ST.pruned_read(
        spark, stats, "l_shipdate", "1997-01-01 00:00:00", "1997-01-31 23:59:59"
    )
    month = df.filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-02-01")
    )
    print(f"file pruning: read {read}/{total} files -> {month.count()} rows")

    # 6. cross-job bloom: prune lineitem by one quarter's order keys
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    bf = B.build_key_bloom(orders, "o_orderkey", num_bits=1 << 21)
    B.save_bloom(spark, bf, f"{work}/bloom")
    loaded, nh = B.load_bloom(spark, f"{work}/bloom")
    pruned = B.bloom_prune(li, "l_orderkey", loaded, nh)
    print(f"bloom pruning: {li.count()} -> {pruned.count()} candidate rows")

    # 7. correction publish + change data feed + retention vacuum
    corrected = li.withColumn(
        "l_quantity",
        F.when(F.col("l_quantity") > 45, F.lit(45.0)).otherwise(F.col("l_quantity")),
    )
    v2 = V.publish(spark, corrected, table)
    cdf = R.table_diff(
        V.read_version(spark, table, v1),
        V.read_version(spark, table, v2),
        keys=["l_orderkey", "l_shipdate", "l_extendedprice"],
    )
    print("change data feed:")
    for row in cdf.groupBy("change_type").count().collect():
        print(f"  {row['change_type']}: {row['count']}")
    removed = V.vacuum(spark, table, keep=1)
    print(f"vacuumed versions: {removed}; live=v{V.latest_version(spark, table)}")

    print(f"\nall artifacts under {work}")


if __name__ == "__main__":
    main()
