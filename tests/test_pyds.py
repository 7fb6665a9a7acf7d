from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ingestao_dados_poli_spark.sources import pyds
from ingestao_dados_poli_spark.sources.pyds import (
    _Range,
    _SynthDocsReader,
)
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    IsNotNull,
    LessThan,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    pyds.register(spark)


def test_synthdocs_partitioned_read(spark):
    df = (
        spark.read.format("synthdocs")
        .option("rows", "5000")
        .option("partitions", "8")
        .load()
    )
    assert df.count() == 5000
    assert df.rdd.getNumPartitions() == 8
    assert df.columns == ["doc_id", "source", "text", "n_chars"]
    # deterministic: same options → identical rows
    a = sorted(r.text for r in df.filter(F.col("doc_id") < 20).collect())
    b = sorted(
        r.text
        for r in spark.read.format("synthdocs")
        .option("rows", "5000")
        .option("partitions", "8")
        .load()
        .filter(F.col("doc_id") < 20)
        .collect()
    )
    assert a == b


def test_synthdocs_filter_pushdown_prunes_partitions(spark):
    # engine-level: the filtered read returns exactly the pruned range
    df = (
        spark.read.format("synthdocs")
        .option("rows", "5000")
        .load()
        .filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 130))
    )
    assert sorted(r.doc_id for r in df.collect()) == list(range(100, 130))

    # unit-level: pushFilters shrinks the generation interval and
    # passes unsupported predicates back to Spark
    reader = _SynthDocsReader({"rows": "5000", "partitions": "4"})
    remaining = list(
        reader.pushFilters(
            [
                GreaterThanOrEqual(("doc_id",), 100),
                LessThan(("doc_id",), 130),
                IsNotNull(("doc_id",)),
                EqualTo(("source",), "src_1"),
            ]
        )
    )
    assert (reader.lo, reader.hi) == (100, 130)
    assert {type(f).__name__ for f in remaining} == {"IsNotNull", "EqualTo"}
    parts = reader.partitions()
    assert parts[0].start == 100 and parts[-1].end == 130
    assert sum(p.end - p.start for p in parts) == 30


def test_synthdocs_empty_after_pushdown(spark):
    reader = _SynthDocsReader({"rows": "10"})
    list(reader.pushFilters([EqualTo(("doc_id",), 50)]))  # out of range
    parts = reader.partitions()
    assert sum(p.end - p.start for p in parts) == 0
    assert list(reader.read(_Range(5, 5))) == []


def test_jsonlsink_roundtrip_with_manifest(spark, tmp_path):
    df = (
        spark.read.format("synthdocs")
        .option("rows", "200")
        .option("partitions", "3")
        .load()
    )
    out = str(tmp_path / "sink")
    df.write.format("jsonlsink").mode("append").option("path", out).save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    assert manifest["rows"] == 200
    assert all(os.path.exists(p) for p in manifest["files"])
    back = spark.read.json(manifest["files"])
    assert back.count() == 200
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == list(
        range(200)
    )


def test_syntheventstream_bounded_micro_batches(spark, tmp_path):
    from ingestao_dados_poli_spark.sources import pyds

    pyds.register(spark)
    src = (
        spark.readStream.format("syntheventstream")
        .option("rowsperbatch", "40")
        .option("maxrows", "100")
        .load()
    )
    assert src.isStreaming
    # NOT availableNow: a Simple stream reader serves ONE read() per
    # micro-batch, so drain with processAllAvailable — it returns once
    # read() reports no new offset (the bounded source's max_rows).
    q = (
        src.writeStream.format("memory")
        .queryName("pyds_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_pyds_stream"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM pyds_stream").collect()
    # bounded source: exactly max_rows rows, each deterministic
    assert len(got) == 100
    by_id = {r.event_id: r for r in got}
    assert set(by_id) == set(range(100))
    h = (7 * 2654435761 + 42) & 0x7FFFFFFF
    assert by_id[7].user_id == h % 97
    assert abs(by_id[7].value - (h % 1000) / 10.0) < 1e-9


def test_jsonlsink_streaming_per_batch_manifest(spark, tmp_path):
    import json as _json

    from ingestao_dados_poli_spark.sources import pyds

    pyds.register(spark)
    out = str(tmp_path / "stream_out")
    src = (
        spark.readStream.format("syntheventstream")
        .option("rowsperbatch", "30")
        .option("maxrows", "90")
        .load()
    )
    q = (
        src.writeStream.format("jsonlsink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck_jsonl_stream"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    manifest = [
        _json.loads(line)
        for line in open(f"{out}/_MANIFEST.jsonl", encoding="utf-8")
    ]
    # 3 micro-batches of 30 rows, each committed with its own manifest line
    assert sorted(m["batch"] for m in manifest) == [0, 1, 2]
    assert sum(m["rows"] for m in manifest) == 90
    # every manifest-listed file exists and row counts add up
    n = 0
    for m in manifest:
        for f in m["files"]:
            n += sum(1 for _ in open(f, encoding="utf-8"))
    assert n == 90
