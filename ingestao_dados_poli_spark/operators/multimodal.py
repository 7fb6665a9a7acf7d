"""Multimodal (image/audio/video) column handling.

Not in the reference (pure tabular ETL) — added per the engine's
training-data scope. Media payloads are opaque ``binary`` columns with a
typed metadata struct; all per-item compute goes through Arrow-batched
``mapInPandas`` so bytes move driver-free, batch-at-a-time, and the
Python worker amortizes per-row overhead.

The actual codec step (JPEG decode, audio resample, video frame-grab)
requires libraries not present in this container, so ``decode_image`` /
``extract_audio_features`` are STUBBED behind a deterministic fake that
derives pseudo-features from the byte content (sha2-based). The Spark
plumbing — schemas, batch iteration, partition sizing — is real and
tested; swapping in PIL/torchaudio is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ingestao_dados_poli_spark.partitioning import fan_out
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),          # image | audio | video
        StructField("payload", BinaryType()),        # opaque encoded bytes
        StructField("mime", StringType()),
        StructField("width", IntegerType()),         # images/video
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),   # audio/video
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: derive ``dim``
    floats in [0,1) from sha256 of the bytes. Replace with a real model
    head when codec libs are available."""
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def decode_image(payload: bytes) -> "object":
    """Real decode path: returns a PIL Image when pillow is installed.

    The container this engine is developed in ships no codec libs, so
    the default featurizer stays the deterministic fake; wherever PIL
    exists, ``pil_featurizer`` plugs real decoding into the SAME
    ``extract_image_features`` mapInPandas plumbing (proven by a
    skip-if-missing test)."""
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL/pillow; use extract_image_features "
            "(deterministic fake) for plumbing tests"
        ) from e
    return Image.open(io.BytesIO(payload))


def pil_featurizer(dim: int = 8) -> Callable[[bytes], list[float]]:
    """Real-bytes featurizer for ``extract_image_features(featurizer=)``:
    decode with PIL, grayscale, resize to a (dim × 1) strip, return the
    mean intensities in [0, 1). Deterministic (pure pixel math), and
    exercises the exact UDF contract the sha256 fake stands in for.
    Raises NotImplementedError (via decode_image) where PIL is absent.
    """

    def fz(payload: bytes) -> list[float]:
        img = decode_image(payload).convert("L").resize((dim, 1))
        return [min(p / 256.0, 0.999999) for p in list(img.getdata())]

    return fz


def extract_image_features(
    media: DataFrame,
    dim: int = 8,
    batch_hint: int = 1024,
    featurizer: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """media frame → (media_id, width, height, n_bytes, features).

    mapInPandas: Arrow-batched, zero driver involvement; each task
    processes its partition's batches independently, so throughput
    scales linearly with executors. Partition sizing guidance: keep
    payload partitions ≤ ~256 MB (writer's maxRecordsPerFile) so a batch
    of decoded images fits executor memory.
    """
    fz = featurizer or (lambda b: _fake_features(b, dim))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"].fillna(0).astype("int32"),
                    "height": pdf["height"].fillna(0).astype("int32"),
                    "n_bytes": pdf["payload"].map(lambda b: len(b or b"")).astype("int64"),
                    "features": pdf["payload"].map(lambda b: fz(b or b"")),
                }
            )

    cols = ["media_id", "payload", "width", "height"]
    return fan_out(media.select(*cols)).mapInPandas(fn, schema=IMAGE_FEATURES_SCHEMA)


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp.

    The frame EXTRACTION is stubbed (no video codec in container): the
    'frame' is a deterministic 16-byte digest of (payload, ts). The
    explode shape — row per (media_id, frame_ts, frame_bytes) — is the
    real contract a downstream embedding stage consumes.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_ts_ms", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = {"media_id": [], "frame_ts_ms": [], "frame": []}
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                dur = int(dur or 0)
                for ts in range(0, max(dur, 1), every_ms):
                    rows["media_id"].append(mid)
                    rows["frame_ts_ms"].append(ts)
                    rows["frame"].append(
                        hashlib.md5((payload or b"") + ts.to_bytes(8, "big")).digest()
                    )
            yield pd.DataFrame(rows)

    return fan_out(media.select("media_id", "payload", "duration_ms")).mapInPandas(
        fn, schema=out_schema
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata aggregation over a media table (no payload
    decode): per kind, count/bytes/avg dims — the cheap first pass any
    100 TB media crawl runs before spending GPU-decode money."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.avg("width").alias("avg_width"),
        F.avg("height").alias("avg_height"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (no codec libs needed).

    Payload bytes come from sha2 over the id — stable across runs."""
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.pmod("id", F.lit(3)) == 0, "image")
        .when(F.pmod("id", F.lit(3)) == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod("id", F.lit(16)) * 64 + 64).cast("int").alias("width"),
        (F.pmod("id", F.lit(9)) * 64 + 64).cast("int").alias("height"),
        (F.pmod("id", F.lit(7)) * 1000 + 1000).cast("int").alias("duration_ms"),
    )
    return base
