"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque BINARY columns with a typed metadata struct; the
Spark-side plumbing — schema, partition sizing, mapInPandas batch shape,
deterministic fake decode — is real and tested. The actual codec calls
are stubbed (image/audio libraries are not in this container): swap
``_decode_stub`` for PIL/torchaudio/ffmpeg in a real deployment — the
batch contract does not change.

Scale notes: media blobs dominate partition size, so ingest uses
``binaryFile`` with spark.sql.files.maxPartitionBytes tuned down;
feature extraction is mapInPandas (Arrow batches of bytes), never
collect; derived features are small columns that join back by content
hash (the reference's BID idea, core/freezer.go:386-404).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),  # image|audio|video
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content_hash", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, max_partition_mb: int = 32) -> DataFrame:
    """Ingest a directory of media files as (path, modificationTime,
    length, content) — Spark's binaryFile source, partition-capped so a
    few large blobs don't starve parallelism."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*")
        .load(path)
    )


def _decode_stub(content: bytes, kind: str) -> np.ndarray:
    """Deterministic fake decode: PRNG features seeded by content hash.
    REPLACE with a real codec (PIL.Image.open / librosa.load /
    pyav frame sampling) outside this container; the signature and the
    batch contract stay identical."""
    seed = int.from_bytes(hashlib.sha256(content or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(16).astype(np.float32)


def extract_features(media: DataFrame, kind: str = "image") -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, small feature
    rows out. The expensive decode happens executor-side per batch.

    Spread first: decode is compute-dense per byte (a real codec far
    more so than the stub), and media blobs small enough to fit one
    byte-sized scan split would otherwise decode on 1-2 cores — the
    r11 pattern (util.spread_for_compute; no-op on a real many-split
    media lake). Projected to the two consumed columns and
    hash-partitioned on media_id (ADVICE r11): a round-robin
    repartition would locally sort every row on ALL columns — the
    binary payloads included — before the exchange
    (sortBeforeRepartition), costing IO/CPU proportional to total
    media bytes; hashing a cheap near-unique key ships each blob once
    with no sort."""
    from pufs_spark.operators.util import spread_for_compute

    media = spread_for_compute(
        media, cols=["media_id", "content"], by="media_id"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_stub(c, kind).tolist() for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content_hash": [
                        hashlib.sha256(c or b"").hexdigest()
                        for c in pdf["content"]
                    ],
                    "n_bytes": [len(c or b"") for c in pdf["content"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: stubbed codec, real partition/batch shape.
    Returns rows with the (fake) resized payload replaced by its hash so
    the pipeline stays runnable without codecs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raise NotImplementedError(
                "image resize requires a codec (PIL) not present in this "
                "container; wire PIL.Image here"
            )
            yield pdf  # pragma: no cover

    _ = batches
    raise NotImplementedError(
        "resize_images is a stub in this container (no PIL); "
        "use extract_features for the tested plumbing path"
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing stub (no ffmpeg in container)."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg/pyav, not present here"
    )


def synthetic_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: binary payloads with
    typed metadata."""
    import random

    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        payload = bytes(rnd.getrandbits(8) for _ in range(rnd.randrange(64, 512)))
        rows.append(
            (
                i,
                bytearray(payload),
                ("image", "image/png", 64, 64, None)
                if i % 2 == 0
                else ("audio", "audio/wav", None, None, 1000 + i),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def media_from_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic media derivation from the documents table (both
    engines can derive it, so mapInPandas plumbing becomes
    oracle-checkable): content = UTF-8 bytes of text, kind cycles
    image/audio/video by id."""
    kind = (
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.struct(
            kind.alias("kind"),
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation: per kind, count + payload bytes."""
    return media.groupBy(F.col("meta.kind").alias("kind")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length(F.col("content"))).alias("total_bytes"),
    )
