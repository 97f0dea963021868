"""Multimodal columns — SURVEY §2.2 D6 and the BASELINE north star's
multimodal plumbing.

Media is carried as an opaque ``binary`` column plus a typed metadata
struct; decode/feature-extract run as Arrow-batched ``mapInPandas`` so
each task streams record batches (bounded memory however large the blobs
are). The actual image/audio decoding libraries are NOT in this
container, so the decode step is stubbed (clearly marked) behind a
deterministic fake — the Spark-side plumbing (schema, batch iteration,
UDF signatures, partitioning) is real and tested.

The fixture has no binary column, so the derived media column is
``encode(text, 'utf-8')`` — arithmetic both engines can reproduce, which
keeps D6 oracle-checkable (binary round-trip + byte stats).

Scale: blobs dominate row size; at 100 TB you partition by content-size
bands (maxPartitionBytes) and never collect a media column to the
driver. Feature extraction is a narrow pass (no shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import load_table, rebalance

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def with_media(documents: DataFrame) -> DataFrame:
    """Attach the derived binary media column + typed metadata."""
    media = F.encode(F.col("text"), "utf-8")
    meta = F.struct(
        F.lit("text/plain").alias("kind"),
        F.length(media).cast("long").alias("n_bytes"),
        F.lit("utf-8").alias("codec"),
    )
    return documents.select("doc_id", media.alias("media"), meta.alias("media_meta"))


def decode_media(blob: bytes, kind: str) -> np.ndarray:
    """STUB — real decode needs PIL/ffmpeg, which this container lacks.
    Raises for real media kinds; 'text/plain' gets a deterministic fake
    decode (byte values) so the downstream plumbing is exercised."""
    if kind != "text/plain":
        raise NotImplementedError(
            f"decode for {kind!r} requires media libraries not present in this env"
        )
    return np.frombuffer(blob, dtype=np.uint8)


def extract_features(df: DataFrame, n_bins: int = 16) -> DataFrame:
    """Byte-histogram feature vector per media blob via mapInPandas —
    the stand-in for image embeddings / audio fingerprints; identical
    batch shape to the real thing."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob, meta in zip(pdf["media"], pdf["media_meta"]):
                arr = decode_media(blob, meta["kind"])
                hist, _ = np.histogram(arr, bins=n_bins, range=(0, 256))
                total = hist.sum() or 1
                feats.append((hist / total).round(6).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.mapInPandas(gen, out_schema)


def resize_media(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Resize plumbing (image-resize analogue): deterministically
    downsample each blob to ≤ target_bytes via strided byte selection,
    mapInPandas so the batch shape matches a real PIL/ffmpeg resize. Real
    pixel resampling needs media libs this container lacks — decode_media
    raises NotImplementedError for non-text kinds (the documented stub
    boundary); the Spark-side schema/batching here is the real thing."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media", T.BinaryType()),
            T.StructField(
                "media_meta",
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("n_bytes", T.LongType()),
                        T.StructField("codec", T.StringType()),
                    ]
                ),
            ),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, metas = [], []
            for blob, meta in zip(pdf["media"], pdf["media_meta"]):
                arr = decode_media(blob, meta["kind"])
                step = max(1, int(np.ceil(len(arr) / target_bytes))) if len(arr) else 1
                small = bytes(arr[::step][:target_bytes])
                blobs.append(small)
                metas.append(
                    {"kind": meta["kind"], "n_bytes": len(small), "codec": meta["codec"]}
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media": blobs, "media_meta": metas}
            )

    return df.mapInPandas(gen, out_schema)


def frame_sample(df: DataFrame, every: int = 4) -> DataFrame:
    """Frame-sampling plumbing: slice every `every`-th byte (the video
    analogue: every n-th frame) into an array column — pure expressions."""
    media = F.col("media")
    idx = F.sequence(F.lit(1), F.length(media), F.lit(every))
    sampled = F.transform(idx, lambda i: F.substring(media, i, 1))
    # sequence(1, 0) is an error, not empty — zero-byte blobs need a guard
    frames = F.when(F.length(media) == 0, F.array().cast("array<binary>")).otherwise(sampled)
    # frames materialized once (round 15): size() from the raw expression
    # re-ran the per-byte sampling transform a second time per row
    return df.select("doc_id", frames.alias("frames")).withColumn(
        "n_frames", F.size("frames")
    )


def d6_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary round-trip check: byte length + hex prefix of each blob."""
    d = load_table(spark, sf_dir, "documents")
    m = with_media(d)
    return m.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.lower(F.hex(F.substring(F.col("media"), 1, 8))).alias("head_hex"),
    ).orderBy("doc_id")


def d6_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction pipeline over binary media (mapInPandas path).
    Rows-only oracle (numpy histogram); determinism pinned in
    tests/test_multimodal.py."""
    # rebalance: mapInPandas throughput is bounded by input splits (1-2
    # for the small fixture file)
    d = rebalance(load_table(spark, sf_dir, "documents"))
    feats = extract_features(with_media(d))
    return feats.select(
        "doc_id",
        F.round(F.element_at("features", 1), 6).alias("f1"),
        F.size("features").alias("dim"),
    ).orderBy("doc_id")


QUERIES = {
    "d6_multimodal": d6_multimodal,
    "d6_features": d6_features,
}

ORACLES = {
    "d6_multimodal": (
        "SELECT doc_id, octet_length(encode(text)) AS n_bytes, "
        "lower(substring(hex(encode(text)), 1, 16)) AS head_hex "  # hex→substr: duckdb can't substring a BLOB
        "FROM documents ORDER BY doc_id"
    ),
    # d6_features: rows-only (mapInPandas; pinned by tests)
}
