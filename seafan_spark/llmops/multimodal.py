"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery here is real and tested — schemas, batch
iteration, partition sizing, output contracts. The actual media DECODERS
are stubbed (this environment ships no image/audio libraries): each stub
either raises NotImplementedError (strict mode) or produces a
deterministic fake derived from the bytes, so pipelines are fully
exercisable end-to-end and swapping in a real decoder (PIL/ffmpeg) changes
one function.

Design for 100 TB: media bytes never leave the executor except through
Arrow batches; metadata-only transformations (filtering by size/type)
are pure Column ops that never touch the payload, so Parquet column
pruning skips the heavy binary column entirely.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),      # png|jpeg|wav|mp4|...
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),    # md5 of payload
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)

STRICT_STUBS = False  # True -> decoder stubs raise instead of faking


def attach_media_metadata(df: DataFrame, binary_col: str, media_type: str, fmt: str) -> DataFrame:
    """Add the typed metadata struct for an opaque binary column — pure
    Column ops, payload untouched (and prunable)."""
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
            F.md5(F.col(binary_col)).alias("checksum"),
        ),
    )


def _fake_decode_image(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for an image decoder.

    REAL DECODER GOES HERE (e.g. PIL.Image.open(io.BytesIO(payload))).
    The fake derives stable dimensions/luma from the md5 digest so tests
    can assert exact values.
    """
    if STRICT_STUBS:
        raise NotImplementedError("image decoding requires an imaging library")
    dig = hashlib.md5(payload).digest()
    h = 64 + dig[0] % 192
    w = 64 + dig[1] % 192
    c = 3
    luma = sum(dig[2:10]) / (8 * 255.0)
    return h, w, c, luma


def extract_image_features(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """Decode + featurize images via mapInPandas: Arrow batches of
    (id, bytes) in, small feature rows out — the payload never returns to
    the driver, and output is ~40 bytes/row regardless of image size."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                h, w, c, luma = _fake_decode_image(bytes(payload) if payload is not None else b"")
                rows.append((int(doc_id), h, w, c, luma))
            yield pd.DataFrame(
                rows, columns=["doc_id", "height", "width", "channels", "mean_luma"]
            )

    return df.select(id_col, binary_col).mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, id_col: str, binary_col: str, size: tuple[int, int]) -> DataFrame:
    """Resize plumbing: binary in, binary out, same partitioning.

    The stub 'resize' tags the payload with the target size (real
    implementation: decode -> resample -> re-encode inside the batch
    loop)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("resized", T.BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"resized:{size[0]}x{size[1]}:".encode()
        for pdf in it:
            if STRICT_STUBS:
                raise NotImplementedError("image resize requires an imaging library")
            rows = [
                (int(i), tag + hashlib.md5(bytes(p) if p is not None else b"").digest())
                for i, p in zip(pdf[id_col], pdf[binary_col])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "resized"])

    return df.select(id_col, binary_col).mapInPandas(batches, schema=out_schema)


def sample_video_frames(
    df: DataFrame, id_col: str, binary_col: str, every_n: int = 30
) -> DataFrame:
    """Frame-sampling plumbing: one input row -> many frame rows
    (mapInPandas is free to change cardinality). The stub emits
    ``n_bytes // (every_n * 1024) + 1`` fake frames per video."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if STRICT_STUBS:
                raise NotImplementedError("video decoding requires ffmpeg")
            rows = []
            for i, p in zip(pdf[id_col], pdf[binary_col]):
                payload = bytes(p) if p is not None else b""
                n_frames = len(payload) // (every_n * 1024) + 1
                for f_no in range(n_frames):
                    rows.append(
                        (int(i), f_no, hashlib.md5(payload + f_no.to_bytes(4, "big")).digest())
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "frame"])

    return df.select(id_col, binary_col).mapInPandas(batches, schema=out_schema)
