"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery here is real and tested — schemas, batch
iteration, partition sizing, output contracts. Image decode/resize take a
``decoder`` mode: 'fake' (default — a deterministic md5-derived stand-in,
the only mode the synthetic hash-checked corpus supports), 'pil' (real
Pillow decode when the library is installed; raises otherwise), or 'auto'
(probe for Pillow at call time, fall back to the fake). Video decoding
remains a stub (no ffmpeg here); strict mode raises instead of faking.

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


def _pil_module():
    """Probe for Pillow at call time (executor-side). Returns the
    PIL.Image module or None — this sandbox ships no imaging libs, so the
    probe usually fails, but deployments with Pillow get real decoding
    without a code change."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except Exception:
        return None


def _resolve_decoder(decoder: str) -> str:
    """Map decoder mode -> effective mode. 'auto' = PIL when importable
    else the deterministic fake; 'pil' = require PIL (raise if absent);
    'fake' = always the md5-derived stand-in (the hash-oracle mode — the
    test corpus payloads are synthetic bytes no real decoder accepts)."""
    if decoder not in ("auto", "pil", "fake"):
        raise ValueError(f"decoder must be auto|pil|fake, got {decoder!r}")
    if decoder == "pil" and _pil_module() is None:
        raise NotImplementedError("decoder='pil' requires Pillow")
    if decoder == "auto":
        return "pil" if _pil_module() is not None else "fake"
    return decoder


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


def _pil_decode_image(payload: bytes) -> tuple[int, int, int, float]:
    """Real image decode via Pillow: dimensions from the header, mean
    luma from the 8-bit grayscale conversion. Caller guarantees Pillow is
    importable (``_resolve_decoder``)."""
    import io

    img = _pil_module().open(io.BytesIO(payload))
    w, h = img.size
    c = len(img.getbands())
    gray = img.convert("L")
    hist = gray.histogram()  # 256 bins; mean without materializing numpy
    n = sum(hist) or 1
    luma = sum(i * cnt for i, cnt in enumerate(hist)) / (n * 255.0)
    return h, w, c, luma


def extract_image_features(
    df: DataFrame, id_col: str, binary_col: str, decoder: str = "fake"
) -> DataFrame:
    """Decode + featurize images via mapInPandas: Arrow batches of
    (id, bytes) in, small feature rows out — the payload never returns to
    the driver, and output is ~40 bytes/row regardless of image size.

    ``decoder``: 'fake' (default — deterministic md5-derived features,
    the only mode the synthetic hash-checked corpus supports), 'pil'
    (real Pillow decode, raises if Pillow is absent), or 'auto' (Pillow
    when importable, else the fake)."""
    mode = _resolve_decoder(decoder)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _pil_decode_image if mode == "pil" else _fake_decode_image
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                h, w, c, luma = decode(bytes(payload) if payload is not None else b"")
                rows.append((int(doc_id), h, w, c, luma))
            yield pd.DataFrame(
                rows, columns=["doc_id", "height", "width", "channels", "mean_luma"]
            )

    return df.select(id_col, binary_col).mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(
    df: DataFrame, id_col: str, binary_col: str, size: tuple[int, int],
    decoder: str = "fake",
) -> DataFrame:
    """Resize plumbing: binary in, binary out, same partitioning.

    ``decoder='pil'``/``'auto'`` (with Pillow importable) really decodes,
    resamples to ``size`` and re-encodes as PNG inside the batch loop;
    the default stub 'resize' tags the payload with the target size so
    the synthetic corpus stays exercisable."""
    mode = _resolve_decoder(decoder)
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("resized", T.BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"resized:{size[0]}x{size[1]}:".encode()

        def one(p) -> bytes:
            payload = bytes(p) if p is not None else b""
            if mode == "pil":
                import io

                img = _pil_module().open(io.BytesIO(payload)).resize(size)
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                return buf.getvalue()
            if STRICT_STUBS:
                raise NotImplementedError("image resize requires an imaging library")
            return tag + hashlib.md5(payload).digest()

        for pdf in it:
            rows = [(int(i), one(p)) for i, p in zip(pdf[id_col], pdf[binary_col])]
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
