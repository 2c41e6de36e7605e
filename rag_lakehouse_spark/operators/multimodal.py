"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed via Arrow-batched
``mapInPandas``.

The Spark-side plumbing (schemas, batch shapes, UDF signatures,
partitioning) is real and tested; the codec step itself is stubbed —
this container has no image/audio libraries — behind
``_decode_image_bytes``: by default a clearly-marked deterministic
fake (header-parsed dims + byte statistics), with a
``NotImplementedError`` guard for codecs the fake can't parse. Swap in
a real decoder (PIL/ffmpeg) by passing ``decode_fn``.

Scale: media rows are large and few per partition — repartition by a
size budget (``target_rows_per_batch``) before decode so one huge
partition doesn't serialize the stage; Arrow moves the bytes
zero-copy-ish into pandas.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("sha1", T.StringType()),
    ]
)


def _decode_image_bytes(content: bytes) -> tuple[int, int]:
    """STUB DECODER. Parses PNG IHDR dims for real; any other format
    raises NotImplementedError (no codec libs in this container) —
    production swaps this for PIL/turbojpeg via the ``decode_fn``
    parameter of ``image_features``."""
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", content[16:24])
        return int(w), int(h)
    raise NotImplementedError("only PNG headers supported by the stub decoder")


def image_features(
    df: DataFrame,
    decode_fn: Callable[[bytes], tuple[int, int]] | None = None,
    id_col: str = "media_id",
    content_col: str = "content",
    target_rows_per_batch: int = 64,
) -> DataFrame:
    """Decode + feature-extract images: (media_id, width, height,
    mean_byte, sha1). Runs as mapInPandas so the decoder executes
    executor-side over Arrow batches; undecodable rows get null dims
    (they carry the byte-level features regardless)."""
    decode = decode_fn or _decode_image_bytes

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                b = bytes(content) if content is not None else b""
                try:
                    w, h = decode(b)
                except NotImplementedError:
                    w = h = None
                arr = np.frombuffer(b, dtype=np.uint8)
                rows.append(
                    (
                        rid,
                        w,
                        h,
                        float(arr.mean()) if arr.size else 0.0,
                        hashlib.sha1(b).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mean_byte", "sha1"]
            )

    fanned = df.select(id_col, content_col).repartition(
        max(df.sparkSession.sparkContext.defaultParallelism, 1)
    )
    return fanned.mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


def media_embed(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    dim: int = 64,
) -> DataFrame:
    """Deterministic pseudo-embedding of media bytes (blake2b-seeded
    unit vector) — the byte-level stand-in for a real vision/audio
    encoder; same UDF shape (iterator pandas, array<float> out) the
    real model would use."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            out = []
            for content in s:
                b = bytes(content) if content is not None else b""
                seed = int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "big")
                rng = np.random.default_rng(seed)
                v = rng.standard_normal(dim).astype(np.float32)
                out.append(v / (np.linalg.norm(v) + 1e-12))
            yield pd.Series(out)

    return df.select(id_col, embed(F.col(content_col)).alias("embedding"))


def frame_sample_plan(
    df: DataFrame,
    every_n: int = 30,
    max_frames: int = 8,
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into the
    (media_id, frame_index) rows a decoder would materialize — the
    shuffle-free explode shape of frame extraction; the per-frame
    decode would plug into image_features. Frame count is stubbed from
    metadata (n_bytes heuristic) since no demuxer is available."""
    est_frames = F.least(
        F.greatest((F.col("meta.n_bytes") / 1024).cast("int"), F.lit(1)),
        F.lit(every_n * max_frames),
    )
    return df.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), est_frames - 1, F.lit(every_n))
        ).alias("frame_index"),
    )
