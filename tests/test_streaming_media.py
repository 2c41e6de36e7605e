"""Streaming-maintained media-metadata index == batch parse.

Header parsing is a per-row pure function of the bytes, so appending
each micro-batch's parsed rows as a delta cannot change the maintained
table — the union of deltas must equal the one-shot ``media_metadata``
over the same rows, cell-for-cell, across any batch partitioning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_lakehouse_spark.operators.multimodal import (
    media_metadata,
    synth_media_bytes,
)
from rag_lakehouse_spark.streaming.media_sink import (
    maintain_media_index,
    read_media_index,
)


def _media_df(spark, n=23):
    kinds = ["png", "bmp", "gif", "wav"]
    rows = []
    for i in range(n):
        kind = kinds[i % 4]
        rows.append(
            (
                i,
                bytearray(
                    synth_media_bytes(
                        kind,
                        width=4 + i,
                        height=3 + i,
                        channels=1 + i % 2,
                        sample_rate=8000 + 100 * i,
                        n_samples=i,
                    )
                ),
            )
        )
    rows.append((n, bytearray(b"\xff\xd8\xff not parseable")))  # fmt NULL path
    return spark.createDataFrame(rows, "media_id long, content binary")


def test_incremental_media_index_equals_batch_parse(spark, tmp_path_factory):
    media = _media_df(spark)
    src = str(tmp_path_factory.mktemp("media_stream"))
    media.repartition(5).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path_factory.mktemp("media_state")) + "/idx"
    maintain_media_index(spark, stream, state).awaitTermination()

    got = sorted(map(tuple, read_media_index(spark, state).collect()))
    want = sorted(map(tuple, media_metadata(media).collect()))
    assert got == want and len(got) == 24

    # second replay from the SAME checkpoint is a no-op (idempotent)
    stream2 = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    maintain_media_index(spark, stream2, state).awaitTermination()
    again = sorted(map(tuple, read_media_index(spark, state).collect()))
    assert again == want


def test_media_index_serves_typed_rows(spark, tmp_path_factory):
    media = _media_df(spark, n=8)
    src = str(tmp_path_factory.mktemp("media_stream2"))
    media.repartition(2).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path_factory.mktemp("media_state2")) + "/idx"
    maintain_media_index(spark, stream, state).awaitTermination()
    idx = read_media_index(spark, state)
    # bytes never enter the state — only typed metadata columns
    assert "content" not in idx.columns
    wavs = idx.filter(F.col("fmt") == "wav").collect()
    assert wavs and all(r.channels in (1, 2) and r.sample_rate >= 8000 for r in wavs)


import pytest

# r16 (VERDICT r15 #2): long referee family - excluded from the
# default fast run; seal runs use -m "slow or not slow".
pytestmark = pytest.mark.slow
