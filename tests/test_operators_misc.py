"""Embedding, multimodal, and text-operator unit coverage."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from rag_lakehouse_spark.operators.embedding import pseudo_embed_texts, pseudo_embed_udf
from rag_lakehouse_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    frame_sample_plan,
    image_features,
    media_embed,
)
from rag_lakehouse_spark.operators.text import predict_lang, with_quality_flags, with_token_stats


def _tiny_png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def test_pseudo_embed_deterministic_unit():
    a = pseudo_embed_texts(["hello", "world", ""])
    b = pseudo_embed_texts(["hello", "world", ""])
    assert np.allclose(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)
    assert not np.allclose(a[0], a[1])


def test_pseudo_embed_udf_matches_local(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "world")], "id long, text string")
    rows = df.select("id", pseudo_embed_udf()(F.col("text")).alias("e")).collect()
    local = pseudo_embed_texts(["hello", "world"])
    by_id = {r.id: np.array(r.e) for r in rows}
    assert np.allclose(by_id[1], local[0], atol=1e-6)
    assert np.allclose(by_id[2], local[1], atol=1e-6)


_ST_AVAILABLE = __import__("importlib").util.find_spec("sentence_transformers") is not None


@pytest.mark.skipif(
    not _ST_AVAILABLE,
    reason="sentence-transformers not installed in this container",
)
def test_sentence_transformer_parity_with_pseudo(spark):
    """Where the real model exists: sentence_transformer_udf must be a
    drop-in for pseudo_embed_udf — same column type (array<float>),
    deterministic output, fixed dimensionality (384 for MiniLM)."""
    from rag_lakehouse_spark.operators.embedding import sentence_transformer_udf

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine"), (3, None)], "id long, text string"
    )
    real = df.select("id", sentence_transformer_udf()(F.col("text")).alias("e"))
    pseudo = df.select("id", pseudo_embed_udf()(F.col("text")).alias("e"))
    assert real.schema["e"].dataType == pseudo.schema["e"].dataType
    rows_a = {r.id: r.e for r in real.collect()}
    rows_b = {r.id: r.e for r in real.collect()}
    assert all(len(v) == 384 for v in rows_a.values())
    assert rows_a == rows_b  # deterministic across invocations


@pytest.mark.skipif(
    _ST_AVAILABLE, reason="gate only observable without sentence-transformers"
)
def test_sentence_transformer_gate_raises_cleanly():
    """Without the dependency the factory must fail at construction time
    with a message naming the fallback — not deep inside an executor."""
    from rag_lakehouse_spark.operators.embedding import sentence_transformer_udf

    with pytest.raises(ImportError, match="pseudo_embed_udf"):
        sentence_transformer_udf()


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", bytearray(_tiny_png(64, 48)), "image/png", ("srcA", 100)),
        (2, "image", bytearray(b"\xff\xd8\xff notajpeg"), "image/jpeg", ("srcB", 10)),
        (3, "video", bytearray(b"\x00" * 4096), "video/mp4", ("srcC", 4096)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features_stub_decode(media):
    feats = {r.media_id: r for r in image_features(media).collect()}
    assert (feats[1].width, feats[1].height) == (64, 48)   # PNG header parsed
    assert feats[2].width is None                           # non-PNG → stub NotImplemented → nulls
    assert all(f.sha1 for f in feats.values())


def test_synth_parse_round_trip():
    """Every synthesized container must re-parse to its own parameters
    from BYTES ALONE, and its length must match the closed formula the
    media_metadata_report oracle uses."""
    from rag_lakehouse_spark.operators.multimodal import (
        _decode_image_bytes,
        _decode_wav_header,
        synth_media_bytes,
    )

    for w, h in [(1, 1), (16, 8), (47, 23), (60000, 33)]:
        png = synth_media_bytes("png", width=w, height=h)
        assert len(png) == 45 and _decode_image_bytes(png) == (w, h)
        bmp = synth_media_bytes("bmp", width=w, height=h)
        assert len(bmp) == 54 and _decode_image_bytes(bmp) == (w, h)
        if w <= 0xFFFF:  # GIF dims are u16
            gif = synth_media_bytes("gif", width=w, height=h)
            assert len(gif) == 14 and _decode_image_bytes(gif) == (w, h)
    for ch, sr, ns in [(1, 8000, 0), (2, 16000, 149), (1, 24000, 50)]:
        wav = synth_media_bytes("wav", channels=ch, sample_rate=sr, n_samples=ns)
        assert len(wav) == 44 + 2 * ch * ns
        assert _decode_wav_header(wav) == (ch, sr, ns)


def test_synth_parse_round_trip_property():
    """Hypothesis over the full parameter domains: any synthesized
    container must re-parse to its own parameters and match the closed
    byte-count formulas — not just the fixture grid."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_image_bytes,
        _decode_wav_header,
        synth_media_bytes,
    )

    @settings(max_examples=80, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=0xFFFF),
        h=st.integers(min_value=1, max_value=0xFFFF),
        ch=st.sampled_from([1, 2]),
        sr=st.integers(min_value=1, max_value=192000),
        ns=st.integers(min_value=0, max_value=500),
    )
    def check(w, h, ch, sr, ns):
        assert _decode_image_bytes(synth_media_bytes("png", width=w, height=h)) == (w, h)
        assert _decode_image_bytes(synth_media_bytes("bmp", width=w, height=h)) == (w, h)
        assert _decode_image_bytes(synth_media_bytes("gif", width=w, height=h)) == (w, h)
        wav = synth_media_bytes("wav", channels=ch, sample_rate=sr, n_samples=ns)
        assert len(wav) == 44 + 2 * ch * ns
        assert _decode_wav_header(wav) == (ch, sr, ns)

    check()


def test_pcm_payload_and_frames_round_trip_property():
    """r11 (VERDICT r10 #6): payload-level fuzz — arbitrary int16
    samples at hypothesis-chosen channel counts and frame lengths
    (incl. the 0-sample edge) must survive synth → _decode_wav_pcm
    bit-exactly, and the frame arithmetic must match an independent
    pure-Python referee (sign rule: "is negative", 0 non-negative)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_wav_pcm,
        _pcm_frames,
        synth_media_bytes,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        ch=st.sampled_from([1, 2, 4]),
        ns=st.integers(min_value=0, max_value=80),
        frame_len=st.sampled_from([1, 3, 64]),
        data=st.data(),
    )
    def check(ch, ns, frame_len, data):
        smp = data.draw(
            st.lists(
                st.integers(min_value=-32768, max_value=32767),
                min_size=ch * ns,
                max_size=ch * ns,
            )
        )
        wav = synth_media_bytes(
            "wav",
            channels=ch,
            sample_rate=8000,
            n_samples=ns,
            payload=struct.pack(f"<{ch * ns}h", *smp),
        )
        got_ch, got_sr, samples = _decode_wav_pcm(wav)
        assert (got_ch, got_sr) == (ch, 8000)
        assert samples.tolist() == smp
        ch0 = smp[::ch]
        want = []
        for f0 in range(0, len(ch0), frame_len):
            sub = ch0[f0 : f0 + frame_len]
            zc = sum(
                1
                for i in range(1, len(sub))
                if (sub[i - 1] < 0) != (sub[i] < 0)
            )
            want.append(
                (
                    f0 // frame_len,
                    len(sub),
                    sum(v * v for v in sub),
                    max(abs(v) for v in sub),
                    zc,
                )
            )
        assert _pcm_frames(samples[::ch], frame_len) == want

    check()


def test_decode_bmp_top_down_height():
    """Negative biHeight means top-down row order — dims report abs."""
    from rag_lakehouse_spark.operators.multimodal import _decode_image_bytes

    info = struct.pack("<IiiHHIIiiII", 40, 32, -24, 1, 24, 0, 0, 0, 0, 0, 0)
    bmp = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + info
    assert _decode_image_bytes(bmp) == (32, 24)


def test_decode_wav_walks_extra_and_odd_chunks():
    """The RIFF walker must skip an optional chunk between fmt and data
    and honor word-alignment padding for odd-length chunks."""
    from rag_lakehouse_spark.operators.multimodal import _decode_wav_header

    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 22050, 22050 * 4, 4, 16)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd → padded
    data = b"data" + struct.pack("<I", 8) + bytes(8)  # 2 samples x 2ch x 2B
    body = b"WAVE" + fmt + extra + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    assert _decode_wav_header(wav) == (2, 22050, 2)


def test_decoders_reject_garbage():
    from rag_lakehouse_spark.operators.multimodal import (
        _decode_image_bytes,
        _decode_wav_header,
    )

    for b in [b"", b"\xff\xd8\xff notajpeg", b"RIFFxxxx????"]:
        with pytest.raises(NotImplementedError):
            _decode_image_bytes(b)
        with pytest.raises(NotImplementedError):
            _decode_wav_header(b)


def test_wav_decoder_degrades_on_malformed_not_crashes():
    """r10 review finding: malformed RIFF streams must raise
    NotImplementedError (the media_metadata fmt-NULL path), never
    struct.error or ZeroDivisionError — one corrupt row must not fail
    a whole task."""
    from rag_lakehouse_spark.operators.multimodal import _decode_wav_header

    cases = [
        # fmt declares 16 bytes but the buffer ends — fixed-offset
        # reads would hit an empty slice (struct.error before the fix)
        b"RIFF" + struct.pack("<I", 12) + b"WAVEfmt " + struct.pack("<I", 16),
        # channels=0 — n_samples division (ZeroDivisionError before)
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 0, 8000, 0, 0, 16)
        + b"data" + struct.pack("<I", 4) + bytes(4),
        # fmt chunk declares only 8 bytes — field reads would overlap
        # the next chunk's header (silent garbage before)
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", 8) + bytes(8)
        + b"data" + struct.pack("<I", 0),
        # 7-bit samples — not whole-byte PCM
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 7)
        + b"data" + struct.pack("<I", 4) + bytes(4),
    ]
    for b in cases:
        with pytest.raises(NotImplementedError):
            _decode_wav_header(b)


def test_wav_pcm_rejects_unaligned_and_non16bit(spark):
    """ADVICE r10 (medium): a data chunk whose declared byte length is
    not a whole number of int16 frames made np.frombuffer raise
    ValueError and crash the task. Both walkers must instead raise
    NotImplementedError, and audio_features must degrade to NULLs."""
    from rag_lakehouse_spark.operators.multimodal import (
        _decode_wav_header,
        _decode_wav_pcm,
        audio_features,
    )

    def wav_with_data(fmt_fields, data_payload):
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, *fmt_fields)
            + b"data" + struct.pack("<I", len(data_payload)) + data_payload
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # 1ch 16-bit, 3-byte data chunk — odd, not int16-aligned
    odd = wav_with_data((1, 8000, 16000, 2, 16), b"abc")
    with pytest.raises(NotImplementedError):
        _decode_wav_pcm(odd)
    # 2ch 16-bit, 6-byte chunk: even (frombuffer-safe) but NOT frame
    # (channels*2)-aligned — header n_samples would disagree with the
    # payload, so it must also raise
    half_frame = wav_with_data((2, 8000, 32000, 4, 16), bytes(6))
    with pytest.raises(NotImplementedError):
        _decode_wav_pcm(half_frame)
    # 8-bit PCM parses as a header but is not PCM16-decodable
    pcm8 = wav_with_data((1, 8000, 8000, 1, 8), bytes(4))
    assert _decode_wav_header(pcm8) == (1, 8000, 4)
    with pytest.raises(NotImplementedError):
        _decode_wav_pcm(pcm8)
    # the operator-level contract: such rows yield NULL features
    df = spark.createDataFrame(
        [(1, bytearray(odd)), (2, bytearray(half_frame)), (3, bytearray(pcm8))],
        "media_id long, content binary",
    )
    got = {r.media_id: r for r in audio_features(df).collect()}
    assert all(got[i].sum_sq is None for i in (1, 2, 3))


def test_wav_walkers_agree_on_multiple_data_chunks():
    """ADVICE r10 (low): header kept the LAST data chunk's length while
    the pcm decoder returned the FIRST chunk's samples. The shared
    walker now raises on a second data chunk so they cannot disagree."""
    from rag_lakehouse_spark.operators.multimodal import (
        _decode_wav_header,
        _decode_wav_pcm,
    )

    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 4) + bytes(4)
        + b"data" + struct.pack("<I", 8) + bytes(8)
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        _decode_wav_header(wav)
    with pytest.raises(NotImplementedError):
        _decode_wav_pcm(wav)


def test_bmp_core_header_rejected():
    """ADVICE r10 (low): a 12-byte BITMAPCOREHEADER stores 16-bit dims —
    parsing it with the INFOHEADER layout returned garbage. It must
    raise NotImplementedError like other unsupported layouts."""
    from rag_lakehouse_spark.operators.multimodal import _decode_image_bytes

    # BITMAPCOREHEADER: bcSize=12, 16-bit width=32 height=24, planes, bpp
    core = struct.pack("<IHHHH", 12, 32, 24, 1, 24)
    bmp = b"BM" + struct.pack("<IHHI", 26, 0, 0, 26) + core + bytes(8)
    with pytest.raises(NotImplementedError):
        _decode_image_bytes(bmp)
    # the V4/V5 extensions share the INFOHEADER dim layout and stay parsed
    v4 = struct.pack("<Iii", 108, 32, 24) + bytes(96)
    bmp_v4 = b"BM" + struct.pack("<IHHI", 122, 0, 0, 122) + v4
    assert _decode_image_bytes(bmp_v4) == (32, 24)


def test_audio_features_exact_energy(spark):
    """audio_features must recover the exact integer energy and peak
    from the PCM payload, NULL out undecodable rows, and reject a
    data chunk whose declared length exceeds the buffer."""
    from rag_lakehouse_spark.operators.multimodal import (
        _decode_wav_pcm,
        audio_features,
        synth_media_bytes,
    )

    samples = [3, -4, 1000, -1000, 0, 7]
    wav = synth_media_bytes(
        "wav", channels=2, sample_rate=8000, n_samples=3,
        payload=struct.pack("<6h", *samples),
    )
    garbage = b"RIFF" + struct.pack("<I", 4) + b"WAVE"  # no fmt/data
    truncated = wav[:-2]  # data chunk declares more than the buffer holds
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(garbage)), (3, bytearray(truncated))],
        "media_id long, content binary",
    )
    got = {r.media_id: r for r in audio_features(df).collect()}
    want_ss = sum(s * s for s in samples)
    assert (got[1].channels, got[1].sample_rate, got[1].n_samples) == (2, 8000, 3)
    assert got[1].sum_sq == want_ss and got[1].peak_abs == 1000
    import math

    assert got[1].rms == math.sqrt(want_ss / 6)
    assert got[2].sum_sq is None and got[3].sum_sq is None
    with pytest.raises(NotImplementedError):
        _decode_wav_pcm(truncated)


def test_md5_embed_rejects_out_of_range_dim():
    from rag_lakehouse_spark.functions import vector as VEC

    for bad in (0, 33):
        with pytest.raises(ValueError):
            VEC.md5_embed("text", dim=bad)
        with pytest.raises(ValueError):
            VEC.duckdb_md5_embed("text", dim=bad)


def test_media_metadata_operator_mixed(spark):
    """media_metadata over a mixed batch: typed rows for every codec,
    fmt NULL + byte count only for undecodable content."""
    from rag_lakehouse_spark.operators.multimodal import (
        media_metadata,
        synth_media_bytes,
    )

    rows = [
        (1, bytearray(synth_media_bytes("png", width=9, height=7))),
        (2, bytearray(synth_media_bytes("bmp", width=5, height=6))),
        (3, bytearray(synth_media_bytes("gif", width=3, height=4))),
        (4, bytearray(synth_media_bytes("wav", channels=2, sample_rate=8000, n_samples=10))),
        (5, bytearray(b"\xff\xd8\xff garbage")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r for r in media_metadata(df).collect()}
    assert (got[1].fmt, got[1].width, got[1].height) == ("png", 9, 7)
    assert (got[2].fmt, got[2].width, got[2].height) == ("bmp", 5, 6)
    assert (got[3].fmt, got[3].width, got[3].height) == ("gif", 3, 4)
    assert (got[4].fmt, got[4].channels, got[4].sample_rate, got[4].n_samples) == (
        "wav", 2, 8000, 10,
    )
    assert got[4].n_bytes == 44 + 2 * 2 * 10
    assert got[5].fmt is None and got[5].n_bytes == len(rows[4][1])


def test_media_embed_shape(media):
    rows = media_embed(media, dim=16).collect()
    assert all(len(r.embedding) == 16 for r in rows)
    norms = [float(np.linalg.norm(r.embedding)) for r in rows]
    assert all(abs(n - 1.0) < 1e-4 for n in norms)


def test_frame_sample_plan(media):
    frames = frame_sample_plan(media.filter(F.col("kind") == "video"), every_n=2, max_frames=3)
    idx = sorted(r.frame_index for r in frames.collect())
    assert idx and idx[0] == 0 and all(i % 2 == 0 for i in idx)


def test_token_stats_and_quality(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "x " * 200)], "doc_id long, text string"
    )
    stats = {r.doc_id: r for r in with_token_stats(df).collect()}
    assert stats[1].n_tokens == 6
    assert stats[1].stopword_ratio == pytest.approx(3 / 6)  # the, on, the
    flags = {r.doc_id: r for r in with_quality_flags(df).collect()}
    assert flags[1].passes_quality is False  # too short (< 100 chars)
    assert flags[2].passes_quality is True


def test_predict_lang_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the house of the king is full of gold and it is old"),
            (2, "der hund und die katze das ist gut und der tag ist lang"),
            (3, "le chat et la maison les arbres est grand et le ciel"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.pred_lang for r in predict_lang(df).collect()}
    assert out == {1: "en", 2: "de", 3: "fr"}


def test_strip_boilerplate_removes_shared_lines_preserving_order(spark):
    from rag_lakehouse_spark.operators.text import boilerplate_lines, strip_boilerplate

    docs = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nreal content one\n\nmore text\nCOOKIE BANNER"),
            (2, "  COOKIE BANNER  \nunique stuff"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    bp = {r["line"]: r["n_docs"] for r in boilerplate_lines(docs).collect()}
    assert bp == {"COOKIE BANNER": 2}  # trimmed match across docs; blank not counted
    out = {r["doc_id"]: r for r in strip_boilerplate(docs).collect()}
    assert out[1]["cleaned"] == "real content one\n\nmore text"  # order + blank kept
    assert (out[1]["n_lines"], out[1]["n_stripped"]) == (5, 2)
    assert out[2]["cleaned"] == "unique stuff"
    assert out[3]["cleaned"] == "" and out[3]["n_lines"] == 1  # NULL text → one blank line kept
    assert out[3]["n_stripped"] == 0


def test_weighted_sample_biases_toward_heavy_docs(spark, sf_dir):
    """The Efraimidis-Spirakis race must actually weight: the sampled
    docs' mean char count exceeds the population mean (deterministic
    for the fixed seed — measured 350 vs 306 at sf0.001), and the
    sample is exactly the requested size with no duplicates."""
    from rag_lakehouse_spark.plans import registry

    registry._load_all()
    rows = registry.QUERIES["corpus_weighted_sample"].fn(spark, sf_dir).collect()
    assert len(rows) == 100
    ids = [r["doc_id"] for r in rows]
    assert len(set(ids)) == 100  # without replacement
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    from rag_lakehouse_spark.sources.tables import load_table

    pop_mean = (
        load_table(spark, sf_dir, "documents")
        .agg({"n_chars": "avg"})
        .collect()[0][0]
    )
    assert sample_mean > pop_mean


def test_bmp_pixel_round_trip_property():
    """r11: pixel-level fuzz — arbitrary pixel bytes at
    hypothesis-chosen dims (stride padding exercised by non-multiple-
    of-4 widths) must survive synth -> _decode_bmp_pixels bit-exactly,
    with rows back in TOP-DOWN image order."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_bmp_pixels,
        synth_media_bytes,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=9),
        h=st.integers(min_value=1, max_value=7),
        data=st.data(),
    )
    def check(w, h, data):
        raw = bytes(
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=255),
                    min_size=3 * w * h,
                    max_size=3 * w * h,
                )
            )
        )
        bmp = synth_media_bytes("bmp", width=w, height=h, payload=raw)
        w2, h2, img = _decode_bmp_pixels(bmp)
        assert (w2, h2) == (w, h)
        assert img.tobytes() == raw
        # flip-sensitivity: the writer stores rows bottom-up, so the
        # FILE bytes of row 0 differ from the image's row 0 iff h > 1
        # and the rows differ — the decoder must have un-flipped.
        want = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
        assert np.array_equal(img, want)

    check()


def test_bmp_pixel_decoder_degrades_on_malformed_not_crashes():
    """Header-only BMPs, truncated pixel data, and top-down (negative
    height) layouts: the first two raise NotImplementedError per the
    contract; the last decodes WITHOUT the flip."""
    import struct as _struct

    import numpy as np
    import pytest as _pytest

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_bmp_pixels,
        synth_media_bytes,
    )

    with _pytest.raises(NotImplementedError):
        _decode_bmp_pixels(synth_media_bytes("bmp", width=4, height=2))
    full = synth_media_bytes("bmp", width=4, height=2, payload=bytes(range(24)))
    with _pytest.raises(NotImplementedError):
        _decode_bmp_pixels(full[:-1])  # truncated pixel data
    with _pytest.raises(NotImplementedError):
        _decode_bmp_pixels(synth_media_bytes("png", width=4, height=2))
    # top-down variant: flip sign of biHeight and pre-flip the rows
    raw = bytes(range(24))
    td = bytearray(synth_media_bytes("bmp", width=4, height=2, payload=raw))
    td[22:26] = _struct.pack("<i", -2)
    body = bytes(td[:54]) + bytes(td[54:66]) + bytes(td[66:78])
    w, h, img = _decode_bmp_pixels(bytes(td))
    assert (w, h) == (4, 2)
    # bottom-up file + negative height => decoder must NOT flip, so the
    # image comes back vertically mirrored vs the positive-height read
    _, _, img_pos = _decode_bmp_pixels(
        synth_media_bytes("bmp", width=4, height=2, payload=raw)
    )
    assert np.array_equal(img, img_pos[::-1])


def test_gif_frame_walk_round_trip_property():
    """r11: frame-level fuzz — hypothesis-chosen frame lists (geometry,
    delays, data lengths spanning the multi-sub-block boundary at 255,
    0-byte data, 0 frames) must survive synth -> _walk_gif_frames
    exactly, with data bytes chosen to LOOK like block introducers so
    only length-correct skipping passes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.multimodal import (
        _walk_gif_frames,
        synth_media_bytes,
    )

    _frame = st.tuples(
        st.integers(min_value=0, max_value=100),  # left
        st.integers(min_value=0, max_value=100),  # top
        st.integers(min_value=1, max_value=300),  # fw
        st.integers(min_value=1, max_value=300),  # fh
        st.integers(min_value=0, max_value=65535),  # delay_cs
        st.integers(min_value=0, max_value=600),  # data length
    )

    @settings(max_examples=40, deadline=None)
    @given(frames=st.lists(_frame, max_size=6))
    def check(frames):
        adv = bytes([0x2C, 0x3B, 0x21, 0x00, 0xF9, 0xFF])
        fr = [
            (l, t, w, h, d, (adv * ((n // len(adv)) + 1))[:n])
            for l, t, w, h, d, n in frames
        ]
        gif = synth_media_bytes("gif", width=10, height=5, frames=fr)
        got = _walk_gif_frames(gif)
        want = [
            (i, l, t, w, h, d, len(data))
            for i, (l, t, w, h, d, data) in enumerate(fr)
        ]
        assert got == want
        if frames:  # truncation inside the last frame must raise
            import pytest as _pytest

            with _pytest.raises(NotImplementedError):
                _walk_gif_frames(gif[:-2])

    check()


def test_gif_lzw_round_trip_property():
    """r11: the full variable-width LZW codec — arbitrary index
    streams (random, constant runs, repeating patterns; sizes
    crossing the 9->10->11-bit width bumps) must round-trip
    encode -> decode bit-exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    _stream = st.one_of(
        st.binary(max_size=400),
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=2000),
        ).map(lambda t: bytes([t[0]]) * t[1]),
        st.tuples(st.binary(min_size=1, max_size=6), st.integers(1, 400)).map(
            lambda t: (t[0] * t[1])[:2000]
        ),
    )

    @settings(max_examples=60, deadline=None)
    @given(data=_stream)
    def check(data):
        assert _lzw_decode(_lzw_encode(data)) == data

    check()


def test_gif_lzw_4096_boundary_round_trip():
    """r12 (ADVICE): a low-repetition stream large enough to grow the
    code table to the 4096 ceiling and force at least one CLEAR reset
    in the encoder — the table-full branch was previously untested in
    CI. Seeded random, 16 KiB."""
    import random as _random

    from rag_lakehouse_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    rng = _random.Random(0xC0DE)
    data = bytes(rng.randrange(256) for _ in range(16384))
    enc = _lzw_encode(data)
    # random bytes grow ~1 code per input byte: 16K input must hit the
    # 4096 ceiling (and therefore a CLEAR reset) at least twice
    assert _lzw_decode(enc) == data


def test_gif_lzw_deferred_clear_decode():
    """r12 (ADVICE): spec-valid GIFs from standard encoders often use
    the DEFERRED-clear convention — stop adding table entries at 4096
    WITHOUT emitting CLEAR and keep coding with the frozen table. The
    decoder must freeze its table identically or it mis-decodes every
    code after the ceiling. Encoder variant below is deferred-clear."""
    import random as _random

    from rag_lakehouse_spark.operators.multimodal import _lzw_decode

    def deferred_encode(indices: bytes, min_code_size: int = 8) -> bytes:
        clear, end = 1 << min_code_size, (1 << min_code_size) + 1
        table = {bytes([i]): i for i in range(clear)}
        next_code = end + 1
        width = min_code_size + 1
        out = bytearray()
        acc = n_bits = 0

        def emit(code):
            nonlocal acc, n_bits
            acc |= code << n_bits
            n_bits += width
            while n_bits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                n_bits -= 8

        emit(clear)
        w = b""
        for b in indices:
            wk = w + bytes([b])
            if wk in table:
                w = wk
                continue
            emit(table[w])
            if next_code <= 4095:  # freeze at 4096 entries, never CLEAR
                table[wk] = next_code
                next_code += 1
                if next_code - 1 == (1 << width) and width < 12:
                    width += 1
            w = bytes([b])
        if w:
            emit(table[w])
        emit(end)
        if n_bits:
            out.append(acc & 0xFF)
        return bytes(out)

    rng = _random.Random(0xBEEF)
    data = bytes(rng.randrange(256) for _ in range(16384))
    assert _lzw_decode(deferred_encode(data)) == data
    # short streams (table never fills) are unaffected by the freeze
    assert _lzw_decode(deferred_encode(b"banana" * 20)) == b"banana" * 20


def test_gif_pixel_round_trip_property_and_malformed():
    """r11: synth -> _decode_gif_pixels — hypothesis-chosen frame
    geometries and ARBITRARY index bytes must come back bit-exact in
    scanline order; interlace/local-table flags and truncation raise
    per the contract."""
    import struct as _struct

    import pytest as _pytest
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_gif_pixels,
        synth_media_bytes,
    )

    pal = bytes(range(256)) * 3  # any 768 bytes form a palette

    _frame = st.tuples(
        st.integers(0, 20),  # left
        st.integers(0, 20),  # top
        st.integers(1, 12),  # fw
        st.integers(1, 9),  # fh
        st.integers(0, 1000),  # delay
    )

    @settings(max_examples=30, deadline=None)
    @given(frames=st.lists(_frame, min_size=1, max_size=4), data=st.data())
    def check(frames, data):
        fr = []
        for l, t, fw, fh, d in frames:
            idx = bytes(
                data.draw(
                    st.lists(
                        st.integers(0, 255),
                        min_size=fw * fh,
                        max_size=fw * fh,
                    )
                )
            )
            fr.append((l, t, fw, fh, d, idx))
        gif = synth_media_bytes(
            "gif", width=30, height=20, palette=pal, pixel_frames=fr
        )
        palette, got = _decode_gif_pixels(gif)
        assert palette.tobytes() == pal
        assert [(g[0], g[1], g[2], g[3], g[4]) for g in got] == [
            (f[0], f[1], f[2], f[3], f[4]) for f in fr
        ]
        for g, f in zip(got, fr):
            assert g[5].tobytes() == f[5]
        with _pytest.raises(NotImplementedError):
            _decode_gif_pixels(gif[:-2])  # truncated

    check()

    base = synth_media_bytes(
        "gif", width=4, height=3, palette=pal,
        pixel_frames=[(0, 0, 2, 2, 5, bytes(4))],
    )
    # interlace flag on the image descriptor (after 13+768 header+GCT
    # and the 8-byte GCE: introducer+desc fields end at +9)
    desc_flags_off = 13 + 768 + 8 + 9
    assert base[13 + 768 + 8] == 0x2C
    inter = bytearray(base)
    inter[desc_flags_off] |= 0x40
    with _pytest.raises(NotImplementedError):
        _decode_gif_pixels(bytes(inter))
    local = bytearray(base)
    local[desc_flags_off] |= 0x80
    with _pytest.raises(NotImplementedError):
        _decode_gif_pixels(bytes(local))
    # no global color table -> pixel decode refuses (walker still works)
    plain = synth_media_bytes("gif", width=4, height=3)
    with _pytest.raises(NotImplementedError):
        _decode_gif_pixels(plain)


def test_gif_pixel_decoder_rejects_bad_min_code_size():
    """Review catch: a corrupted LZW min-code byte (> 8) must degrade
    per the decoder contract (NotImplementedError -> row skipped), not
    blow up building a >256-literal table (ValueError would kill the
    Spark task)."""
    import pytest as _pytest

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_gif_pixels,
        synth_media_bytes,
    )

    pal = bytes(range(256)) * 3
    gif = bytearray(
        synth_media_bytes(
            "gif", width=4, height=3, palette=pal,
            pixel_frames=[(0, 0, 2, 2, 5, bytes(4))],
        )
    )
    mcs_off = 13 + 768 + 8 + 10  # header + GCT + GCE + descriptor
    assert gif[mcs_off] == 8
    gif[mcs_off] = 9
    with _pytest.raises(NotImplementedError):
        _decode_gif_pixels(bytes(gif))


def test_png_pixel_round_trip_property():
    """r12 (VERDICT r11 #1): arbitrary pixel bytes at hypothesis-chosen
    dims must survive synth -> _decode_png_pixels bit-exactly. Heights
    >= 5 force the writer's y%5 filter cycle through every filter type
    (None/Sub/Up/Average/Paeth); per-filter single-row checks below
    pin each unfilter branch in isolation."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_png_pixels,
        synth_media_bytes,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=9),
        h=st.integers(min_value=1, max_value=12),
        data=st.data(),
    )
    def check(w, h, data):
        raw = bytes(
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=255),
                    min_size=3 * w * h,
                    max_size=3 * w * h,
                )
            )
        )
        png = synth_media_bytes("png", width=w, height=h, payload=raw)
        w2, h2, img = _decode_png_pixels(png)
        assert (w2, h2) == (w, h)
        assert img.tobytes() == raw
        assert np.array_equal(
            img, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
        )

    check()


def test_png_each_filter_type_in_isolation():
    """Each of the five PNG filters reversed correctly on its own: a
    hand-built two-row image per filter type (row 0 fixed None, row 1
    the filter under test) so a broken branch can't hide behind the
    y%5 cycle."""
    import struct as _struct
    import zlib as _zlib

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_png_pixels,
        _png_paeth,
    )

    def chunk(ctype, body):
        return (
            _struct.pack(">I", len(body))
            + ctype
            + body
            + _struct.pack(">I", _zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    w = 4
    row0 = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    row1 = bytes([13, 7, 255, 0, 128, 64, 200, 3, 99, 250, 1, 77])
    for ftype in range(5):
        filt = bytearray()
        for i, v in enumerate(row1):
            a = row1[i - 3] if i >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = row0[i]
            elif ftype == 3:
                pred = (a + row0[i]) >> 1
            else:
                c = row0[i - 3] if i >= 3 else 0
                pred = _png_paeth(a, row0[i], c)
            filt.append((v - pred) & 0xFF)
        raw = b"\x00" + row0 + b"" + bytes([ftype]) + bytes(filt)
        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", _struct.pack(">II5B", w, 2, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", _zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        _, _, img = _decode_png_pixels(png)
        assert img.tobytes() == row0 + row1, f"filter {ftype}"


def test_png_pixel_decoder_rejects_malformed():
    """Interlace, bad CRC, undefined filter bytes, truncated IDAT, and
    size-mismatched payloads all raise NotImplementedError per the
    media-decoder contract."""
    import struct as _struct
    import zlib as _zlib

    import pytest as _pytest

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_png_pixels,
        synth_media_bytes,
    )

    good = synth_media_bytes("png", width=4, height=3, payload=bytes(36))

    def chunk(ctype, body):
        return (
            _struct.pack(">I", len(body))
            + ctype
            + body
            + _struct.pack(">I", _zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    # Adam7 flag with SEQUENTIAL-sized data: since session 2 the
    # decoder deinterlaces for real, so a stream whose length
    # disagrees with the seven pass geometries must be rejected as
    # truncated, not silently misread (4x3 needs 42 Adam7 bytes; the
    # sequential layout supplies 39)
    interlaced = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">II5B", 4, 3, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", _zlib.compress(bytes(3 * (4 * 3 + 1))))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(NotImplementedError, match="interlace"):
        _decode_png_pixels(interlaced)
    # undefined interlace method (2)
    bad_ilace = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">II5B", 4, 3, 8, 2, 0, 0, 2))
        + chunk(b"IDAT", _zlib.compress(bytes(42)))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(NotImplementedError, match="interlace method"):
        _decode_png_pixels(bad_ilace)
    # RGBA color type stays outside the supported matrix (r12 widened
    # it to gray/truecolor/palette)
    rgba = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">II5B", 4, 3, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", b"x")
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(NotImplementedError, match="gray/truecolor/palette"):
        _decode_png_pixels(rgba)
    # palette color type WITHOUT a PLTE chunk
    pal = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">II5B", 4, 3, 8, 3, 0, 0, 0))
        + chunk(b"IDAT", b"x")
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(NotImplementedError, match="missing PLTE"):
        _decode_png_pixels(pal)
    # corrupt one IDAT payload byte -> CRC mismatch
    bad = bytearray(good)
    idat = good.index(b"IDAT")
    bad[idat + 5] ^= 0xFF
    with _pytest.raises(NotImplementedError, match="CRC"):
        _decode_png_pixels(bytes(bad))
    # truncated stream
    with _pytest.raises(NotImplementedError):
        _decode_png_pixels(good[:-4])
    # undefined filter byte (5), CRC re-stamped so only the filter fails
    raw = bytearray(bytes(3 * (4 * 3 + 1)))
    raw[0] = 5
    undef = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">II5B", 4, 3, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", _zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(NotImplementedError, match="filter"):
        _decode_png_pixels(undef)
    # inflated size disagrees with IHDR dims (one scanline short)
    short = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">II5B", 4, 3, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", _zlib.compress(bytes(2 * (4 * 3 + 1))))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(NotImplementedError, match="size"):
        _decode_png_pixels(short)
    # header-only synth (no IDAT) and non-PNG bytes
    with _pytest.raises(NotImplementedError):
        _decode_png_pixels(synth_media_bytes("png", width=4, height=3))
    with _pytest.raises(NotImplementedError):
        _decode_png_pixels(synth_media_bytes("bmp", width=4, height=3))


def test_jpeg_walk_round_trip_property():
    """r12: hypothesis over the full JPEG synth parameter domain —
    dims, component counts, progressive flag, JFIF minor, Exif
    presence, and arbitrary entropy bytes (0xFF-dense streams stress
    the byte-stuffing unstuff-count) must survive synth_jpeg_bytes ->
    _walk_jpeg exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.multimodal import (
        _walk_jpeg,
        synth_jpeg_bytes,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=0xFFFF),
        h=st.integers(min_value=1, max_value=0xFFFF),
        nc=st.integers(min_value=1, max_value=4),
        prog=st.booleans(),
        minor=st.integers(min_value=0, max_value=9),
        exif=st.booleans(),
        ent=st.one_of(
            st.binary(max_size=120),
            st.just(b"\xff" * 40),  # maximal stuffing density
        ),
    )
    def check(w, h, nc, prog, minor, exif, ent):
        j = synth_jpeg_bytes(w, h, nc, prog, minor, exif, ent)
        assert _walk_jpeg(j) == (
            w, h, nc, prog, 1, minor, exif, len(ent), 5 + exif,
        )

    check()


def test_jpeg_walk_rejects_malformed():
    """Missing SOI, truncation everywhere (segment header, segment
    body, entropy run, before EOI), missing SOF, and a bare marker
    inside the entropy run all raise per the contract."""
    import pytest as _pytest

    from rag_lakehouse_spark.operators.multimodal import (
        _walk_jpeg,
        synth_jpeg_bytes,
    )

    good = synth_jpeg_bytes(8, 4, 3, entropy=bytes(range(20)))
    with _pytest.raises(NotImplementedError):
        _walk_jpeg(b"")
    with _pytest.raises(NotImplementedError):
        _walk_jpeg(b"\x89PNG\r\n\x1a\n")
    with _pytest.raises(NotImplementedError):
        _walk_jpeg(good[:-2])  # truncated before EOI
    for cut in (3, 5, 10, len(good) - 10):
        with _pytest.raises(NotImplementedError):
            _walk_jpeg(good[:cut])
    # missing SOF: SOI + APP0 + EOI only
    no_sof = good[:2] + good[2 : 2 + 2 + 16] + b"\xff\xd9"
    with _pytest.raises(NotImplementedError):
        _walk_jpeg(no_sof)
    # bare non-RST marker inside the entropy run
    bad = bytearray(good)
    eoi = len(bad) - 2
    bad[eoi - 5 : eoi - 3] = b"\xff\xc0"
    with _pytest.raises(NotImplementedError):
        _walk_jpeg(bytes(bad))


def test_jpeg_coeff_round_trip_property():
    """r13: the baseline JPEG entropy layer is LOSSLESS over quantized
    coefficients — hypothesis-chosen dims / component counts /
    coefficient patterns (signed ACs up to category 10, zero runs long
    enough to force ZRL, DC swings forcing every DPCM category) encode
    and decode back EXACTLY. This is the general-coefficient evidence
    behind media_jpeg_pixels' flat-block oracle construction."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_jpeg_coeffs,
        synth_jpeg_coeff_bytes,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        bw=st.integers(min_value=1, max_value=4),
        bh=st.integers(min_value=1, max_value=3),
        nc=st.sampled_from([1, 3]),
        seed=st.integers(min_value=0, max_value=2**31),
        data=st.data(),
    )
    def check(bw, bh, nc, seed, data):
        import random

        rng = random.Random(seed)
        n_mcu = bw * bh
        comp = []
        for _c in range(nc):
            blocks = []
            for _m in range(n_mcu):
                blk = [0] * 64
                blk[0] = rng.randint(-255, 255)
                # a sparse tail (forces EOB), sometimes a lone late
                # coefficient (forces ZRL runs)
                for _ in range(rng.randint(0, 10)):
                    k = rng.randint(1, 63)
                    v = rng.randint(-1023, 1023)
                    blk[k] = v if v != 0 else 1
                blocks.append(blk)
            comp.append(blocks)
        content = synth_jpeg_coeff_bytes(8 * bw, 8 * bh, comp)
        w2, h2, got, qts, samp = _decode_jpeg_coeffs(content)
        assert (w2, h2) == (8 * bw, 8 * bh)
        assert got == comp
        assert qts[0][0] == 8 and set(qts[0][1:]) == {1}
        assert samp == [(1, 1)] * nc

    check()


def test_jpeg_coeff_round_trip_420_property():
    """r13: the 4:2:0 MCU interleave (four Y blocks + Cb + Cr per
    16x16 MCU, per-component raster grids) is lossless over quantized
    coefficients too — the writer's interleave and the decoder's
    de-interleave must be exact inverses at hypothesis-chosen MCU
    grids and coefficient patterns."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_jpeg_coeffs,
        synth_jpeg_coeff_bytes,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        mcux=st.integers(min_value=1, max_value=3),
        mcuy=st.integers(min_value=1, max_value=2),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def check(mcux, mcuy, seed):
        import random

        rng = random.Random(seed)
        comp = []
        for grid in (4 * mcux * mcuy, mcux * mcuy, mcux * mcuy):
            blocks = []
            for _ in range(grid):
                blk = [0] * 64
                blk[0] = rng.randint(-255, 255)
                for _ in range(rng.randint(0, 6)):
                    k = rng.randint(1, 63)
                    blk[k] = rng.choice([-7, -1, 1, 300])
                blocks.append(blk)
            comp.append(blocks)
        content = synth_jpeg_coeff_bytes(
            16 * mcux, 16 * mcuy, comp, subsample=True
        )
        w2, h2, got, _qts, samp = _decode_jpeg_coeffs(content)
        assert (w2, h2) == (16 * mcux, 16 * mcuy)
        assert samp == [(2, 2), (1, 1), (1, 1)]
        assert got == comp

    check()


def test_jpeg_flat_pixels_exact_property():
    """r13: flat (DC-only) blocks decode to EXACTLY their input values
    through the full lossy pipeline — the integer-exactness argument
    (flat ⇒ pure DC = 8(v−128); DC-quant 8 ⇒ stored v−128; IDCT ⇒ v)
    media_jpeg_pixels relies on, at hypothesis-chosen dims/values."""
    import numpy as _np

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        synth_jpeg_flat_bytes,
    )

    @settings(max_examples=30, deadline=None)
    @given(
        bw=st.integers(min_value=1, max_value=5),
        bh=st.integers(min_value=1, max_value=3),
        nc=st.sampled_from([1, 3]),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def check(bw, bh, nc, seed):
        import random

        rng = random.Random(seed)
        vals = [
            [rng.randint(0, 255) for _ in range(bw * bh)] for _ in range(nc)
        ]
        w, h, planes, n_blk = _decode_jpeg_pixels(
            synth_jpeg_flat_bytes(8 * bw, 8 * bh, vals)
        )
        assert (w, h) == (8 * bw, 8 * bh)
        assert len(planes) == nc
        assert n_blk == nc * bw * bh
        for c in range(nc):
            for i, v in enumerate(vals[c]):
                by, bx = divmod(i, bw)
                blk = planes[c][8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8]
                assert (blk == _np.uint8(v)).all()

    check()


def test_jpeg_flat_pixels_420_exact_property():
    """r13: the 4:2:0 path stays integer-exact — flat Y blocks decode
    to their values at full resolution; each flat chroma block decodes
    and nearest-neighbor upsamples to EXACTLY its value over its
    16x16 MCU footprint."""
    import numpy as _np

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_jpeg_pixels,
        synth_jpeg_flat_bytes,
    )

    @settings(max_examples=20, deadline=None)
    @given(
        mcux=st.integers(min_value=1, max_value=3),
        mcuy=st.integers(min_value=1, max_value=2),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def check(mcux, mcuy, seed):
        import random

        rng = random.Random(seed)
        bw, bh = 2 * mcux, 2 * mcuy
        y_vals = [rng.randint(0, 255) for _ in range(bw * bh)]
        cb = [rng.randint(0, 255) for _ in range(mcux * mcuy)]
        cr = [rng.randint(0, 255) for _ in range(mcux * mcuy)]
        w, h, planes, n_blk = _decode_jpeg_pixels(
            synth_jpeg_flat_bytes(
                16 * mcux, 16 * mcuy, [y_vals, cb, cr], subsample=True
            )
        )
        assert (w, h) == (16 * mcux, 16 * mcuy)
        assert n_blk == 6 * mcux * mcuy
        for i, v in enumerate(y_vals):
            by, bx = divmod(i, bw)
            assert (
                planes[0][8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8]
                == _np.uint8(v)
            ).all()
        for plane, vals in ((planes[1], cb), (planes[2], cr)):
            assert plane.shape == (h, w)
            for i, v in enumerate(vals):
                my, mx = divmod(i, mcux)
                assert (
                    plane[16 * my : 16 * my + 16, 16 * mx : 16 * mx + 16]
                    == _np.uint8(v)
                ).all()

    check()


def test_jpeg_idct_matches_naive_referee():
    """The vectorized einsum IDCT agrees with a naive O(n^4) textbook
    referee on random dequantized blocks (pre-rounding, tight float
    tolerance) — the IDCT itself is checked, not just the flat path."""
    import numpy as _np

    from rag_lakehouse_spark.operators.multimodal import _idct_matrix

    rng = _np.random.default_rng(7)
    m = _idct_matrix()
    for _ in range(20):
        coeff = rng.integers(-1024, 1024, size=(8, 8)).astype(_np.float64)
        fast = m.T @ coeff @ m
        naive = _np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / _np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / _np.sqrt(2) if v == 0 else 1.0
                        s += (
                            cu
                            * cv
                            * coeff[u, v]
                            * _np.cos((2 * x + 1) * u * _np.pi / 16)
                            * _np.cos((2 * y + 1) * v * _np.pi / 16)
                        )
                naive[x, y] = s / 4
        assert _np.allclose(fast, naive, atol=1e-9)


def test_jpeg_pixel_decode_rejects_malformed():
    """Progressive scans, subsampling, restart intervals, 16-bit
    quantizers, truncated entropy runs, missing EOI, and an invalid
    Huffman code all raise per the media-decoder contract."""
    import struct as _struct

    import pytest as _pytest

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_jpeg_coeffs,
        synth_jpeg_flat_bytes,
    )

    good = synth_jpeg_flat_bytes(16, 8, [[10, 250]])
    assert _decode_jpeg_coeffs(good)[2][0][0][0] == 10 - 128
    # progressive: SOF0 marker patched to SOF2
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pytest.raises(NotImplementedError, match="SOF0"):
        _decode_jpeg_coeffs(prog)
    # unsupported sampling: a grayscale stream claiming 2x2
    sof = good.index(b"\xff\xc0")
    sub = bytearray(good)
    assert sub[sof + 11] == 0x11
    sub[sof + 11] = 0x22
    with _pytest.raises(NotImplementedError, match="sampling"):
        _decode_jpeg_coeffs(bytes(sub))
    # 4:2:0 with dims that don't fill whole MCUs
    g420 = synth_jpeg_flat_bytes(
        16, 16, [[1, 2, 3, 4], [5], [6]], subsample=True
    )
    assert _decode_jpeg_coeffs(g420)[4] == [(2, 2), (1, 1), (1, 1)]
    sofp = g420.index(b"\xff\xc0")
    part = bytearray(g420)
    part[sofp + 7 : sofp + 9] = _struct.pack(">H", 24)  # width 24
    with _pytest.raises(NotImplementedError, match="partial MCU"):
        _decode_jpeg_coeffs(bytes(part))
    # restart interval (r14: SUPPORTED): a DRI spliced in after SOI
    # with Ri >= MCU count arms the discipline but the run legally
    # contains no RSTn — decode must succeed and match the original;
    # a TRUNCATED DRI still rejects
    dri = good[:2] + b"\xff\xdd\x00\x04\x00\x04" + good[2:]
    assert _decode_jpeg_coeffs(dri)[2] == _decode_jpeg_coeffs(good)[2]
    dri_trunc = good[:2] + b"\xff\xdd\x00\x03\x00" + good[2:]
    with _pytest.raises(NotImplementedError, match="DRI"):
        _decode_jpeg_coeffs(dri_trunc)
    # 16-bit quantizer: DQT precision nibble patched
    dqt = good.index(b"\xff\xdb")
    q16 = bytearray(good)
    q16[dqt + 4] = 0x10
    with _pytest.raises(NotImplementedError, match="16-bit"):
        _decode_jpeg_coeffs(bytes(q16))
    # truncated entropy run / missing EOI
    with _pytest.raises(NotImplementedError):
        _decode_jpeg_coeffs(good[:-3])
    # invalid Huffman code: entropy run replaced by a stuffed 0xFF
    # (all-ones bits match no assigned DC code at any length)
    sos = good.index(b"\xff\xda")
    (slen,) = _struct.unpack(">H", good[sos + 2 : sos + 4])
    ent_at = sos + 2 + slen
    bad = good[:ent_at] + b"\xff\x00" + b"\xff\xd9"
    with _pytest.raises(NotImplementedError, match="Huffman|truncated|ended"):
        _decode_jpeg_coeffs(bad)
    # r13 review: foreign-malformed streams must raise
    # NotImplementedError (the degrade contract), never
    # StopIteration/struct.error/ValueError escaping the UDF
    # SOS naming a component id absent from SOF
    ghost = bytearray(good)
    ghost[sos + 5] = 9
    with _pytest.raises(NotImplementedError, match="absent from SOF"):
        _decode_jpeg_coeffs(bytes(ghost))
    # SOF with truncated component specs

    def _seg(marker, body):
        return (
            bytes([0xFF, marker]) + _struct.pack(">H", len(body) + 2) + body
        )

    trunc_sof = (
        b"\xff\xd8"
        + _seg(0xC0, b"\x08" + _struct.pack(">HH", 8, 8) + b"\x01")
        + b"\xff\xd9"
    )
    with _pytest.raises(NotImplementedError, match="truncated"):
        _decode_jpeg_coeffs(trunc_sof)
    # zero dimensions
    zero = bytearray(good)
    sof0 = good.index(b"\xff\xc0")
    zero[sof0 + 7 : sof0 + 9] = _struct.pack(">H", 0)  # width 0
    with _pytest.raises(NotImplementedError, match="zero"):
        _decode_jpeg_coeffs(bytes(zero))
    # empty SOS body
    empty_sos = (
        good[:sos] + _seg(0xDA, b"") + good[ent_at:]
    )
    with _pytest.raises(NotImplementedError, match="SOS header truncated"):
        _decode_jpeg_coeffs(empty_sos)
    # 12-bit sample precision: the one remaining scope limit (second
    # review pass) — must reject, not decode with the 8-bit level
    # shift and emit silently wrong planes
    p12 = bytearray(good)
    assert p12[sof0 + 4] == 8
    p12[sof0 + 4] = 12
    with _pytest.raises(NotImplementedError, match="8-bit precision"):
        _decode_jpeg_coeffs(bytes(p12))


def test_warc_walk_round_trip_property():
    """synth_warc_bytes -> _walk_warc round-trips hypothesis-chosen
    record mixes: statuses, body lengths (incl. 0), bodies embedding
    the ``WARC/1.0`` marker and blank lines (the delimiter-splitter
    traps), and an optional leading warcinfo record."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.multimodal import (
        _walk_warc,
        synth_http_response,
        synth_warc_bytes,
    )

    resp = st.tuples(
        st.sampled_from([200, 301, 404]),
        st.binary(max_size=80),
        st.booleans(),  # prefix body with the adversarial marker
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(resp, min_size=1, max_size=6), st.booleans())
    def check(responses, leading_info):
        recs = []
        if leading_info:
            recs.append(
                {"type": "warcinfo", "payload": b"x: y\r\n\r\nWARC/1.0"}
            )
        expected_body = 0
        expected_ok = 0
        expected_marker = 0
        for i, (status, body, mark) in enumerate(responses):
            if mark:
                body = b"WARC/1.0\r\n\r\n" + body
            recs.append(
                {
                    "type": "response",
                    "uri": f"http://h{i}.example/p/{i}",
                    "payload": synth_http_response(status, body, i),
                }
            )
            expected_body += len(body)
            expected_ok += status == 200
            expected_marker += b"WARC/1.0" in body
        got = _walk_warc(synth_warc_bytes(recs))
        assert got == (
            len(recs),
            len(responses),
            expected_ok,
            responses[0][0],
            "h0.example",
            expected_body,
            expected_marker,
        )

    check()


def test_warc_walk_rejects_malformed():
    import pytest as _pytest

    from rag_lakehouse_spark.operators.multimodal import (
        _walk_warc,
        synth_http_response,
        synth_warc_bytes,
    )

    good = synth_warc_bytes(
        [
            {
                "type": "response",
                "uri": "http://h.example/",
                "payload": synth_http_response(200, b"abc", 0),
            }
        ]
    )
    assert _walk_warc(good)[0] == 1
    # truncated payload / terminator
    with _pytest.raises(NotImplementedError):
        _walk_warc(good[:-3])
    # bad version line
    with _pytest.raises(NotImplementedError):
        _walk_warc(b"WARC/0.9" + good[8:])
    # missing Content-Length: strip that header line
    lines = good.split(b"\r\n")
    no_cl = b"\r\n".join(
        ln for ln in lines if not ln.lower().startswith(b"content-length")
    )
    with _pytest.raises(NotImplementedError):
        _walk_warc(no_cl)
    # no response record at all
    with _pytest.raises(NotImplementedError):
        _walk_warc(synth_warc_bytes([{"type": "warcinfo", "payload": b""}]))
    # negative Content-Length: without the digit guard pos would move
    # BACKWARDS and the record generator would loop forever (close-out
    # review catch)
    neg = good.replace(b"Content-Length: ", b"Content-Length: -", 1)
    with _pytest.raises(NotImplementedError, match="Content-Length"):
        _walk_warc(neg)
    # non-numeric HTTP status must reject, not raise ValueError through
    # the degrade-to-zero-rows contract
    from rag_lakehouse_spark.operators.multimodal import warc_response_rows

    bad_status = good.replace(b"HTTP/1.1 200", b"HTTP/1.1 xx0", 1)
    with _pytest.raises(NotImplementedError, match="status"):
        _walk_warc(bad_status)
    # truncated status line (2-digit status, message ends immediately):
    # must reject as malformed, never parse a partial status (r13
    # ADVICE guard — len(payload) >= 12 before the digit check)
    from rag_lakehouse_spark.operators.multimodal import _warc_response

    with _pytest.raises(NotImplementedError, match="status|HTTP"):
        _warc_response({}, b"HTTP/1.1 20\r\n\r\n")
    with _pytest.raises(NotImplementedError, match="status|HTTP"):
        _warc_response({}, b"HTTP/1.1 20")


def test_zip_walk_round_trip_property():
    """synth_zip_bytes -> _walk_zip round-trips hypothesis-chosen
    archives: arbitrary contents (incl. embedded EOCD signatures and
    empty files), mixed stored/deflate, names of varied length, EOCD
    comments of varied length."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.multimodal import (
        _walk_zip,
        synth_zip_bytes,
    )

    entry = st.tuples(
        st.integers(min_value=0, max_value=12),  # name suffix length
        st.binary(max_size=120),
        st.booleans(),
    )

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(entry, min_size=1, max_size=5),
        st.integers(min_value=0, max_value=9),
    )
    def check(raw_entries, comment_len):
        entries = [
            (f"e{i}_" + "n" * nl + ".dat", body, stored)
            for i, (nl, body, stored) in enumerate(raw_entries)
        ]
        z = synth_zip_bytes(entries, comment=b"k" * comment_len)
        got = _walk_zip(z)
        assert got == (
            len(entries),
            sum(1 for _, _, s in entries if s),
            sum(1 for _, _, s in entries if not s),
            sum(len(b) for _, b, _ in entries),
            len(entries),
            sum(len(n) for n, _, _ in entries),
        )
    check()


def test_zip_walk_rejects_malformed_and_detects_corruption():
    import pytest as _pytest

    from rag_lakehouse_spark.operators.multimodal import (
        _walk_zip,
        synth_zip_bytes,
    )

    z = synth_zip_bytes(
        [("a.bin", b"hello world" * 3, True), ("b.bin", b"PK\x05\x06zz", False)]
    )
    assert _walk_zip(z)[0] == 2
    with _pytest.raises(NotImplementedError):
        _walk_zip(z[: len(z) - 8])  # EOCD gone
    with _pytest.raises(NotImplementedError):
        _walk_zip(b"\x00" * 40)
    # flip a payload byte: entry must drop out of n_crc_ok, not crash
    bad = bytearray(z)
    data_at = z.find(b"hello")
    bad[data_at] ^= 0xFF
    assert _walk_zip(bytes(bad))[4] == 1  # only one CRC-ok entry left
    # EOCD claiming more entries than the directory holds: reject,
    # never struct.error past the directory end (review catch)
    import struct as _struct

    over = bytearray(z)
    eocd = z.rfind(b"PK\x05\x06")
    over[eocd + 8 : eocd + 10] = _struct.pack("<H", 9)
    over[eocd + 10 : eocd + 12] = _struct.pack("<H", 9)
    with _pytest.raises(NotImplementedError, match="central-directory"):
        _walk_zip(bytes(over))
    # local_off pointing at a planted PK\x03\x04 in the tail of the
    # blob: the 4-byte signature check passes but the 30-byte local
    # header does not fit — must reject, never struct.error (r13
    # ADVICE guard)
    zc = synth_zip_bytes(
        [("a.bin", b"x" * 5, True)], comment=b"QQ" + b"PK\x03\x04" + b"tail"
    )
    eocd2 = zc.rfind(b"PK\x05\x06")
    (cd_off,) = _struct.unpack("<I", zc[eocd2 + 16 : eocd2 + 20])
    planted = bytearray(zc)
    planted[cd_off + 42 : cd_off + 46] = _struct.pack("<I", len(zc) - 8)
    assert bytes(planted)[len(zc) - 8 : len(zc) - 4] == b"PK\x03\x04"
    with _pytest.raises(NotImplementedError, match="local header truncated"):
        _walk_zip(bytes(planted))


def test_png_palette_gray_round_trip_property():
    """r12: palette (type 3) and grayscale (type 0) PNG round-trips at
    hypothesis-chosen dims and palette sizes — the bpp=1 filter lanes
    (Sub/Paeth offset 1, not 3) and the PLTE indirection must both be
    exact; heights ≥5 exercise every filter type via the y%5 writer."""
    import numpy as _np

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_png_pixels,
        synth_png_gray_bytes,
        synth_png_indexed_bytes,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=24),
        h=st.integers(min_value=5, max_value=16),
        npal=st.integers(min_value=1, max_value=256),
        seed=st.integers(min_value=0, max_value=2**31),
        data=st.data(),
    )
    def check(w, h, npal, seed, data):
        ys = _np.arange(h, dtype=_np.int64)[:, None]
        xs = _np.arange(w, dtype=_np.int64)[None, :]
        g = ((seed + 5 * ys + 3 * xs) % 256).astype(_np.uint8)
        gw, gh, gimg = _decode_png_pixels(synth_png_gray_bytes(w, h, g.tobytes()))
        assert (gw, gh) == (w, h)
        assert _np.array_equal(gimg, _np.repeat(g[:, :, None], 3, axis=2))
        pal = bytes(
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=255),
                    min_size=3 * npal,
                    max_size=3 * npal,
                )
            )
        )
        idx = ((seed + 7 * ys + xs) % npal).astype(_np.uint8)
        pw, ph, pimg = _decode_png_pixels(
            synth_png_indexed_bytes(w, h, pal, idx.tobytes())
        )
        assert (pw, ph) == (w, h)
        exp = _np.frombuffer(pal, dtype=_np.uint8).reshape(-1, 3)[idx]
        assert _np.array_equal(pimg, exp)

    check()


def test_warc_gz_member_walk_property():
    """Record-per-member .warc.gz: hypothesis-chosen record mixes must
    round-trip through synth_warc_gz_bytes -> _walk_warc_gz with the
    member count pinned to the record count, and a NON-record-per-
    member stream (all records in one member) must be rejected."""
    import zlib as _zlib

    import pytest as _pytest
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.multimodal import (
        _walk_warc_gz,
        synth_http_response,
        synth_warc_bytes,
        synth_warc_gz_bytes,
    )

    def make_recs(responses):
        return [
            {
                "type": "response",
                "uri": f"http://h{i}.example/p",
                "payload": synth_http_response(status, body, i),
            }
            for i, (status, body) in enumerate(responses)
        ]

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from([200, 301, 404]), st.binary(max_size=60)),
            min_size=1,
            max_size=5,
        )
    )
    def check(responses):
        recs = make_recs(responses)
        got = _walk_warc_gz(synth_warc_gz_bytes(recs))
        assert got[0] == got[1] == len(recs)
        assert got[2] == len(responses)
        assert got[6] == sum(len(b) for _, b in responses)

    check()

    # one member holding two records: valid gzip+WARC, wrong LAYOUT
    recs = make_recs([(200, b"a"), (404, b"b")])
    c = _zlib.compressobj(6, _zlib.DEFLATED, 16 + 15)
    single = c.compress(synth_warc_bytes(recs)) + c.flush()
    with _pytest.raises(NotImplementedError, match="member count"):
        _walk_warc_gz(single)
    # truncated member
    two = synth_warc_gz_bytes(recs)
    with _pytest.raises(NotImplementedError):
        _walk_warc_gz(two[:-5])
    # trailing garbage
    with _pytest.raises(NotImplementedError, match="not a gzip member"):
        _walk_warc_gz(two + b"junk")


def test_png_interlaced_round_trip_property():
    """Adam7 at hypothesis-chosen dims (incl. dims < 8 where several
    passes are EMPTY and dims that make every pass ragged) across all
    three color types' bpp lanes via truecolor: writer passes filter
    with per-pass y%5 cycling, decoder must scatter back exactly."""
    import numpy as _np

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_png_pixels,
        synth_png_interlaced_bytes,
    )

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=36),
        h=st.integers(min_value=1, max_value=24),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def check(w, h, seed):
        v = (
            (
                seed
                + 3 * _np.arange(h, dtype=_np.int64)[:, None, None]
                + 7 * _np.arange(w, dtype=_np.int64)[None, :, None]
                + 9 * _np.arange(3, dtype=_np.int64)[None, None, :]
            )
            % 256
        ).astype(_np.uint8)
        W, H, img = _decode_png_pixels(
            synth_png_interlaced_bytes(w, h, v.tobytes())
        )
        assert (W, H) == (w, h)
        assert _np.array_equal(img, v)

    check()


def test_tiff_walk_round_trip_property():
    """synth_tiff_bytes -> _walk_tiff at hypothesis-chosen page mixes,
    BOTH byte orders, and values straddling the inline/offset
    boundary (SHORT counts 1/2/3 = 2/4/6 bytes; LONG counts 1/2 =
    4/8 bytes — counts of exactly the 4-byte slot size stay inline)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.multimodal import (
        _walk_tiff,
        synth_tiff_bytes,
    )

    page = st.tuples(
        st.integers(min_value=1, max_value=70000),   # width (LONG range)
        st.integers(min_value=1, max_value=5000),    # height
        st.integers(min_value=1, max_value=3),       # n bits samples
        st.sampled_from([1, 5]),                     # compression
        st.integers(min_value=1, max_value=2),       # n strips
    )

    @settings(max_examples=50, deadline=None)
    @given(st.lists(page, min_size=1, max_size=4), st.booleans())
    def check(raw_pages, big):
        pages = [
            dict(
                width=w,
                height=h,
                bits=[8] * nb,
                compression=c,
                strips=list(range(5000, 5000 + ns)),
            )
            for w, h, nb, c, ns in raw_pages
        ]
        got = _walk_tiff(synth_tiff_bytes(pages, big_endian=big))
        assert got == (
            big,
            len(pages),
            pages[0]["width"],
            pages[0]["height"],
            pages[0]["compression"],
            sum(p["width"] * p["height"] for p in pages),
            sum(sum(p["bits"]) for p in pages),
            sum(len(p["strips"]) for p in pages),
        )

    check()


def test_tiff_walk_rejects_malformed():
    import struct as _struct

    import pytest as _pytest

    from rag_lakehouse_spark.operators.multimodal import (
        _walk_tiff,
        synth_tiff_bytes,
    )

    good = synth_tiff_bytes(
        [dict(width=4, height=3, bits=[8, 8, 8], compression=1,
              strips=[100])],
        big_endian=False,
    )
    assert _walk_tiff(good)[1] == 1
    with _pytest.raises(NotImplementedError, match="not a TIFF"):
        _walk_tiff(b"XX" + good[2:])
    with _pytest.raises(NotImplementedError, match="magic"):
        _walk_tiff(good[:2] + _struct.pack("<HI", 43, 8) + good[8:])
    with _pytest.raises(NotImplementedError):
        _walk_tiff(good[:-4])  # truncated (offset value area lost)
    # count=0 on a dims tag: reject, never IndexError (review catch)
    cz = bytearray(good)
    cz[8 + 2 + 4 : 8 + 2 + 8] = _struct.pack("<I", 0)
    with _pytest.raises(NotImplementedError, match="empty TIFF entry"):
        _walk_tiff(bytes(cz))
    # IFD cycle: point next-IFD back at the first IFD
    bad = bytearray(good)
    # first IFD at offset 8; next-IFD slot sits at 8 + 2 + 12*5
    nxt_at = 8 + 2 + 12 * 5
    bad[nxt_at : nxt_at + 4] = _struct.pack("<I", 8)
    with _pytest.raises(NotImplementedError, match="cycle"):
        _walk_tiff(bytes(bad))


def test_jpeg_restart_interval_round_trip_property():
    """r14 (VERDICT r13 #5): restart intervals are LOSSLESS over
    quantized coefficients at hypothesis-chosen dims, samplings, and
    intervals (including Ri >= MCU count — a legal stream with a DRI
    but no RSTn in the run), and the decoder enforces the discipline:
    a misnumbered RSTn or a stripped DRI (markers left in the run)
    rejects instead of mis-decoding."""
    import pytest
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rag_lakehouse_spark.operators.multimodal import (
        _decode_jpeg_coeffs,
        synth_jpeg_coeff_bytes,
    )

    @settings(max_examples=30, deadline=None)
    @given(
        bw=st.integers(min_value=1, max_value=4),
        bh=st.integers(min_value=1, max_value=3),
        nc=st.sampled_from([1, 3]),
        sub=st.booleans(),
        ri=st.integers(min_value=1, max_value=13),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def check(bw, bh, nc, sub, ri, seed):
        import random

        if sub and nc != 3:
            sub = False
        rng = random.Random(seed)
        if sub:
            grids = [4 * bw * bh, bw * bh, bw * bh]
            w, h = 16 * bw, 16 * bh
        else:
            grids = [bw * bh] * nc
            w, h = 8 * bw, 8 * bh
        comp = []
        for grid in grids:
            blocks = []
            for _ in range(grid):
                blk = [0] * 64
                blk[0] = rng.randint(-255, 255)
                for _ in range(rng.randint(0, 8)):
                    blk[rng.randint(1, 63)] = rng.choice([-300, -2, 1, 45])
                blocks.append(blk)
            comp.append(blocks)
        content = synth_jpeg_coeff_bytes(
            w, h, comp, subsample=sub, restart_interval=ri
        )
        w2, h2, got, _qts, _samp = _decode_jpeg_coeffs(content)
        assert (w2, h2) == (w, h)
        assert got == comp

        n_mcu = bw * bh
        if ri < n_mcu:  # the run really contains RSTn markers
            # (a) break the first RSTn's sequence number
            bad = bytearray(content)
            for i in range(len(bad) - 1):
                if bad[i] == 0xFF and 0xD0 <= bad[i + 1] <= 0xD7:
                    bad[i + 1] = 0xD0 + ((bad[i + 1] - 0xD0 + 1) % 8)
                    break
            with pytest.raises(NotImplementedError):
                _decode_jpeg_coeffs(bytes(bad))
            # (b) strip the DRI segment: bare RSTn now interrupts the
            # run mid-scan — must reject, not silently resync
            dri = content.find(b"\xff\xdd\x00\x04")
            assert dri >= 0
            stripped = content[:dri] + content[dri + 6 :]
            with pytest.raises(NotImplementedError):
                _decode_jpeg_coeffs(stripped)

    check()
