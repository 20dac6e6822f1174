"""Multimodal plumbing tests: schema, batch shape, determinism, stub gating."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from censo_escolar_spark.operators import multimodal as M


@pytest.fixture()
def payloads(spark):
    rows = [
        (0, bytes.fromhex("FFD8FF") + b"jpeg-ish-body"),
        (1, bytes.fromhex("89504E47") + b"png-ish-body"),
        (2, bytes.fromhex("52494646") + b"wav-ish-body-longer" * 10),
        (3, b"\x7fELF not media"),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_sniff_format(spark, payloads):
    got = {r.doc_id: r.fmt for r in payloads.select("doc_id", M.sniff_format("payload").alias("fmt")).collect()}
    assert got == {0: "jpeg", 1: "png", 2: "wav", 3: None}


def test_media_metadata_struct(spark, payloads):
    row = payloads.select(M.media_metadata("payload").alias("m")).filter(F.col("m.format") == "jpeg").first()
    assert row.m.n_bytes == 3 + len(b"jpeg-ish-body")
    assert isinstance(row.m.content_hash, int)


def test_plan_frame_sample(spark):
    df = spark.createDataFrame([(n,) for n in [1, 3, 4, 10, 100]], "n int")
    got = {r.n: list(r.plan) for r in df.select("n", M.plan_frame_sample("n", 4).alias("plan")).collect()}
    assert got[1] == [0]
    assert got[3] == [0, 1, 2]  # fewer than k -> all frames
    assert got[4] == [0, 1, 2, 3]
    assert got[10] == [0, 2, 5, 7]  # floor(i*10/4)
    assert got[100] == [0, 25, 50, 75]


def test_decode_default_real_decoder_rejects_garbage(spark, payloads):
    """The default decoder is the REAL path: truncated/garbage payloads
    must fail the task with a clear codec error (never silently produce
    pixels), and unwired formats keep the NotImplementedError stub
    contract."""
    decoded = M.decode_media(payloads, bytes_col="payload")  # default = real
    with pytest.raises(
        Exception,
        match="NotImplementedError|not a PNG|not a WAVE|no decoder"
        "|bad JPEG|JPEG without|cannot identify",
    ):
        decoded.collect()


def test_fake_decode_deterministic():
    a = M.fake_decode(b"same-bytes", "jpeg")
    b = M.fake_decode(b"same-bytes", "jpeg")
    c = M.fake_decode(b"other-bytes", "jpeg")
    assert a.shape == (8, 8) and a.dtype == np.uint8
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_decode_resize_features_pipeline(spark, payloads):
    decoded = M.decode_media(payloads, bytes_col="payload", decoder=M.fake_decode, out_h=4, out_w=4)
    rows = decoded.collect()
    assert len(rows) == 4
    for r in rows:
        assert (r.h, r.w) == (4, 4)
        assert len(r.pixels) == 16
        assert all(0 <= p <= 255 for p in r.pixels)

    feats = {r.id: r for r in M.media_features(decoded, n_bins=8).collect()}
    assert set(feats) == {0, 1, 2, 3}
    for r in feats.values():
        assert 0.0 <= r.px_mean <= 255.0
        assert r.px_std >= 0.0
        assert sum(r.px_hist) == 16  # every pixel lands in exactly one bin

    # determinism across runs (fake decoder is seeded by payload)
    again = {r.id: r for r in M.media_features(decoded, n_bins=8).collect()}
    assert all(feats[i].px_mean == again[i].px_mean for i in feats)


def test_repartition_by_bytes(spark, payloads):
    out = M.repartition_by_bytes(payloads, "payload", target_partition_bytes=100)
    assert out.rdd.getNumPartitions() >= 2
    assert out.count() == 4


def test_sample_frames_executes_plan(spark, payloads):
    out = M.sample_frames(
        payloads.withColumn("n_frames", F.lit(6)), k=4, decoder=M.fake_decode
    ).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.id if hasattr(r, "id") else r.doc_id, []).append(r)
    # 4 planned frames per payload, evenly spaced out of 6: [0,1,3,4]
    for rid, rows in by_id.items():
        assert sorted(r.frame_idx for r in rows) == [0, 1, 3, 4]
        for r in rows:
            assert 0.0 <= r.px_mean <= 255.0 and r.px_std >= 0.0
    # distinct frames of the same payload decode distinctly (idx mixed in)
    some = list(by_id.values())[0]
    assert len({r.px_mean for r in some}) > 1


def test_sample_frames_determinism(spark, payloads):
    df = payloads.withColumn("n_frames", F.lit(3))
    a = sorted(map(tuple, M.sample_frames(df, k=4, decoder=M.fake_decode).collect()))
    b = sorted(map(tuple, M.sample_frames(df, k=4, decoder=M.fake_decode).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# plan_audio_frames (m06's operator)
# ---------------------------------------------------------------------------


def _audio_df(spark, rows):
    # rows: (id, n_bytes, rate, channels)
    data = [(i, b"\x00" * n, r, c) for i, n, r, c in rows]
    return spark.createDataFrame(
        data, "doc_id long, payload binary, sample_rate int, channels int"
    )


def test_audio_frame_plan_hand_computed(spark):
    from censo_escolar_spark.operators.multimodal import plan_audio_frames

    # 5000 bytes mono => 2500 samples => frames at 1024/512: idx 0,1,2
    df = _audio_df(spark, [(1, 5000, 8000, 1)])
    rows = plan_audio_frames(df).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    assert rows[0].n_samples == 2500
    assert rows[0].n_frames == 3
    assert rows[0].duration_us == 2500 * 1_000_000 // 8000
    assert [r.sample_offset for r in rows] == [0, 512, 1024]
    assert [r.byte_offset for r in rows] == [0, 1024, 2048]
    assert rows[2].frame_start_us == 1024 * 1_000_000 // 8000


def test_audio_frame_plan_stereo_and_short(spark):
    from censo_escolar_spark.operators.multimodal import plan_audio_frames

    df = _audio_df(
        spark,
        [
            (1, 4096, 16000, 2),  # 1024 samples stereo -> exactly 1 frame
            (2, 2000, 16000, 2),  # 500 samples -> too short, no frames
        ],
    )
    rows = plan_audio_frames(df).collect()
    assert [(r.doc_id, r.frame_idx) for r in rows] == [(1, 0)]
    assert rows[0].byte_offset == 0
    assert rows[0].n_samples == 1024


def test_audio_frame_plan_custom_framing_counts(spark):
    from censo_escolar_spark.operators.multimodal import plan_audio_frames

    # 300 samples with 64/32 framing: (300-64)//32+1 = 8 frames
    df = _audio_df(spark, [(1, 600, 8000, 1)])
    rows = plan_audio_frames(df, frame_len=64, hop=32).collect()
    assert len(rows) == 8
    assert rows[-1].sample_offset == 7 * 32


# ---------------------------------------------------------------------------
# Real-codec path. PNG and WAV decode through pure-stdlib decoders
# (zlib/struct, wave) whenever Pillow/soundfile are absent — so these
# goldens run EVERYWHERE, including this lib-less container. The two
# paths are bit-identical on the same payload (same grayscale formula,
# same PCM scaling), so the goldens are environment-independent. Only
# JPEG remains Pillow-gated (no stdlib JPEG codec exists).
# ---------------------------------------------------------------------------


def _png_bytes(arr: np.ndarray, *, color_type: int = 0, filters=None) -> bytes:
    """Minimal in-test PNG writer (zlib/struct), so goldens need no
    external encoder. ``arr`` is (h, w) uint8 for gray (color 0) or
    (h, w, 3) for RGB (color 2); ``filters`` optionally picks the PNG
    filter type per scanline (applied correctly, to exercise unfilters)."""
    import struct
    import zlib

    h, w = arr.shape[:2]
    ch = 1 if arr.ndim == 2 else arr.shape[2]
    flat = arr.reshape(h, w * ch).astype(np.int32)
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y, f in enumerate(filters):
        line = flat[y]
        if f == 0:
            enc = line
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            enc = (line - left) & 0xFF
        elif f == 2:  # Up
            enc = (line - prev) & 0xFF
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            enc = (line - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth
            enc = np.empty(w * ch, dtype=np.int32)
            for i in range(w * ch):
                a = int(line[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
                enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([f]) + enc.astype(np.uint8).tobytes()
        prev = line

    def chunk(t: bytes, d: bytes) -> bytes:
        return (
            struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _wav_bytes(samples_i16: np.ndarray, *, rate: int = 8000, channels: int = 1) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(channels)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(samples_i16.astype("<i2").tobytes())
    return buf.getvalue()


def test_real_decode_unwired_formats_raise_cleanly():
    """Unwired formats must fail with NotImplementedError (the documented
    stub contract), never a bare ImportError; jpeg garbage now fails the
    stdlib decoder's marker validation with a clear codec error, and a
    PROGRESSIVE jpeg without Pillow names the missing capability."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(ValueError, match="bad JPEG"):
            M.real_decode(bytes.fromhex("FFD8FF") + b"\x00" * 16, "jpeg")
    with pytest.raises(NotImplementedError, match="no decoder"):
        M.real_decode(b"\x00" * 8, "mp4")


def test_real_decode_png_golden():
    # 2x3 grayscale gradient PNG -> decode must return the same pixels
    arr = np.array([[0, 128, 255], [32, 64, 96]], dtype=np.uint8)
    out = M.real_decode(_png_bytes(arr), "png")
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, arr)


def test_real_decode_png_all_filters():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 6), dtype=np.uint8)
    out = M.real_decode(_png_bytes(arr, filters=[0, 1, 2, 3, 4]), "png")
    np.testing.assert_array_equal(out, arr)


def test_real_decode_png_rgb_grayscale_formula():
    rgb = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8
    )
    out = M.real_decode(_png_bytes(rgb, color_type=2, filters=[1, 4]), "png")
    r, g, b = (rgb[..., i].astype(np.uint32) for i in range(3))
    expect = ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(np.uint8)
    np.testing.assert_array_equal(out, expect)  # Pillow's exact L formula


def test_real_decode_wav_golden():
    # 128 mono samples: one full-scale frame then one floor frame.
    # int16 32767 -> 32767/32768 -> floor((x+1)*127.5) = 254;
    # int16 -32768 -> -1.0 -> 0. Same values under soundfile (PCM16
    # reads as sample/32768 there too), so the golden is env-independent.
    samples = np.concatenate(
        [np.full(64, 32767, np.int64), np.full(64, -32768, np.int64)]
    )
    out = M.real_decode(_wav_bytes(samples), "wav")
    assert out.shape == (2, 64)
    assert set(out[0].tolist()) == {254}
    assert set(out[1].tolist()) == {0}


def test_real_decode_wav_partial_frames_always_drop():
    # 100 samples -> one full 64-frame, 36-sample tail dropped
    out = M.real_decode(_wav_bytes(np.zeros(100, np.int64)), "wav")
    assert out.shape == (1, 64)
    # shorter than one frame -> the (1, 1) zero thumbnail, no exception
    short = M.real_decode(_wav_bytes(np.zeros(10, np.int64)), "wav")
    np.testing.assert_array_equal(short, np.zeros((1, 1), np.uint8))


def test_real_decode_wav_stereo_downmix():
    left = np.full(64, 16384, np.int64)
    right = np.full(64, -16384, np.int64)
    inter = np.empty(128, np.int64)
    inter[0::2], inter[1::2] = left, right
    out = M.real_decode(_wav_bytes(inter, channels=2), "wav")
    assert out.shape == (1, 64)
    assert set(out[0].tolist()) == {127}  # mean(+0.5, -0.5) = 0 -> 127.5 -> 127


def test_decode_media_with_real_decoder_end_to_end(spark):
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    payload = _png_bytes(arr)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    rows = M.decode_media(df, decoder=M.real_decode).collect()
    assert rows[0].pixels == arr.ravel().astype(int).tolist()
