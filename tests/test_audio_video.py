"""Unit tests for the multimodal audio (real WAV codec) and video (RV01
container + stubbed real codecs) column operators."""

import math
import struct

import numpy as np
import pytest

from osmcoastline_spark.functions import audio as A
from osmcoastline_spark.functions import video as V


# ------------------------------------------------------------- WAV codec


def test_wav_roundtrip_mono_and_stereo():
    mono = (np.sin(np.linspace(0, 20, 777)) * 12000).astype(np.int16)
    rate, back = A.decode_wav(A.encode_wav(mono, 44100))
    assert rate == 44100 and back.shape == (777, 1)
    assert np.array_equal(back[:, 0], mono)

    stereo = np.stack([mono, -mono], axis=1)
    rate, back = A.decode_wav(A.encode_wav(stereo, 8000))
    assert rate == 8000 and back.shape == (777, 2)
    assert np.array_equal(back, stereo)


def test_wav_decoder_walks_extra_chunks_and_pads():
    # fmt / data separated by an odd-sized LIST chunk (forces pad-byte walk)
    body = A.encode_wav(np.arange(10, dtype=np.int16), 8000)
    chunks = body[12:]  # everything after RIFF<size>WAVE
    fmt_chunk = chunks[: 8 + 16]
    data_chunk = chunks[8 + 16 :]
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded odd chunk
    rebuilt_payload = b"WAVE" + fmt_chunk + junk + data_chunk
    rebuilt = b"RIFF" + struct.pack("<I", len(rebuilt_payload)) + rebuilt_payload
    rate, x = A.decode_wav(rebuilt)
    assert rate == 8000 and np.array_equal(x[:, 0], np.arange(10))


@pytest.mark.parametrize(
    "blob",
    [
        b"",
        b"RIFFxxxxWAVE",  # no chunks
        b"OggS" + b"\x00" * 40,  # wrong container
        A.encode_wav(np.arange(4, dtype=np.int16), 8000)[:-3],  # truncated data
    ],
)
def test_wav_decoder_malformed_raises_valueerror(blob):
    with pytest.raises(ValueError):
        A.decode_wav(blob)


def test_wav_decoder_rejects_non_pcm_and_24bit():
    good = bytearray(A.encode_wav(np.arange(4, dtype=np.int16), 8000))
    ieee = good.copy()
    ieee[20:22] = struct.pack("<H", 3)  # format tag 3 = IEEE float
    with pytest.raises(ValueError, match="format tag"):
        A.decode_wav(bytes(ieee))
    deep = good.copy()
    deep[34:36] = struct.pack("<H", 24)
    with pytest.raises(ValueError, match="bit depth"):
        A.decode_wav(bytes(deep))


def test_decode_audio_stubs_raise_by_name():
    for fmt in ("mp3", "flac", "ogg"):
        with pytest.raises(NotImplementedError, match=fmt):
            A.decode_audio(b"\x00" * 64, fmt)


# ------------------------------------------------------- audio features


def test_square_wave_closed_form():
    for amp, half, n in [(1000, 1, 400), (9000, 7, 720), (3000, 4, 401)]:
        x = A.square_wave(amp, half, n)
        c0 = x.astype(np.float64)
        assert math.isclose(float(np.sqrt((c0 * c0).sum() / n)), amp, rel_tol=0)
        flips = int(np.count_nonzero((c0[1:] < 0) != (c0[:-1] < 0)))
        assert flips == (n - 1) // half
        assert int(np.abs(x).max()) == amp


def test_with_audio_features_and_drop_path(spark):
    rows = [
        (1, bytearray(A.encode_wav(A.square_wave(2000, 3, 480), 8000)), "wav"),
        (2, bytearray(b"garbage"), "wav"),        # malformed -> nulls
        (3, bytearray(b"\x00" * 32), "mp3"),       # stubbed codec -> nulls
    ]
    df = spark.createDataFrame(rows, "audio_id long, bytes binary, fmt string")
    out = {r.audio_id: r for r in A.with_audio_features(df).collect()}
    assert out[1].sample_rate == 8000 and out[1].n_samples == 480
    assert math.isclose(out[1].rms, 2000.0) and out[1].peak == 2000
    assert out[1].zcr == 479 // 3
    assert math.isclose(out[1].duration_s, 480 / 8000)
    assert out[2].rms is None and out[3].rms is None  # dropped, not failed


def test_with_audio_features_full_scale_negative_peak(spark):
    """np.abs on the raw int16 plane wraps -32768 to -32768; the peak must
    come from the float64 channel so a full-scale negative clip reports
    32768, not a negative 'peak'."""
    import numpy as np

    clip = np.full(64, -32768, dtype=np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(A.encode_wav(clip, 8000)), "wav")],
        "audio_id long, bytes binary, fmt string",
    )
    row = A.with_audio_features(df).collect()[0]
    assert row.peak == 32768
    assert math.isclose(row.rms, 32768.0)


def test_with_audio_windows(spark):
    # 10 samples, win 4 hop 3 -> windows at 0, 3, 6 (tail dropped)
    x = np.array([4, -4, 4, -4, 8, 8, 8, 8, 0, 0], dtype=np.int16)
    df = spark.createDataFrame(
        [(7, bytearray(A.encode_wav(x, 8000)), "wav")],
        "audio_id long, bytes binary, fmt string",
    )
    out = sorted(
        A.with_audio_windows(df, win=4, hop=3).collect(), key=lambda r: r.win_idx
    )
    assert [r.win_idx for r in out] == [0, 1, 2]
    assert math.isclose(out[0].rms, 4.0) and out[0].peak == 4
    assert math.isclose(out[1].rms, math.sqrt((16 + 64 * 3) / 4))
    assert out[2].peak == 8


# ------------------------------------------------------------ RV01 video


def test_rv01_roundtrip_and_malformed():
    frames = np.arange(2 * 8 * 8 * 3, dtype=np.uint8).reshape(2, 8, 8, 3)
    fps, back = V.decode_rv01(V.encode_rv01(frames, 24))
    assert fps == 24 and np.array_equal(back, frames)
    with pytest.raises(ValueError):
        V.decode_rv01(b"AVI " + b"\x00" * 20)
    with pytest.raises(ValueError):
        V.decode_rv01(V.encode_rv01(frames, 24)[:-5])
    with pytest.raises(NotImplementedError, match="h264"):
        V.decode_video(b"\x00" * 64, "h264")


def test_sample_frames_every_k_and_drop(spark):
    nf = 5
    frames = np.stack(
        [np.full((8, 8, 3), 10 * k, dtype=np.uint8) for k in range(nf)]
    )
    rows = [
        (1, bytearray(V.encode_rv01(frames, 10)), "rv01"),
        (2, bytearray(b"bogus"), "rv01"),      # malformed -> dropped
        (3, bytearray(b"\x00" * 64), "vp9"),   # stubbed -> dropped
    ]
    df = spark.createDataFrame(rows, "video_id long, bytes binary, fmt string")
    out = sorted(V.sample_frames(df, every=2).collect(), key=lambda r: r.frame_idx)
    assert {r.video_id for r in out} == {1}
    assert [(r.frame_idx, r.mean_luma) for r in out] == [(0, 0.0), (2, 20.0), (4, 40.0)]


def test_wav_decoder_rejects_zero_sample_rate():
    b = bytearray(A.encode_wav(np.arange(4, dtype=np.int16), 8000))
    b[24:28] = struct.pack("<I", 0)  # fmt sample rate = 0
    with pytest.raises(ValueError, match="sample rate"):
        A.decode_wav(bytes(b))


def test_sample_frames_without_hash(spark):
    frames = np.stack([np.full((8, 8, 3), 7, dtype=np.uint8)] * 3)
    df = spark.createDataFrame(
        [(1, bytearray(V.encode_rv01(frames, 10)), "rv01")],
        "video_id long, bytes binary, fmt string",
    )
    out = V.sample_frames(df, every=1, with_hash=False)
    assert out.columns == ["video_id", "frame_idx", "mean_luma"]
    assert out.count() == 3
