"""Seeded mutation fuzz over every from-scratch decoder.

The drop paths in with_image_features / with_audio_features /
with_video_frames catch exactly (NotImplementedError, ValueError) — any
other exception escaping a decoder kills the whole Spark task instead of
dropping the row, which at 100 TB means one hostile byte stream fails a
stage. The per-codec tests pin hand-picked corruptions; this file pins
the CONTRACT itself empirically: for every decoder, every truncation of
a valid stream and a seeded sweep of byte flips/chunk corruptions either
decodes or raises (ValueError, NotImplementedError). Deterministic
(fixed seed) so a failure is reproducible by running the test again.
"""

from __future__ import annotations

import numpy as np
import pytest

from osmcoastline_spark.functions.audio import decode_audio, encode_wav
from osmcoastline_spark.functions.image import decode_image, encode_png
from osmcoastline_spark.functions.jpeg import encode_jpeg
from osmcoastline_spark.functions.video import decode_video, encode_rv01
from osmcoastline_spark.functions.webp import encode_webp

ALLOWED = (ValueError, NotImplementedError)

RNG = np.random.default_rng(20260819)
_PX = RNG.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)


def _streams() -> list[tuple[str, bytes, object]]:
    """(label, valid bytes, decode thunk taking mutated bytes)."""
    wav = encode_wav(
        (RNG.integers(-30000, 30000, size=(256, 2))).astype(np.int16), 8000
    )
    frames = RNG.integers(0, 256, size=(3, 8, 8, 3), dtype=np.uint8)
    return [
        ("png", encode_png(_PX), lambda b: decode_image(b, 16, 16, "png")),
        ("jpeg", encode_jpeg(_PX, quality=85), lambda b: decode_image(b, 16, 16, "jpeg")),
        ("webp", encode_webp(_PX), lambda b: decode_image(b, 16, 16, "webp")),
        ("wav", wav, lambda b: decode_audio(b, "wav")),
        ("rv01", encode_rv01(frames, fps=10), lambda b: decode_video(b, "rv01")),
    ]


def _assert_contract(label: str, decode, blob: bytes, what: str) -> None:
    try:
        decode(blob)
    except ALLOWED:
        pass
    except Exception as e:  # noqa: BLE001 — the test IS about exception class
        pytest.fail(
            f"{label}: {what} escaped the drop-path contract with "
            f"{type(e).__name__}: {e!r}"
        )


def _fuzz_truncations(label, good, decode):
    # every prefix, including the empty stream
    for cut in range(len(good)):
        _assert_contract(label, decode, good[:cut], f"truncation at {cut}")


def _fuzz_byte_flips(label, good, decode, seed):
    rng = np.random.default_rng(seed)
    n = len(good)
    # every position for short streams; 600 seeded positions otherwise
    positions = range(n) if n <= 600 else sorted(rng.choice(n, 600, replace=False))
    buf = bytearray(good)
    for pos in positions:
        orig = buf[pos]
        for val in (orig ^ 0xFF, orig ^ 0x01, 0x00, 0xFF):
            if val == orig:
                continue
            buf[pos] = val
            _assert_contract(label, decode, bytes(buf), f"byte flip at {pos}->{val}")
        buf[pos] = orig


@pytest.mark.parametrize("label_idx", range(5))
def test_every_truncation_raises_valueerror_only(label_idx):
    label, good, decode = _streams()[label_idx]
    _fuzz_truncations(label, good, decode)


@pytest.mark.parametrize("label_idx", range(5))
def test_byte_flip_sweep_raises_valueerror_only(label_idx):
    label, good, decode = _streams()[label_idx]
    _fuzz_byte_flips(label, good, decode, 99 + label_idx)


@pytest.mark.parametrize("label_idx", range(5))
def test_random_garbage_and_splices_raise_valueerror_only(label_idx):
    label, good, decode = _streams()[label_idx]
    rng = np.random.default_rng(7 + label_idx)
    for trial in range(120):
        kind = trial % 3
        if kind == 0:  # pure noise, keep the magic so we get past sniffing
            blob = bytes(good[:8]) + rng.integers(0, 256, rng.integers(0, 200)).astype(np.uint8).tobytes()
        elif kind == 1:  # splice two halves at mismatched offsets
            a = int(rng.integers(0, len(good)))
            b = int(rng.integers(0, len(good)))
            blob = good[:a] + good[b:]
        else:  # random 4-byte length-field style overwrite
            blob = bytearray(good)
            at = int(rng.integers(0, max(len(blob) - 4, 1)))
            blob[at : at + 4] = rng.integers(0, 256, 4).astype(np.uint8).tobytes()
            blob = bytes(blob)
        _assert_contract(label, decode, blob, f"garbage trial {trial}")


# ----------------------------------------------------- lossy VP8 (decode-only)
# Our VP8 codec is decode-only, so a valid lossy stream has to come from a
# real encoder: libwebp via ctypes, the same tests-only oracle used by
# test_webp_libwebp_oracle.py. Skips cleanly where the library is absent.


def _lossy_webp_stream() -> bytes | None:
    import ctypes

    try:
        lib = ctypes.CDLL("libwebp.so.7")
        lib.WebPEncodeRGB.restype = ctypes.c_size_t
        lib.WebPEncodeRGB.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.WebPFree.argtypes = [ctypes.c_void_p]
    except (OSError, AttributeError):
        return None
    rng = np.random.default_rng(4242)
    px = np.ascontiguousarray(rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8))
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(
        px.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 24, 24, 72, 80.0,
        ctypes.byref(out),
    )
    if not n:
        return None
    blob = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return blob


_LOSSY = _lossy_webp_stream()
_needs_libwebp = pytest.mark.skipif(_LOSSY is None, reason="libwebp unavailable")


@_needs_libwebp
def test_lossy_vp8_truncations_raise_valueerror_only():
    from osmcoastline_spark.functions.webp import decode_webp

    decode_webp(_LOSSY)  # sanity: the pristine stream decodes
    _fuzz_truncations("vp8-lossy", _LOSSY, decode_webp)


@_needs_libwebp
def test_lossy_vp8_byte_flips_raise_valueerror_only():
    from osmcoastline_spark.functions.webp import decode_webp

    _fuzz_byte_flips("vp8-lossy", _LOSSY, decode_webp, 4243)


# ------------------------------------------------ PNG allocation-bomb guards


def test_png_zip_bomb_is_bounded_and_raises():
    """A tiny IDAT that inflates far past the IHDR promise must die at the
    bounded-inflate check, not allocate the full bomb then fail reshape."""
    import struct
    import zlib

    from osmcoastline_spark.functions.image import _png_chunk, decode_png

    # IHDR promises 4x4 RGB (expected inflate = 4*(1+12) = 52 bytes)...
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    # ...but the IDAT inflates to 10 MB of zeros (wire size ~10 KB)
    bomb = zlib.compress(b"\x00" * 10_000_000, 9)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", bomb)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="inflates"):
        decode_png(data)


def test_png_hostile_dims_raise_before_allocation():
    import struct

    from osmcoastline_spark.functions.image import _png_chunk, decode_png

    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0)
    data = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="decode cap"):
        decode_png(data)
