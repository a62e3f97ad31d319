"""Cross-validation of the from-scratch VP8L codec against libwebp.

The codec in ``functions/webp.py`` was written purely from the public VP8L
bitstream specification; this module checks spec COMPLIANCE (not just
self-consistency) by driving the system's real libwebp shared library via
ctypes as a test oracle, in both directions:

* every byte stream our encoder emits must decode bit-exactly in libwebp
  (``WebPDecodeRGBA``), across all transform/cache/meta flag combinations;
* byte streams produced by libwebp's own lossless encoder
  (``WebPEncodeLosslessRGB``) must decode bit-exactly in our decoder —
  this exercises decoder paths our encoder never emits (libwebp's choice
  of predictor blocks, cache sizes, meta-huffman splits, LZ77 shapes).

libwebp is used ONLY here, as an oracle: the engine itself never links or
loads it (the implementation stays from-scratch). If the library is not
present the module skips, preserving the pre-oracle roundtrip tests in
test_functions.py as the fallback evidence.
"""
from __future__ import annotations

import ctypes

import numpy as np
import pytest

from osmcoastline_spark.functions.webp import decode_webp, encode_webp


def _load_libwebp():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    try:
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGB.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.WebPFree.argtypes = [ctypes.c_void_p]
    except AttributeError:
        return None
    return lib


_LIB = _load_libwebp()

pytestmark = pytest.mark.skipif(
    _LIB is None, reason="libwebp.so.7 not available as an oracle"
)


def _lib_decode_rgb(data: bytes) -> np.ndarray | None:
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        return None
    n = w.value * h.value * 4
    arr = np.ctypeslib.as_array(p, shape=(n,)).reshape(h.value, w.value, 4).copy()
    _LIB.WebPFree(p)
    return arr[:, :, :3]


def _lib_encode_rgb(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    buf = np.ascontiguousarray(arr, dtype=np.uint8)
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeLosslessRGB(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w,
        h,
        w * 3,
        ctypes.byref(out),
    )
    assert n > 0, "libwebp lossless encode failed"
    data = bytes(np.ctypeslib.as_array(out, shape=(n,)))
    _LIB.WebPFree(out)
    return data


def _images() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(7)
    photo = np.clip(
        np.add.outer(
            np.sin(np.linspace(0, 6, 48)) * 90 + 100,
            np.cos(np.linspace(0, 9, 64)) * 60,
        )[..., None]
        + rng.normal(0, 6, (48, 64, 3)),
        0,
        255,
    ).astype(np.uint8)
    return {
        "noise_9x7": rng.integers(0, 256, (7, 9, 3), dtype=np.uint8),
        "gradient_33x17": (
            np.arange(17 * 33 * 3, dtype=np.uint32).reshape(17, 33, 3) % 251
        ).astype(np.uint8),
        "flat_16x16": np.full((16, 16, 3), 130, np.uint8),
        "palette_20x11": rng.integers(0, 4, (11, 20, 3), dtype=np.uint8) * 70,
        "photo_64x48": photo,
        "tiny_1x1": np.array([[[255, 0, 4]]], dtype=np.uint8),
    }


_FLAG_COMBOS = [
    {},
    {"use_backrefs": False},
    {"predictor": True},
    {"subtract_green": True},
    {"color_transform": True},
    {"cache_bits": 4},
    {"meta": True},
    {
        "predictor": True,
        "subtract_green": True,
        "color_transform": True,
        "cache_bits": 6,
        "meta": True,
    },
    {"palette": True},
]


def test_our_encoder_streams_decode_in_libwebp():
    """Every flag combination we can emit is accepted bit-exactly by libwebp."""
    for name, img in _images().items():
        for flags in _FLAG_COMBOS:
            try:
                data = encode_webp(img, **flags)
            except ValueError:
                # palette mode legitimately refuses >256-color images
                assert flags.get("palette"), (name, flags)
                continue
            got = _lib_decode_rgb(data)
            assert got is not None, f"libwebp rejected our stream: {name} {flags}"
            assert np.array_equal(got, img), f"pixel mismatch: {name} {flags}"


def test_libwebp_streams_decode_in_our_decoder():
    """libwebp's own lossless encoder output decodes bit-exactly in ours."""
    for name, img in _images().items():
        data = _lib_encode_rgb(img)
        got = decode_webp(data)
        assert np.array_equal(got, img), f"pixel mismatch decoding libwebp: {name}"
