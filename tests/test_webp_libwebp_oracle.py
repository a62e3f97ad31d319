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


# ---------------------------------------------------------------- lossy VP8
#
# The from-scratch RFC 6386 keyframe decoder (functions/vp8.py) is
# oracle-checked the same way: libwebp's LOSSY encoder produces real VP8
# arithmetic-coded streams (with segmentation, B_PRED mode trees, token
# probability updates and the normal loop filter all exercised at default
# encoder settings), and our YUV output planes must equal WebPDecodeYUV's
# byte-for-byte.  The comparison point is YUV deliberately: RGB conversion
# is an implementation choice outside the spec (libwebp's "fancy" chroma
# upsampler), while the YUV planes are fully normative.


def _load_lossy_symbols():
    if _LIB is None:
        return False
    try:
        _LIB.WebPEncodeRGB.restype = ctypes.c_size_t
        _LIB.WebPEncodeRGB.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        _LIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
        _LIB.WebPDecodeYUV.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
    except AttributeError:
        return False
    return True


_HAVE_LOSSY = _load_lossy_symbols()


def _lib_encode_lossy(arr: np.ndarray, quality: float) -> bytes:
    h, w, _ = arr.shape
    buf = np.ascontiguousarray(arr, dtype=np.uint8)
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeRGB(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w, h, w * 3, quality, ctypes.byref(out),
    )
    assert n > 0, "libwebp lossy encode failed"
    data = ctypes.string_at(out, n)
    _LIB.WebPFree(out)
    return data


def _lib_decode_yuv(data: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    p = _LIB.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(u), ctypes.byref(v),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    assert p, "libwebp YUV decode failed"
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    Y = np.frombuffer(ctypes.string_at(p, S * H), np.uint8).reshape(H, S)[:, :W].copy()
    U = np.frombuffer(ctypes.string_at(u, US * ch), np.uint8).reshape(ch, US)[:, :cw].copy()
    V = np.frombuffer(ctypes.string_at(v, US * ch), np.uint8).reshape(ch, US)[:, :cw].copy()
    _LIB.WebPFree(p)
    return Y, U, V


def _vp8_chunk(data: bytes) -> bytes:
    off = 12
    while off + 8 <= len(data):
        tag = data[off:off + 4]
        n = int.from_bytes(data[off + 4:off + 8], "little")
        if tag == b"VP8 ":
            return data[off + 8:off + 8 + n]
        off += 8 + n + (n & 1)
    raise AssertionError("no VP8 chunk in lossy stream")


@pytest.mark.skipif(not _HAVE_LOSSY, reason="libwebp lossy symbols unavailable")
def test_vp8_lossy_yuv_planes_match_libwebp():
    """Bit-exact YUV parity across content types, sizes (incl. odd,
    non-MB-aligned dims) and the full quality range."""
    from osmcoastline_spark.functions.vp8 import decode_vp8

    for name, img in _images().items():
        for q in (0.0, 20.0, 50.0, 75.0, 90.0, 100.0):
            data = _lib_encode_lossy(img, q)
            ref = _lib_decode_yuv(data)
            got = decode_vp8(_vp8_chunk(data))
            for plane, (g, r) in zip("YUV", zip(got, ref)):
                assert np.array_equal(g, r), f"{name} q={q} plane {plane}"


@pytest.mark.skipif(not _HAVE_LOSSY, reason="libwebp lossy symbols unavailable")
def test_vp8_lossy_through_dataframe_surface(spark):
    """Lossy webp end-to-end through decode_webp + with_image_features: the
    RGB output must be near the original (same PSNR posture as jpeg)."""
    from osmcoastline_spark.functions.image import decode_image, psnr

    img = _images()["photo_64x48"]
    data = _lib_encode_lossy(img, 90.0)
    out = decode_image(data, img.shape[1], img.shape[0], "webp")
    assert out.shape == img.shape
    assert psnr(out, img) > 30.0
