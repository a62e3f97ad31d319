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


@pytest.mark.parametrize("label_idx", range(5))
def test_every_truncation_raises_valueerror_only(label_idx):
    label, good, decode = _streams()[label_idx]
    # every prefix, including the empty stream
    for cut in range(len(good)):
        _assert_contract(label, decode, good[:cut], f"truncation at {cut}")


@pytest.mark.parametrize("label_idx", range(5))
def test_byte_flip_sweep_raises_valueerror_only(label_idx):
    label, good, decode = _streams()[label_idx]
    rng = np.random.default_rng(99 + label_idx)
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
