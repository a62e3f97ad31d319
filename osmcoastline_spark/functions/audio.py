"""Multimodal (audio) column operators.

Same design as functions/image.py: the payload rides as an opaque binary
column with typed metadata (fmt, and whatever the container carries), and
every operator is `mapInPandas` over Arrow batches, so the Spark-side
plumbing — schema, partitioning, batch shape — is the production shape.

Codec: 'wav' (RIFF/WAVE PCM, 16-bit, any channel count) is REAL — a
from-scratch chunk-walking parser on stdlib struct + numpy; no audio
library exists in this environment, so compressed codecs ('mp3', 'flac',
'ogg', 'aac') raise NotImplementedError BY NAME and the feature extractor
drops those rows to nulls instead of failing the task (identical posture
to the image family before its codecs were built out).

Features are chosen to be exactly reproducible: rms/peak/zcr/duration of
PCM integers are integer sums and single IEEE divisions (and one sqrt of
an exactly-representable square for rms on synthetic square waves), which
is what lets __spark_entry__.q_audio_features carry a closed-form DuckDB
oracle — the same trick as q_water_tiles' lattice oracle.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Mono or (n, ch) int16 PCM → RIFF/WAVE bytes (canonical 44-byte
    header: fmt chunk then data chunk)."""
    x = np.asarray(samples, dtype="<i2")
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    data = x.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(b: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 bytes → (sample_rate, (n, ch) int16 array).

    Walks the chunk list (fmt /data may be separated by LIST/fact/other
    chunks; chunks are word-aligned with a pad byte after odd sizes).
    Raises ValueError on malformed/truncated/unsupported streams so the
    feature extractor can drop the row — never IndexError/KeyError
    (the jpeg-decoder lesson from the round-4 advice)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, rate, ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        pos += 8
        if pos + size > len(b):
            raise ValueError("truncated WAV chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            audio_fmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", b, pos)
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV format tag {audio_fmt} (PCM only)")
            if bits != 16:
                raise ValueError(f"unsupported WAV bit depth {bits} (16-bit only)")
            if ch < 1:
                raise ValueError("bad channel count")
            if rate == 0:
                # a zero rate would make duration_s divide by zero in the
                # feature extractor — fail the ROW here, never the task
                raise ValueError("bad sample rate 0")
        elif tag == b"data":
            data = b[pos : pos + size]
        pos += size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    frame = ch * 2
    usable = len(data) - len(data) % frame
    x = np.frombuffer(data[:usable], dtype="<i2").reshape(-1, ch)
    return rate, x


def decode_audio(b: bytes, fmt: str) -> tuple[int, np.ndarray]:
    """Dispatch on the payload's declared format. Only containers a codec
    exists for decode; everything else raises by name (env has no audio
    libraries — documented drop path, mirrored from the image family)."""
    if fmt == "wav":
        return decode_wav(bytes(b))
    raise NotImplementedError(f"audio codec '{fmt}' not available in this environment")


def with_audio_features(audio: DataFrame, id_col: str = "audio_id") -> DataFrame:
    """Decode → duration / rms / zero-crossing count / peak, batched over
    Arrow. Undecodable rows (stubbed codec or malformed bytes) keep their
    id with null features — a hostile payload must never fail the task.

    Channel handling: features are over the mixdown-free FIRST channel
    (deterministic, no resample/dither step to drift across platforms).
    """

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    rate, x = decode_audio(r.bytes, r.fmt)
                except (NotImplementedError, ValueError):
                    rows.append((getattr(r, id_col), None, None, None, None, None, None))
                    continue
                c0 = x[:, 0].astype(np.float64)
                n = c0.shape[0]
                rms = float(np.sqrt((c0 * c0).sum() / n)) if n else 0.0
                # bool arrays reject np.diff's subtract — compare shifts
                zcr = int(np.count_nonzero((c0[1:] < 0) != (c0[:-1] < 0))) if n > 1 else 0
                # abs over the float64 channel, NOT the int16 array:
                # np.abs(int16(-32768)) silently wraps to -32768, so a
                # full-scale negative sample would corrupt the peak
                peak = int(np.abs(c0).max()) if n else 0
                rows.append(
                    (getattr(r, id_col), rate, n, n / rate, rms, zcr, peak)
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "sample_rate", "n_samples", "duration_s", "rms", "zcr", "peak"],
            )

    return audio.select(id_col, "bytes", "fmt").mapInPandas(
        run,
        f"{id_col} long, sample_rate long, n_samples long, duration_s double, "
        "rms double, zcr long, peak long",
    )


def with_audio_windows(
    audio: DataFrame, win: int, hop: int, id_col: str = "audio_id"
) -> DataFrame:
    """Frame-sample analog for audio: fixed-size analysis windows of the
    first channel, one output row per (clip, window) with the window's rms
    and peak. Windows shorter than `win` at the tail are dropped (standard
    STFT convention). Explodes INSIDE the Arrow batch — the shuffle after
    this is keyed however the caller groups, not forced here."""
    if win <= 0 or hop <= 0:
        raise ValueError("win and hop must be positive")

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    _, x = decode_audio(r.bytes, r.fmt)
                except (NotImplementedError, ValueError):
                    continue
                c0 = x[:, 0].astype(np.float64)
                for w_idx, start in enumerate(range(0, len(c0) - win + 1, hop)):
                    seg = c0[start : start + win]
                    rows.append(
                        (
                            getattr(r, id_col),
                            w_idx,
                            float(np.sqrt((seg * seg).sum() / win)),
                            int(np.abs(seg).max()),
                        )
                    )
            yield pd.DataFrame(rows, columns=[id_col, "win_idx", "rms", "peak"])

    return audio.select(id_col, "bytes", "fmt").mapInPandas(
        run, f"{id_col} long, win_idx long, rms double, peak long"
    )


def square_wave(amp: int, half_period: int, n: int) -> np.ndarray:
    """Deterministic ±amp square wave: +amp while (i // half_period) is
    even. Closed-form features (the oracle's side of the contract):
    rms = amp exactly (amp² is integer-exact in float64 and sqrt is
    correctly rounded), peak = amp, and the sign flips land at each
    multiple of half_period in [1, n-1], so zcr = (n-1) // half_period."""
    i = np.arange(n)
    return np.where((i // half_period) % 2 == 0, amp, -amp).astype(np.int16)
