"""Multimodal (video) column operators.

Video rides as an opaque binary column with typed metadata, exactly like
image/audio. This environment has no video codec library, so the real
codecs ('h264', 'vp9', 'av1', 'mp4') raise NotImplementedError BY NAME —
the documented drop path — while the Spark-side plumbing (schema,
Arrow-batched frame sampling, per-frame feature extraction) is real and
exercised end-to-end through RV01, a trivial uncompressed container
defined here:

    b"RV01" + struct('>HHHH', w, h, n_frames, fps) + n_frames · w·h·3 RGB

Frame sampling reuses the image family's feature kernels per decoded
frame; q_video_frames in __spark_entry__ carries a closed-form DuckDB
oracle over synthetic solid-color frames (constant-image mean luma is
exact — same oracle pattern as audio's square waves).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .image import average_hash

_MAGIC = b"RV01"
_HDR = struct.Struct(">HHHH")


def encode_rv01(frames: np.ndarray, fps: int) -> bytes:
    """(n, h, w, 3) uint8 frames → RV01 bytes."""
    f = np.ascontiguousarray(np.asarray(frames, dtype=np.uint8))
    if f.ndim != 4 or f.shape[3] != 3:
        raise ValueError("frames must be (n, h, w, 3)")
    n, h, w, _ = f.shape
    return _MAGIC + _HDR.pack(w, h, n, fps) + f.tobytes()


def decode_rv01(b: bytes) -> tuple[int, np.ndarray]:
    """RV01 bytes → (fps, (n, h, w, 3) uint8 frames). ValueError on
    malformed input (never Index/KeyError — droppable per row)."""
    b = bytes(b)
    if len(b) < 12 or b[:4] != _MAGIC:
        raise ValueError("not an RV01 stream")
    w, h, n, fps = _HDR.unpack_from(b, 4)
    need = 12 + n * h * w * 3
    if len(b) < need or w == 0 or h == 0:
        raise ValueError("truncated RV01 stream")
    frames = np.frombuffer(b[12:need], dtype=np.uint8).reshape(n, h, w, 3)
    return fps, frames


def decode_video(b: bytes, fmt: str) -> tuple[int, np.ndarray]:
    if fmt == "rv01":
        return decode_rv01(b)
    raise NotImplementedError(f"video codec '{fmt}' not available in this environment")


def sample_frames(
    video: DataFrame, every: int = 2, id_col: str = "video_id", with_hash: bool = True
) -> DataFrame:
    """Frame sampling + per-frame features, batched over Arrow: one output
    row per kept frame (indices 0, every, 2·every, …) with the frame's
    exact mean luminance and average-hash. Undecodable payloads are
    dropped whole (stubbed codec / malformed bytes), matching the image
    and audio families.

    Scale shape: sampling happens INSIDE the decode batch, so only kept
    frames' features (not pixels) leave the worker; the 100 TB layout
    keeps one video per row and lets Spark size Arrow batches — no
    driver-side frame loop anywhere."""
    if every <= 0:
        raise ValueError("every must be positive")

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    _, frames = decode_video(r.bytes, r.fmt)
                except (NotImplementedError, ValueError):
                    continue
                for idx in range(0, frames.shape[0], every):
                    fr = frames[idx]
                    row = (
                        getattr(r, id_col),
                        idx,
                        float(fr.astype(np.float64).mean()),
                    )
                    # hash only on request: a .select() downstream cannot
                    # prune work done inside the Python batch
                    rows.append(row + (average_hash(fr),) if with_hash else row)
            yield pd.DataFrame(rows, columns=cols)

    cols = [id_col, "frame_idx", "mean_luma"] + (["phash"] if with_hash else [])
    schema = f"{id_col} long, frame_idx long, mean_luma double" + (
        ", phash long" if with_hash else ""
    )
    return video.select(id_col, "bytes", "fmt").mapInPandas(run, schema)
