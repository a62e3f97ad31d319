"""Multimodal (image) column operators.

Per BASELINE.json input_hint the payload rides as an opaque binary column
with typed metadata (w, h, fmt). All operators are `mapInPandas` over Arrow
batches — the Spark-side plumbing (schema, partitioning, batch shape) is
real and tested; only non-'raw' codecs are stubbed (no PIL/libjpeg in this
container — decode_image raises NotImplementedError for them).

The per-row invariant vs the reference (decoded-pixel PSNR ≥ 40 dB for
lossy formats + caption equality) is implemented in verify_payloads and run
at the pipeline sink.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def decode_image(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode to HxWx3 uint8. Only the deterministic 'raw' codec is real;
    jpeg/png/webp decoding is stubbed pending codec libs."""
    if fmt == "raw":
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    raise NotImplementedError(
        f"codec {fmt!r} requires an image library not present in this environment"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 20.0 * np.log10(255.0 / np.sqrt(mse))


def average_hash(pixels: np.ndarray) -> int:
    g = pixels.astype(np.float64).mean(axis=2)
    h, w = g.shape
    g = g[: h - h % 8, : w - w % 8]
    g = g.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    bits = (g > g.mean()).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= 1 << 63 else v


def resize_nn(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy index math)."""
    h, w = pixels.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[yi][:, xi]


def with_image_features(images: DataFrame, thumb: int = 4) -> DataFrame:
    """Decode → phash + mean luma + thumbnail, batched over Arrow."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                try:
                    px = decode_image(r["bytes"], r["w"], r["h"], r["fmt"])
                except NotImplementedError:
                    rows.append((r["image_id"], None, None, None))
                    continue
                small = resize_nn(px, thumb, thumb)
                rows.append(
                    (
                        r["image_id"],
                        average_hash(px),
                        float(px.astype(np.float64).mean()),
                        small.tobytes(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "computed_phash", "mean_luma", "thumb"]
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, "image_id string, computed_phash long, mean_luma double, thumb binary"
    )


def verify_payloads(images: DataFrame, reference: DataFrame, min_psnr: float = 40.0) -> DataFrame:
    """Per-row invariant check (BASELINE.json input_hint): decoded-pixel
    PSNR ≥ min_psnr + caption equality, joined on image_id. Returns rows
    that FAIL (empty result = pass)."""
    a = images.select("image_id", "bytes", "w", "h", "fmt", "caption")
    b = reference.select(
        reference["image_id"].alias("image_id"),
        reference["bytes"].alias("ref_bytes"),
        reference["w"].alias("ref_w"),
        reference["h"].alias("ref_h"),
        reference["fmt"].alias("ref_fmt"),
        reference["caption"].alias("ref_caption"),
    )
    joined = a.join(b, "image_id")

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            bad = []
            for _, r in pdf.iterrows():
                reason = None
                if r["caption"] != r["ref_caption"]:
                    reason = "caption_mismatch"
                else:
                    try:
                        pa = decode_image(r["bytes"], r["w"], r["h"], r["fmt"])
                        pb = decode_image(r["ref_bytes"], r["ref_w"], r["ref_h"], r["ref_fmt"])
                        if pa.shape != pb.shape:
                            reason = "shape_mismatch"
                        elif psnr(pa, pb) < min_psnr:
                            reason = "psnr_below_threshold"
                    except NotImplementedError:
                        reason = None  # stubbed codec: caption check only
                if reason:
                    bad.append((r["image_id"], reason))
            yield pd.DataFrame(bad, columns=["image_id", "reason"])

    return joined.mapInPandas(run, "image_id string, reason string")
