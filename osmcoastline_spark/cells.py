"""Grid / Z-order cell encoding — the spatial index for every self-join.

The reference replaces O(n²) spatial joins with a sorted sweep
(src/coastline_ring_collection.cpp:277,313-316). On Spark the equivalent is
cell binning: assign geometries to fixed grid cells (with boundary-cell
duplication for objects spanning cells), shuffle on the cell id, and do exact
geometry only within a cell. This bounds candidates per cell the same way the
sweep's x-window bounds them — and unlike the sweep, it parallelizes.

Cells are pure arithmetic (portable to DuckDB SQL for the oracle checks):

    ix = floor((lon + 180) / cell_deg)
    iy = floor((lat +  90) / cell_deg)
    cell = ix * 1_000_000 + iy            # collision-free for cell_deg ≥ 1e-3

A true Morton/Z-order interleave is also provided for locality-preserving
range partitioning of sinks (Iceberg sort order at scale).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

CELL_STRIDE = 1_000_000


def cell_ixy_exprs(lon: Column, lat: Column, cell_deg: float) -> tuple[Column, Column]:
    """The (ix, iy) cell indices as separate Catalyst expressions — the
    shared origin/step convention every cell consumer must agree on.
    `cell_id_expr` packs them; knn_join offsets them before packing (the
    site-side ±reach expansion needs the axes unpacked)."""
    ix = F.floor((lon + F.lit(180.0)) / F.lit(cell_deg)).cast("long")
    iy = F.floor((lat + F.lit(90.0)) / F.lit(cell_deg)).cast("long")
    return ix, iy


def cell_id_expr(lon: Column, lat: Column, cell_deg: float) -> Column:
    ix, iy = cell_ixy_exprs(lon, lat, cell_deg)
    return (ix * F.lit(CELL_STRIDE) + iy).cast("long")


def cell_id_sql(lon: str, lat: str, cell_deg: float) -> str:
    """Identical arithmetic as ANSI SQL (DuckDB oracle parity)."""
    return (
        f"(CAST(floor(({lon} + 180.0) / {cell_deg!r}) AS BIGINT) * {CELL_STRIDE} "
        f"+ CAST(floor(({lat} + 90.0) / {cell_deg!r}) AS BIGINT))"
    )


def cell_id_np(lon: np.ndarray, lat: np.ndarray, cell_deg: float) -> np.ndarray:
    ix = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / cell_deg).astype(np.int64)
    iy = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / cell_deg).astype(np.int64)
    return ix * CELL_STRIDE + iy


def segment_cover_cells(x1, y1, x2, y2, cell_deg: float) -> list[np.ndarray]:
    """Cells covered by each segment's bbox (boundary-cell duplication).

    Returns a python list of int64 arrays (ragged). Coastline segments are
    short relative to any sane cell size, so the cover is almost always 1-2
    cells; the dedup after the binned self-join removes the duplicates this
    creates (dropDuplicates on the pair key).
    """
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    ix_lo = np.floor((np.minimum(x1, x2) + 180.0) / cell_deg).astype(np.int64)
    ix_hi = np.floor((np.maximum(x1, x2) + 180.0) / cell_deg).astype(np.int64)
    iy_lo = np.floor((np.minimum(y1, y2) + 90.0) / cell_deg).astype(np.int64)
    iy_hi = np.floor((np.maximum(y1, y2) + 90.0) / cell_deg).astype(np.int64)
    out = []
    for a, b, c, d in zip(ix_lo, ix_hi, iy_lo, iy_hi):
        gx = np.arange(a, b + 1, dtype=np.int64)
        gy = np.arange(c, d + 1, dtype=np.int64)
        out.append((gx[:, None] * CELL_STRIDE + gy[None, :]).ravel())
    return out


def bbox_cover_cells_expr(
    minx: Column, miny: Column, maxx: Column, maxy: Column, cell_deg: float,
    x0: float = -180.0, y0: float = -90.0,
) -> Column:
    """Array of covered cell ids as a pure Catalyst expression (sequence ×
    sequence cross-flatten) — keeps tile-cover joins JVM-side. `x0`/`y0`
    shift the grid origin so the same math serves any SRS extent (3857
    passes -MERC with a metre-sized cell)."""
    ix_lo = F.floor((minx - F.lit(x0)) / F.lit(cell_deg)).cast("long")
    ix_hi = F.floor((maxx - F.lit(x0)) / F.lit(cell_deg)).cast("long")
    iy_lo = F.floor((miny - F.lit(y0)) / F.lit(cell_deg)).cast("long")
    iy_hi = F.floor((maxy - F.lit(y0)) / F.lit(cell_deg)).cast("long")
    xs = F.sequence(ix_lo, ix_hi)
    ys = F.sequence(iy_lo, iy_hi)
    return F.flatten(
        F.transform(xs, lambda ix: F.transform(ys, lambda iy: ix * F.lit(CELL_STRIDE) + iy))
    )


def morton_interleave_expr(
    lon: Column,
    lat: Column,
    bits: int = 16,
    extent: tuple[float, float, float, float] = (-180.0, 180.0, -90.0, 90.0),
) -> Column:
    """Z-order (Morton) code as a Catalyst expression: interleave `bits`
    bits of the quantized x/y. Used as a sink sort key so spatially
    nearby rows land in the same files (Iceberg metadata pruning).

    `extent` is (minx, maxx, miny, maxy) of the coordinate system —
    degrees by default; pass the WebMercator square (±geom.MERC) for
    epsg=3857 geometry, whose metre-valued coordinates would otherwise
    all clamp to the top index (positive) or interleave sign-bit garbage
    (negative) and silently lose the spatial layout. Out-of-extent
    values clamp to the edge cells on BOTH sides (the original code only
    clamped above)."""
    minx, maxx, miny, maxy = extent
    ix = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit((1 << bits) - 1),
            F.floor(
                (lon - F.lit(minx)) / F.lit(maxx - minx) * F.lit(float(1 << bits))
            ).cast("long"),
        ),
    )
    iy = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit((1 << bits) - 1),
            F.floor(
                (lat - F.lit(miny)) / F.lit(maxy - miny) * F.lit(float(1 << bits))
            ).cast("long"),
        ),
    )
    code = F.lit(0).cast("long")
    for b in range(bits):
        code = (
            code
            + F.shiftleft(F.shiftright(ix, b).bitwiseAND(F.lit(1)), 2 * b + 1)
            + F.shiftleft(F.shiftright(iy, b).bitwiseAND(F.lit(1)), 2 * b)
        )
    return code


def with_salt(df, salt_col: str = "salt", buckets: int = 16):
    """Deterministic salt for skew-prone keys, written to `salt_col`:
    salt = positive hash of the row's content modulo `buckets`. Used to
    split mega-cells (coastline density skew) before per-cell work that
    doesn't need cell completeness. Map-typed columns are excluded from
    the hash (Spark's hash() rejects MapType — e.g. the nodes table's
    tags column would otherwise make this raise)."""
    from pyspark.sql.types import MapType

    cols = [f.name for f in df.schema.fields if not isinstance(f.dataType, MapType)]
    if not cols:
        raise ValueError("with_salt: no hashable (non-map) columns")
    return df.withColumn(salt_col, F.pmod(F.hash(*cols), F.lit(buckets)))
