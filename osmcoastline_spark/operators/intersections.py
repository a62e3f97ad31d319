"""J5/J6/O1/S4 — segment extraction, duplicate detection, cell-binned
self-intersection join.

The reference sorts every segment globally and sweeps with an x-window
(src/coastline_ring_collection.cpp:277,313-316) — inherently sequential.
Spark-first replacement: bin segments to grid cells (bbox cover, boundary
duplication), self-join on the cell id with `a.seg_id < b.seg_id`, dedupe
cross-cell pairs, then run the exact intersection arithmetic (bit-identical
to the reference, src/coastline_ring_collection.cpp:202-230) as a vectorized
numpy kernel over Arrow batches. Candidates per cell are bounded the same way
the sweep's window bounds them, and cells process in parallel.

Duplicate segments (J6) are a plain groupBy on the normalized coordinates —
map-side partial aggregation, no UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmcoastline_spark import geom
from osmcoastline_spark.cells import bbox_cover_cells_expr

DEFAULT_CELL_DEG = 0.5


def ring_segments(rings: DataFrame) -> DataFrame:
    """Explode ring coordinate arrays into normalized undirected segments.

    Pure Catalyst (transform/sequence/posexplode) — no Python. Output:
    ring_id, idx, x1, y1, x2, y2 with (x1,y1) <= (x2,y2) lexicographically
    (the reference's UndirectedSegment normalization).
    """
    # rings with <2 points produce no segments; unguarded, sequence(1, 0)
    # generates the DESCENDING array [1, 0] and xs[1] throws
    # INVALID_ARRAY_INDEX under ANSI (same trap documented at
    # similarity.ivf_cells_expr)
    segs = rings.filter(F.size("xs") >= 2).select(
        "ring_id",
        F.posexplode(
            F.expr(
                "transform(sequence(1, size(xs)-1), "
                "i -> struct(xs[i-1] as ax, ys[i-1] as ay, xs[i] as bx, ys[i] as by))"
            )
        ).alias("idx", "s"),
    ).select("ring_id", "idx", "s.ax", "s.ay", "s.bx", "s.by")
    fwd = (F.col("ax") < F.col("bx")) | ((F.col("ax") == F.col("bx")) & (F.col("ay") <= F.col("by")))
    return segs.select(
        "ring_id",
        "idx",
        F.when(fwd, F.col("ax")).otherwise(F.col("bx")).alias("x1"),
        F.when(fwd, F.col("ay")).otherwise(F.col("by")).alias("y1"),
        F.when(fwd, F.col("bx")).otherwise(F.col("ax")).alias("x2"),
        F.when(fwd, F.col("by")).otherwise(F.col("ay")).alias("y2"),
    )


def sorted_segments(segments: DataFrame) -> DataFrame:
    """O1/S4: canonical total-order segment table (range-partitioned sort)
    — the parquet equivalent of the reference's binary segment dump."""
    return segments.select("x1", "y1", "x2", "y2").orderBy("x1", "y1", "x2", "y2")


def duplicate_segment_counts(segments: DataFrame) -> DataFrame:
    """(x1, y1, x2, y2, k) for every segment appearing k>1 times — the
    shared input of the overlap error lines AND the gap-close orphan
    filter (one groupBy shuffle instead of two identical ones)."""
    return (
        segments.groupBy("x1", "y1", "x2", "y2")
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") > 1)
    )


def duplicate_segments(segments: DataFrame, dup: DataFrame | None = None) -> DataFrame:
    """J6 → error_lines('overlap'); k copies of a segment yield C(k,2)
    overlap rows, matching the reference's pairwise loop. Pass `dup`
    (duplicate_segment_counts output) to reuse an existing aggregation."""
    if dup is None:
        dup = duplicate_segment_counts(segments)
    return dup.select(
        F.explode(F.sequence(F.lit(1), (F.col("k") * (F.col("k") - 1) / 2).cast("int"))).alias(
            "_n"
        ),
        F.lit(0).cast("long").alias("osm_id"),
        F.lit("overlap").alias("error"),
        F.array("x1", "x2").alias("xs"),
        F.array("y1", "y2").alias("ys"),
    ).drop("_n")


def intersection_errors(segments: DataFrame, cell_deg: float = DEFAULT_CELL_DEG) -> DataFrame:
    """J5 → error_points('intersection').

    segments must carry (ring_id, idx) for a stable per-instance id.
    """
    return intersection_pairs(segments, cell_deg).select(
        F.lit(0).cast("long").alias("osm_id"),
        F.lit("intersection").alias("error"),
        "x",
        "y",
    )


def intersection_pairs(segments: DataFrame, cell_deg: float = DEFAULT_CELL_DEG) -> DataFrame:
    """All crossing segment pairs as (a_ring, b_ring, x, y) — ONE cell-binned
    join serving both the 'intersection' error points and the ring-validity
    triage (same-ring rows = self-intersections, G5/G13)."""
    # segment identity is the COMPOSITE (ring_id, idx) struct, compared
    # lexicographically — a hashed 64-bit id would make the a_id < b_id
    # pair dedup collision-prone: two distinct crossing segments whose
    # hashes collide would compare equal and their intersection would be
    # silently dropped (at ~1e9 segments a collision existing is a
    # percent-level birthday event)
    with_id = segments.withColumn("seg_id", F.struct("ring_id", "idx"))
    covered = with_id.withColumn(
        "cell",
        F.explode(
            bbox_cover_cells_expr(
                F.least("x1", "x2"), F.least("y1", "y2"),
                F.greatest("x1", "x2"), F.greatest("y1", "y2"),
                cell_deg,
            )
        ),
    )
    a = covered.select(
        "cell",
        F.col("ring_id").alias("a_ring"),
        F.col("seg_id").alias("a_id"),
        F.col("x1").alias("ax1"), F.col("y1").alias("ay1"),
        F.col("x2").alias("ax2"), F.col("y2").alias("ay2"),
    )
    b = covered.select(
        "cell",
        F.col("ring_id").alias("b_ring"),
        F.col("seg_id").alias("b_id"),
        F.col("x1").alias("bx1"), F.col("y1").alias("by1"),
        F.col("x2").alias("bx2"), F.col("y2").alias("by2"),
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        # identical segments are 'overlap', not 'intersection'
        .filter(
            (F.col("ax1") != F.col("bx1"))
            | (F.col("ay1") != F.col("by1"))
            | (F.col("ax2") != F.col("bx2"))
            | (F.col("ay2") != F.col("by2"))
        )
        # cheap bbox reject BEFORE any further work (reference y-range test)
        .filter(
            (F.least("ax1", "ax2") <= F.greatest("bx1", "bx2"))
            & (F.least("bx1", "bx2") <= F.greatest("ax1", "ax2"))
            & (F.least("ay1", "ay2") <= F.greatest("by1", "by2"))
            & (F.least("by1", "by2") <= F.greatest("ay1", "ay2"))
        )
        # shared-endpoint reject in codegen (round-3 Arrow diet): the exact
        # kernel defines endpoint-sharing pairs as non-intersecting
        # (geom.segment_intersections, reference crc:202-230), and chain
        # neighbors — which always share an endpoint and always pass the
        # bbox test — are the BULK of in-cell candidates. Dropping them
        # here keeps them out of the Arrow batch transfer entirely.
        .filter(
            ~(
                ((F.col("ax1") == F.col("bx1")) & (F.col("ay1") == F.col("by1")))
                | ((F.col("ax1") == F.col("bx2")) & (F.col("ay1") == F.col("by2")))
                | ((F.col("ax2") == F.col("bx1")) & (F.col("ay2") == F.col("by1")))
                | ((F.col("ax2") == F.col("bx2")) & (F.col("ay2") == F.col("by2")))
            )
        )
    )

    # Owner-cell dedup: a pair sharing several cover cells is *evaluated*
    # in each, but the intersection point is *emitted* only by the cell that
    # contains it — no dropDuplicates shuffle (the classic spatial-join
    # reporting trick; replaces the sweep's single-threaded total order).
    def exact(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from osmcoastline_spark.cells import cell_id_np

        for pdf in it:
            if len(pdf) == 0:
                continue
            mask, ix, iy = geom.segment_intersections(
                pdf["ax1"].to_numpy(), pdf["ay1"].to_numpy(),
                pdf["ax2"].to_numpy(), pdf["ay2"].to_numpy(),
                pdf["bx1"].to_numpy(), pdf["by1"].to_numpy(),
                pdf["bx2"].to_numpy(), pdf["by2"].to_numpy(),
            )
            own = cell_id_np(ix, iy, cell_deg) == pdf["cell"].to_numpy()
            keep = mask & own
            yield pd.DataFrame(
                {
                    "a_ring": pdf["a_ring"].to_numpy()[keep],
                    "b_ring": pdf["b_ring"].to_numpy()[keep],
                    "x": ix[keep],
                    "y": iy[keep],
                }
            )

    return pairs.mapInPandas(exact, "a_ring long, b_ring long, x double, y double")


def ring_self_intersections(segments: DataFrame, cell_deg: float = DEFAULT_CELL_DEG) -> DataFrame:
    """G13 backbone: (ring_id, x, y) for every SAME-RING crossing pair —
    the numpy stand-in for GEOS IsValid + GEOSisValidReason's
    'Self-intersection[x y]' parse (reference src/output_database.cpp:170-211).
    A projection of intersection_pairs (a ring polygon's validity only
    cares about itself)."""
    return (
        intersection_pairs(segments, cell_deg)
        .filter(F.col("a_ring") == F.col("b_ring"))
        .select(F.col("a_ring").alias("ring_id"), "x", "y")
    )
