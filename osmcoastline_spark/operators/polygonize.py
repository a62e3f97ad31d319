"""R3 — polygonization with hole nesting (reference: src/osmcoastline.cpp:74-152
via GDAL organizePolygons(ONLY_CCW)) re-expressed as batched point-in-polygon.

Nesting rule: test each ring's first vertex against every other ring;
containment count = nesting depth; even depth ⇒ shell (land), odd depth ⇒
hole of its immediate parent (the containing ring at depth-1 with the
smallest area).

Scale design (the raster↔vector trick from the north rule): a containment
test against a giant container (Eurasia: 10^6+ vertices) must not ship the
container's array to every candidate point. Each container pre-classifies
its envelope's grid cells once:

    boundary cells — cells its ring passes through  → exact ray-cast needed
    inside cells   — cell center inside, no segment → containment is free

Points landing in inside-cells are contained with **no geometry join at
all**; only points in boundary cells join the container's coordinate arrays.
Exact work is ∝ coastline-adjacent points, not ∝ points.

Winding: rings arrive in OSM orientation (land left ⇒ CCW); polygon
emission reverses them (reference ogr_polygon(reverse=true),
src/coastline_ring.cpp:123-132 + class comment). fix_direction (G7) then
enforces shells-CW and flags rings that were wound wrong in OSM.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from osmcoastline_spark import geom
from osmcoastline_spark.cells import CELL_STRIDE, cell_id_expr

DEFAULT_CELL_DEG = 1.0


def _with_env(rings: DataFrame) -> DataFrame:
    return (
        rings.withColumn("env_minx", F.array_min("xs"))
        .withColumn("env_maxx", F.array_max("xs"))
        .withColumn("env_miny", F.array_min("ys"))
        .withColumn("env_maxy", F.array_max("ys"))
    )


def classify_container_cells(rings: DataFrame, cell_deg: float = DEFAULT_CELL_DEG) -> DataFrame:
    """Per ring: (ring_id, cell, kind) for every envelope cell; kind is
    'bnd' (ring passes through) or 'in' (cell center strictly inside)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ring, out_cell, out_kind = [], [], []
            for rid, xs, ys in zip(pdf["ring_id"], pdf["xs"], pdf["ys"]):
                xs = np.asarray(xs, dtype=np.float64)
                ys = np.asarray(ys, dtype=np.float64)
                ix = np.floor((xs + 180.0) / cell_deg).astype(np.int64)
                iy = np.floor((ys + 90.0) / cell_deg).astype(np.int64)
                # boundary cells: every cell touched by a vertex or a
                # segment bbox (segments are short; use per-segment bbox)
                bnd = set()
                for k in range(len(xs) - 1):
                    for gx in range(min(ix[k], ix[k + 1]), max(ix[k], ix[k + 1]) + 1):
                        for gy in range(min(iy[k], iy[k + 1]), max(iy[k], iy[k + 1]) + 1):
                            bnd.add(gx * CELL_STRIDE + gy)
                exlo = int(np.floor((xs.min() + 180.0) / cell_deg))
                exhi = int(np.floor((xs.max() + 180.0) / cell_deg))
                eylo = int(np.floor((ys.min() + 90.0) / cell_deg))
                eyhi = int(np.floor((ys.max() + 90.0) / cell_deg))
                cand = [
                    (gx, gy)
                    for gx in range(exlo, exhi + 1)
                    for gy in range(eylo, eyhi + 1)
                    if gx * CELL_STRIDE + gy not in bnd
                ]
                if cand:
                    cx = np.array([(gx + 0.5) * cell_deg - 180.0 for gx, _ in cand])
                    cy = np.array([(gy + 0.5) * cell_deg - 90.0 for _, gy in cand])
                    inside = geom.points_in_ring(cx, cy, xs, ys)
                    for (gx, gy), flag in zip(cand, inside):
                        if flag:
                            out_ring.append(rid)
                            out_cell.append(gx * CELL_STRIDE + gy)
                            out_kind.append("in")
                for c in bnd:
                    out_ring.append(rid)
                    out_cell.append(c)
                    out_kind.append("bnd")
            yield pd.DataFrame({"ring_id": out_ring, "cell": out_cell, "kind": out_kind})

    return rings.select("ring_id", "xs", "ys").mapInPandas(
        run, "ring_id long, cell long, kind string"
    )


def containment_pairs(rings: DataFrame, cell_deg: float = DEFAULT_CELL_DEG) -> DataFrame:
    """(ring_id, container_id) for every ring whose first vertex lies
    strictly inside another ring."""
    pts = rings.select(
        "ring_id",
        F.element_at("xs", 1).alias("px"),
        F.element_at("ys", 1).alias("py"),
    ).withColumn("cell", cell_id_expr(F.col("px"), F.col("py"), cell_deg))

    cls = classify_container_cells(rings, cell_deg).withColumnRenamed("ring_id", "container_id")

    hits = pts.join(cls, "cell").filter(F.col("ring_id") != F.col("container_id"))
    free = hits.filter(F.col("kind") == "in").select("ring_id", "container_id")

    # boundary cells: exact vectorized ray-cast, container arrays joined once
    # per (container, boundary-point) pair
    bnd = (
        hits.filter(F.col("kind") == "bnd")
        .select("ring_id", "px", "py", "container_id")
        .join(
            rings.select(
                F.col("ring_id").alias("container_id"),
                F.col("xs").alias("cxs"),
                F.col("ys").alias("cys"),
            ),
            "container_id",
        )
    )

    def exact(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            keep = []
            for px, py, cxs, cys in zip(pdf["px"], pdf["py"], pdf["cxs"], pdf["cys"]):
                keep.append(
                    bool(
                        geom.points_in_ring(
                            np.array([px]), np.array([py]), np.asarray(cxs), np.asarray(cys)
                        )[0]
                    )
                )
            yield pdf.loc[keep, ["ring_id", "container_id"]]

    exact_pairs = bnd.mapInPandas(exact, "ring_id long, container_id long")
    return free.unionByName(exact_pairs).distinct()


def polygonize(rings: DataFrame, cell_deg: float = DEFAULT_CELL_DEG) -> DataFrame:
    """Closed rings (npoints>3, OSM orientation) → polygons with holes.

    Output: POLYGONS_SCHEMA (+ ring lineage columns shell_ring_id,
    hole_ring_ids). Coordinates are reversed to GIS orientation here.
    """
    rings = _with_env(rings).cache()
    pairs = containment_pairs(rings, cell_deg)

    depth = (
        rings.select("ring_id")
        .join(pairs.groupBy("ring_id").agg(F.count("*").alias("depth")), "ring_id", "left")
        .fillna(0, ["depth"])
    )

    area = rings.select(
        "ring_id",
        F.abs(
            F.aggregate(
                F.zip_with(
                    F.slice("xs", 1, F.size("xs") - 1),
                    F.slice("ys", 2, F.size("ys") - 1),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            - F.aggregate(
                F.zip_with(
                    F.slice("xs", 2, F.size("xs") - 1),
                    F.slice("ys", 1, F.size("ys") - 1),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ).alias("area2"),
    )

    shells = depth.filter(F.col("depth") % 2 == 0).select("ring_id")
    holes = depth.filter(F.col("depth") % 2 == 1).select("ring_id")

    # immediate parent of a hole: containing ring with depth-1 parity and
    # minimal area among containers (ties broken by ring_id)
    hole_parent = (
        pairs.join(holes, "ring_id", "left_semi")
        .join(
            depth.select(F.col("ring_id").alias("container_id"), F.col("depth").alias("cdepth")),
            "container_id",
        )
        .join(depth.select("ring_id", "depth"), "ring_id")
        .filter(F.col("cdepth") == F.col("depth") - 1)
        .join(area.select(F.col("ring_id").alias("container_id"), "area2"), "container_id")
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("ring_id").orderBy("area2", "container_id")),
        )
        .filter(F.col("rk") == 1)
        .select("ring_id", F.col("container_id").alias("shell_id"))
    )

    rev = rings.select(
        "ring_id",
        F.reverse("xs").alias("rxs"),
        F.reverse("ys").alias("rys"),
        "nways",
        "fixed",
        "env_minx",
        "env_miny",
        "env_maxx",
        "env_maxy",
    )

    shell_geo = rev.join(shells, "ring_id", "left_semi")
    hole_geo = rev.join(hole_parent, "ring_id").select(
        "shell_id", F.col("rxs").alias("hxs"), F.col("rys").alias("hys"),
        F.col("ring_id").alias("hole_ring_id"),
    )
    hole_agg = hole_geo.groupBy("shell_id").agg(
        F.collect_list("hxs").alias("holes_x"),
        F.collect_list("hys").alias("holes_y"),
        F.collect_list("hole_ring_id").alias("hole_ring_ids"),
    )

    return (
        shell_geo.join(hole_agg, shell_geo.ring_id == hole_agg.shell_id, "left")
        .select(
            F.col("ring_id").alias("poly_id"),
            F.col("rxs").alias("shell_x"),
            F.col("rys").alias("shell_y"),
            "holes_x",
            "holes_y",
            F.size("rxs").cast("int").alias("npoints"),
            "env_minx",
            "env_miny",
            "env_maxx",
            "env_maxy",
            F.col("ring_id").alias("shell_ring_id"),
            "hole_ring_ids",
            "nways",
            "fixed",
        )
    )


def fix_direction(polygons: DataFrame) -> tuple[DataFrame, DataFrame]:
    """G7 (reference src/coastline_polygons.cpp:93-114): exterior rings must
    be clockwise; fix and emit error_lines('direction') for flipped ones.
    Pure column math — signed shoelace area via higher-order functions,
    conditional reverse — no UDF, stays in codegen."""
    area2 = F.aggregate(
        F.zip_with(
            F.slice("shell_x", 1, F.size("shell_x") - 1),
            F.slice("shell_y", 2, F.size("shell_y") - 1),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ) - F.aggregate(
        F.zip_with(
            F.slice("shell_x", 2, F.size("shell_x") - 1),
            F.slice("shell_y", 1, F.size("shell_y") - 1),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    tagged = polygons.withColumn("ccw", area2 > 0)
    flipped = tagged.filter("ccw")
    errors = flipped.select(
        F.lit(0).cast("long").alias("osm_id"),
        F.lit("direction").alias("error"),
        F.reverse("shell_x").alias("xs"),
        F.reverse("shell_y").alias("ys"),
    )
    fixed = tagged.select(
        *[c for c in polygons.columns if c not in ("shell_x", "shell_y", "holes_x", "holes_y")],
        F.when(F.col("ccw"), F.reverse("shell_x")).otherwise(F.col("shell_x")).alias("shell_x"),
        F.when(F.col("ccw"), F.reverse("shell_y")).otherwise(F.col("shell_y")).alias("shell_y"),
        F.when(
            F.col("ccw"), F.transform("holes_x", lambda a: F.reverse(a))
        ).otherwise(F.col("holes_x")).alias("holes_x"),
        F.when(
            F.col("ccw"), F.transform("holes_y", lambda a: F.reverse(a))
        ).otherwise(F.col("holes_y")).alias("holes_y"),
    )
    return fixed, errors
