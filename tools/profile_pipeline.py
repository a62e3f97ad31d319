#!/usr/bin/env python
"""Per-stage pipeline wall-clock profile (mirrors run_pipeline's action
boundaries). Usage: python tools/profile_pipeline.py [islands] [cpus]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    islands = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from osmcoastline_spark.operators.close import close_rings
    from osmcoastline_spark.operators.filter import coastline_ways
    from osmcoastline_spark.operators.intersections import (
        duplicate_segments,
        intersection_pairs,
        ring_segments,
    )
    from osmcoastline_spark.operators.locations import ways_with_locations
    from osmcoastline_spark.operators.polygonize import fix_direction, polygonize
    from osmcoastline_spark.operators.questionable import questionable_rings
    from osmcoastline_spark.operators.repair import buffer0_triage
    from osmcoastline_spark.operators.rings import assemble_rings, route_rings
    from osmcoastline_spark.operators.split import split_polygons
    from osmcoastline_spark.operators.water import drop_antimeridian_slivers, water_polygons
    from osmcoastline_spark.session import get_spark
    from osmcoastline_spark.synth import synth_nodes_ways

    spark = get_spark("profile", master=f"local[{cpus}]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    nodes, ways = synth_nodes_ways(spark, islands, seed=42)
    nodes = nodes.localCheckpoint(eager=True)
    ways = ways.localCheckpoint(eager=True)

    T = time.time()
    last = [T]

    def t(label: str) -> None:
        now = time.time()
        print(f"{label:26s} {now - last[0]:7.2f}s", flush=True)
        last[0] = now

    wl = ways_with_locations(coastline_ways(ways), nodes)
    closed, open_ = assemble_rings(wl)
    t("assemble_rings")
    segs = ring_segments(closed.unionByName(open_)).localCheckpoint(eager=True)
    t("segments ckpt")
    ip = intersection_pairs(segs, 0.5).localCheckpoint(eager=True)
    t("ipairs ckpt")
    duplicate_segments(segs).count()
    t("dup groupBy")
    dup_keys = segs.groupBy("x1", "y1", "x2", "y2").count().filter("count>1").drop("count")
    open_segs = ring_segments(open_)
    per_ring = open_segs.groupBy("ring_id").agg(F.count("*").alias("nt"))
    dpr = (
        open_segs.join(dup_keys, ["x1", "y1", "x2", "y2"], "left_semi")
        .groupBy("ring_id")
        .agg(F.count("*").alias("nd"))
    )
    orphan_ids = (
        per_ring.join(dpr, "ring_id").filter("nd=nt").select("ring_id")
        .localCheckpoint(eager=True)
    )
    t("orphan ids ckpt")
    active = open_.join(orphan_ids, "ring_id", "left_anti")
    merged, cres = close_rings(active, 1.0)
    t("close plan (driver)")
    merged = merged.unionByName(
        open_.join(orphan_ids, "ring_id", "left_semi")
    ).localCheckpoint(eager=True)
    t("close apply ckpt")
    nc = merged.filter(F.element_at("node_ids", 1) == F.element_at("node_ids", -1))
    closed2 = closed.unionByName(nc.select(*closed.columns))
    closed2.count()
    t("rings count")
    routed = route_rings(closed2)
    sci = ip.filter("a_ring=b_ring").select(F.col("a_ring").alias("ring_id")).distinct()
    tri = buffer0_triage(routed["polygonizable"], 0.5, crossing_ids=sci).localCheckpoint(
        eager=True
    )
    t("triage ckpt")
    pres = polygonize(tri)
    t("polygonize")
    polys, _ = fix_direction(pres.polygons)
    polys = polys.localCheckpoint(eager=True)
    t("fixdir ckpt")
    questionable_rings(closed2.unionByName(merged.filter(
        F.element_at("node_ids", 1) != F.element_at("node_ids", -1))), polys).count()
    t("questionable")
    sp = split_polygons(polys, 500, 0.0001, 4326)
    sp.count()
    t("split loop+count")
    drop_antimeridian_slivers(water_polygons(sp, 4.0)).count()
    t("water")
    print(f"{'TOTAL':26s} {time.time() - T:7.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
