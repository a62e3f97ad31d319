"""J9/J10 — questionable-coastline detection.

Reference: src/coastline_ring_collection.cpp:436-480. All rings are sorted
by first location; for each output polygon, `lower_bound` on the polygon's
exterior-ring start marks the FIRST ring with first_location >= start as
'outer' (note: >=, not equality — and at equal locations the tie goes to the
earliest-inserted ring, which is how a fully-duplicated ring ends up flagged
while its twin is marked outer in invalid-duplicate-segments-1). Closed,
not-outer rings with 3 < npoints < 10000 ⇒ error_lines('questionable'),
NOT reversed (add_error_line(..., false)). 4326 only.

Spark shape: the lower_bound over a global sort is a union of 'query' events
(polygon starts) and 'ring' events ordered by (x, y, kind, ring_id) with a
forward-looking window picking the next ring event. Scale: the sort is
RANGE-PARTITIONED by x-bucket — a per-bucket O(rows) running window plus a
boundary fix-up over the bucket spine (≤ 360/width rows, a constant): a
query with no ring event at-or-after it inside its own bucket takes the
first ring event of the nearest later bucket. No global single-task sort
over the (data-proportional) event list remains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from osmcoastline_spark.schemas import QUESTIONABLE_NPOINTS_CAP


def questionable_rings(
    rings: DataFrame, polygons: DataFrame, bucket_width: float = 5.0
) -> DataFrame:
    """rings: ALL assembled rings (closed and open, OSM orientation).
    polygons: output polygons (GIS orientation)."""
    ring_events = rings.select(
        F.element_at("xs", 1).alias("x"),
        F.element_at("ys", 1).alias("y"),
        F.lit(1).alias("kind"),  # ring events sort after queries at equal loc
        "ring_id",
    )
    query_events = polygons.select(
        F.element_at("shell_x", 1).alias("x"),
        F.element_at("shell_y", 1).alias("y"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("ring_id"),
    )
    bucket = F.floor((F.col("x") + F.lit(180.0)) / F.lit(bucket_width))
    events = ring_events.unionByName(query_events).withColumn("bucket", bucket)

    # Pass 1 — per-bucket lower_bound: nearest ring event at-or-after the
    # query in ascending (x, y, kind, ring_id) order, computed as a RUNNING
    # last() over the DESCENDING order (an O(n) frame; unboundedFollowing
    # would be O(n²) per partition).
    w_in = Window.partitionBy("bucket").orderBy(
        F.desc("x"), F.desc("y"), F.desc("kind"), F.desc_nulls_last("ring_id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events = events.withColumn("marked", F.last("ring_id", ignorenulls=True).over(w_in))

    # Pass 2 — boundary fix-up: per-bucket FIRST ring event (ascending),
    # then, over the bucket spine only (constant-sized), the nearest later
    # bucket's first ring event for queries whose own bucket ran dry.
    firsts = (
        ring_events.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.min(F.struct("x", "y", "ring_id")).alias("f"))
    )
    spine = events.select("bucket").distinct().join(firsts, "bucket", "left")
    w_spine = Window.orderBy(F.desc("bucket")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    nxt = spine.withColumn("nf", F.last("f", ignorenulls=True).over(w_spine)).select(
        "bucket", F.col("nf.ring_id").alias("next_ring")
    )
    # no .distinct(): the left-anti join below is an existence check, so
    # duplicate ids on the build side change nothing — dropping the
    # distinct removes one exchange (round 6)
    outer_ids = (
        events.filter(F.col("kind") == 0)
        .join(F.broadcast(nxt), "bucket", "left")
        .select(F.coalesce("marked", "next_ring").alias("ring_id"))
        .dropna()
    )

    closed = F.element_at("node_ids", 1) == F.element_at("node_ids", -1)
    return (
        rings.join(outer_ids, "ring_id", "left_anti")
        .filter(closed)
        .withColumn("npoints", F.size("node_ids"))
        .filter((F.col("npoints") > 3) & (F.col("npoints") < QUESTIONABLE_NPOINTS_CAP))
        .select(
            F.col("ring_id").alias("osm_id"),
            F.lit("questionable").alias("error"),
            "xs",
            "ys",
        )
    )
