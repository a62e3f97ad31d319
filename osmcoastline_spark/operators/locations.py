"""Location scatter-join (reference J2) + missing-location check (J3).

The reference fills node locations through a pointer multimap
(src/osmcoastline.cpp:276-297, src/coastline_ring.cpp:36-40). The Spark
equivalent is the classic explode→join→re-collect:

    posexplode(node_ids) ⋈ nodes on node_id
    → groupBy(way_id).agg(sort_array(collect_list(struct(pos, …))))

Per the north rule the join is an explicit hash shuffle on node_id; hot node
ids (shared ring endpoints) are bounded (≤2 ways share a node in valid
coastline data) so no salting is needed here — skew lives in *cells*, not
node ids, and is handled in the cell-binned joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ways_with_locations(
    ways: DataFrame, nodes: DataFrame, count_missing: bool = False
) -> DataFrame:
    """Attach ordered coordinate arrays to each way.

    Output: way_id, node_ids, xs, ys (+ `nmiss` when `count_missing`).

    With `count_missing` the node join runs LEFT and each way carries its
    missing-location count — the J3 check then reads a tiny aggregate off
    the materialized result instead of paying a second explode+join pass
    (refs with missing locations are excluded from the arrays, matching
    the inner-join behavior).
    """
    refs = ways.select("way_id", F.posexplode("node_ids").alias("pos", "node_id"))
    if count_missing:
        joined = refs.join(nodes.select("node_id", "lon", "lat"), "node_id", "left")
        return (
            joined.groupBy("way_id")
            .agg(
                # collect_list skips nulls ⇒ refs with missing locations
                # stay out of the arrays, like the inner join
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("lon").isNotNull(),
                            F.struct("pos", "node_id", "lon", "lat"),
                        )
                    )
                ).alias("pts"),
                F.sum(F.col("lon").isNull().cast("int")).alias("nmiss"),
            )
            .select(
                "way_id",
                F.col("pts.node_id").alias("node_ids"),
                F.col("pts.lon").alias("xs"),
                F.col("pts.lat").alias("ys"),
                "nmiss",
            )
        )
    joined = refs.join(nodes.select("node_id", "lon", "lat"), "node_id", "inner")
    collected = (
        joined.groupBy("way_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("pos", "node_id", "lon", "lat"))).alias("pts")
        )
        .select(
            "way_id",
            F.col("pts.node_id").alias("node_ids"),
            F.col("pts.lon").alias("xs"),
            F.col("pts.lat").alias("ys"),
        )
    )
    return collected


def missing_location_count(ways: DataFrame, nodes: DataFrame) -> int:
    """J3: way-node refs with no node row. Any ⇒ caller aborts
    (reference return_code_error, src/osmcoastline.cpp:304-310)."""
    refs = ways.select(F.explode("node_ids").alias("node_id"))
    return refs.join(nodes.select("node_id"), "node_id", "left_anti").count()
