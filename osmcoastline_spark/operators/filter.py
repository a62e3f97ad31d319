"""Tag filters + planet filter (reference F1-F3, J1, S3).

Reference behavior:
* keep ways tagged natural=coastline            — src/osmcoastline.cpp:251
* drop ways additionally tagged coastline=bogus — src/osmcoastline.cpp:253
* nodes themselves tagged natural=coastline     → error_points(tagged_node)
                                                — src/osmcoastline.cpp:283-289
* osmcoastline_filter keeps nodes referenced by kept ways or tagged
  (sorted-merge semi-join) — src/osmcoastline_filter.cpp:137-180

All expressed as plain Catalyst filters/joins: predicate pushdown and the
semi-join strategy (broadcast vs SMJ) are the optimizer's choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coastline_way_predicate():
    return (F.col("tags").getItem("natural") == "coastline") & (
        F.col("tags").getItem("coastline").isNull()
        | (F.col("tags").getItem("coastline") != "bogus")
    )


def coastline_ways(ways: DataFrame) -> DataFrame:
    """F1 + F2."""
    return ways.filter(coastline_way_predicate())


def tagged_node_errors(nodes: DataFrame) -> DataFrame:
    """F3 → error_points(tagged_node)."""
    return nodes.filter(F.col("tags").getItem("natural") == "coastline").select(
        F.col("node_id").alias("osm_id"),
        F.lit("tagged_node").alias("error"),
        F.col("lon").alias("x"),
        F.col("lat").alias("y"),
    )


def filter_planet(nodes: DataFrame, ways: DataFrame) -> tuple[DataFrame, DataFrame]:
    """S3/J1: the osmcoastline_filter program as a 4-operator DataFrame job.

    Returns (kept_nodes, kept_ways). The node-id set of kept ways is usually
    ≪ nodes (<1% of planet per reference README.md:283-286), so Catalyst's
    AQE will typically broadcast it.

    The FILTER program keeps EVERY natural=coastline way including
    coastline=bogus ones (osmcoastline_filter.cpp:143 has no bogus
    check) — bogus exclusion happens later, in the main program's way
    intake (osmcoastline.cpp:253, our coastline_ways). Filtering bogus
    here would strip those ways and their exclusive nodes from the
    extract, so a downstream osmcoastline run on the filtered file
    could no longer reproduce the full-planet result.
    """
    kept_ways = ways.filter(F.col("tags").getItem("natural") == "coastline")
    way_node_ids = kept_ways.select(F.explode("node_ids").alias("node_id")).distinct()
    tagged = nodes.filter(F.col("tags").getItem("natural") == "coastline")
    kept_nodes = (
        nodes.join(way_node_ids, "node_id", "left_semi")
        .unionByName(tagged)
        # map-typed tags can't be distinct()'d; node_id is the row identity
        .dropDuplicates(["node_id"])
    )
    return kept_nodes, kept_ways
