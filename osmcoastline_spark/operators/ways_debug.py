"""S7/A4 — the osmcoastline_ways diagnostic program
(reference src/osmcoastline_ways.cpp:109-162): per-way LineString rows with
name/source tags + total haversine coastline length."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmcoastline_spark.operators.locations import ways_with_locations


def ways_lines(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """One row per way: ordered coords + name/source/bogus fields."""
    loc = ways_with_locations(ways, nodes)
    tagged = ways.select(
        "way_id",
        F.col("tags").getItem("name").alias("name"),
        F.col("tags").getItem("source").alias("source"),
        (F.col("tags").getItem("coastline") == "bogus").alias("bogus"),
    )
    return loc.join(tagged, "way_id", "left").select(
        "way_id", "xs", "ys", "name", "source", F.coalesce("bogus", F.lit(False)).alias("bogus")
    )


def total_length_m(ways_loc: DataFrame) -> float:
    """A4: Σ haversine over consecutive way points (meters)."""
    leg = lambda i: (  # noqa: E731
        F.lit(2.0 * 6371000.0)
        * F.asin(
            F.sqrt(
                F.pow(
                    F.sin(
                        F.radians(
                            F.element_at("ys", i.cast("int"))
                            - F.element_at("ys", (i - 1).cast("int"))
                        )
                        / 2
                    ),
                    2,
                )
                + F.cos(F.radians(F.element_at("ys", (i - 1).cast("int"))))
                * F.cos(F.radians(F.element_at("ys", i.cast("int"))))
                * F.pow(
                    F.sin(
                        F.radians(
                            F.element_at("xs", i.cast("int"))
                            - F.element_at("xs", (i - 1).cast("int"))
                        )
                        / 2
                    ),
                    2,
                )
            )
        )
    )
    per_way = F.when(F.size("xs") < 2, F.lit(0.0)).otherwise(
        F.aggregate(
            F.sequence(F.lit(2), F.greatest(F.size("xs"), F.lit(2))),
            F.lit(0.0),
            lambda acc, i: acc + leg(i),
        )
    )
    row = ways_loc.select(F.sum(per_way).alias("total")).collect()[0]
    return float(row.total or 0.0)
