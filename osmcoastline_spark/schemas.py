"""Fixed schemas + error vocabulary.

The reference hard-codes its output catalog at table-creation time
(/root/reference/src/output_database.cpp:41-89); we mirror it as explicit
StructType constants. Geometry travels as coordinate arrays (pure Arrow
types — no native geometry dependency); WKT is derived at the sink.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------- inputs

# Graft input per BASELINE.json input_hint: one image+caption row per node.
IMAGES_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("fmt", StringType(), True),
        StructField("caption", StringType(), True),
        StructField("phash", LongType(), True),
    ]
)

NODES_SCHEMA = StructType(
    [
        StructField("node_id", LongType(), False),
        StructField("lon", DoubleType(), False),
        StructField("lat", DoubleType(), False),
        StructField("tags", MapType(StringType(), StringType()), True),
    ]
)

WAYS_SCHEMA = StructType(
    [
        StructField("way_id", LongType(), False),
        StructField("node_ids", ArrayType(LongType()), False),
        StructField("tags", MapType(StringType(), StringType()), True),
    ]
)

# ------------------------------------------------------------ pipeline IR

# A ring under assembly / assembled: ordered node ids + parallel coordinate
# arrays (reference: CoastlineRing, src/coastline_ring.hpp:65-97).
RINGS_SCHEMA = StructType(
    [
        StructField("ring_id", LongType(), False),  # min way_id in ring
        StructField("node_ids", ArrayType(LongType()), False),
        StructField("xs", ArrayType(DoubleType()), True),
        StructField("ys", ArrayType(DoubleType()), True),
        StructField("nways", IntegerType(), False),
        StructField("fixed", BooleanType(), False),
    ]
)

# Normalized undirected segment (reference: osmium::UndirectedSegment,
# normalized so (x1,y1) <= (x2,y2) lexicographically).
SEGMENTS_SCHEMA = StructType(
    [
        StructField("x1", DoubleType(), False),
        StructField("y1", DoubleType(), False),
        StructField("x2", DoubleType(), False),
        StructField("y2", DoubleType(), False),
    ]
)

# Polygon with optional holes as coordinate arrays; env_* for cheap bbox
# prefilters (reference benchmarked the same tactic,
# src/coastline_polygons.cpp:419-429).
POLYGONS_SCHEMA = StructType(
    [
        StructField("poly_id", LongType(), False),
        StructField("shell_x", ArrayType(DoubleType()), False),
        StructField("shell_y", ArrayType(DoubleType()), False),
        StructField("holes_x", ArrayType(ArrayType(DoubleType())), True),
        StructField("holes_y", ArrayType(ArrayType(DoubleType())), True),
        StructField("npoints", IntegerType(), False),
        StructField("env_minx", DoubleType(), False),
        StructField("env_miny", DoubleType(), False),
        StructField("env_maxx", DoubleType(), False),
        StructField("env_maxy", DoubleType(), False),
    ]
)

# ------------------------------------------------------------- outputs

ERROR_POINTS_SCHEMA = StructType(
    [
        StructField("osm_id", LongType(), False),
        StructField("error", StringType(), False),
        StructField("x", DoubleType(), False),
        StructField("y", DoubleType(), False),
    ]
)

ERROR_LINES_SCHEMA = StructType(
    [
        StructField("osm_id", LongType(), False),
        StructField("error", StringType(), False),
        StructField("xs", ArrayType(DoubleType()), False),
        StructField("ys", ArrayType(DoubleType()), False),
    ]
)

# mirrors the actual rings output table built in plans/pipeline.py
# (osm_id/nways/npoints/fixed/land/valid + the coordinate arrays — the WKT
# rendering is a sink concern, not a table column)
RINGS_OUT_SCHEMA = StructType(
    [
        StructField("osm_id", LongType(), False),
        StructField("nways", IntegerType(), False),
        StructField("npoints", IntegerType(), False),
        StructField("fixed", IntegerType(), False),
        StructField("land", IntegerType(), False),
        StructField("valid", IntegerType(), False),
        StructField("node_ids", ArrayType(LongType()), False),
        StructField("xs", ArrayType(DoubleType()), False),
        StructField("ys", ArrayType(DoubleType()), False),
    ]
)

# Closed error vocabulary (exact strings; reference call sites in SURVEY §1.2).
ERRORS = {
    "tagged_node",
    "intersection",
    "overlap",
    "not_closed",
    "end_point",
    "not_a_ring",
    "single_point_in_ring",
    "fixed_end_point",
    "added_line",
    "double_node",
    "questionable",
    "direction",
    "invalid",
    "self_intersection",
}

# SRS extents (reference: src/srs.cpp:60-76).
EXTENT_4326 = (-180.0, -90.0, 180.0, 90.0)
MERC = 20037508.342789244
EXTENT_3857 = (-MERC, -MERC, MERC, MERC)

# Defaults (reference: src/options.hpp:49,61; src/options.cpp:216-222).
DEFAULT_CLOSE_DISTANCE = 1.0  # squared degrees
DEFAULT_MAX_POINTS_IN_POLYGON = 1000
DEFAULT_BBOX_OVERLAP_4326 = 0.0001
DEFAULT_BBOX_OVERLAP_3857 = 10.0
MAX_WARNINGS = 500  # src/osmcoastline.cpp:70
QUESTIONABLE_NPOINTS_CAP = 10000  # src/coastline_ring_collection.cpp:437
