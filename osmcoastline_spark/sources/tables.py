"""Table sources: the driver testdata star schema + nodes/ways inputs.

Production target is Iceberg (`spark.read.format("iceberg")` /
`df.writeTo(...)`); this container has no Iceberg runtime jar, so readers
accept plain parquet directories with the identical DataFrame surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TPCH_TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


def nodes_from_images(images: DataFrame) -> DataFrame:
    """BASELINE.json input_hint entry point: the engine's native input is
    an Iceberg table of image+caption rows (image_id, bytes, w, h, fmt,
    caption, phash). This derives the pipeline's `nodes` table from it
    with pure Catalyst expressions — node_id parsed from the image_id
    (`img-<16 hex>`), (lon, lat) deterministically from the phash — so a
    coastline job can run straight off the image table with zero Python.

    Inverse of synth.synth_images_for_nodes for the id; the coordinates
    are the canonical phash-derived placement from FIXTURES.md.
    """
    from pyspark.sql import functions as F

    return images.select(
        F.conv(F.substring("image_id", 5, 16), 16, 10).cast("long").alias("node_id"),
        (F.pmod(F.col("phash"), F.lit(3600000)) / 10000.0 - 180.0).alias("lon"),
        (F.pmod(F.shiftrightunsigned(F.col("phash"), 22), F.lit(1700000)) / 10000.0 - 85.0).alias("lat"),
        F.map_from_arrays(
            F.array(F.lit("source")), F.array(F.lit("image_table"))
        ).alias("tags"),
    )


def ways_refs(ways: DataFrame) -> DataFrame:
    """Exploded way→node references (way_id, pos, node_id) — the left side
    of the J2 location join in storable form."""
    from pyspark.sql import functions as F

    return ways.select("way_id", F.posexplode("node_ids").alias("pos", "node_id"))


def write_bucketed(
    df: DataFrame, table: str, path: str, buckets: int = 64, key: str = "node_id"
) -> None:
    """Persist `df` bucketed+sorted by `key` as an external table at `path`.

    This is the 100 TB lever for the J2 location join (reference
    src/osmcoastline.cpp:276-297 joins every way-node ref against the node
    store on every run): with BOTH the node table and the exploded ref
    table stored bucket-hashed on node_id, the equi-join plans with ZERO
    Exchange — the planet-sized node side never moves again, run after
    run. Local stand-in is DataFrameWriter.bucketBy (Hive-style bucketed
    parquet); the documented production path is the Iceberg partition
    transform `bucket(N, node_id)` with storage-partitioned joins.

    The pre-write repartition puts each bucket's rows in exactly one task
    (repartition hash == bucket hash), yielding ONE file per bucket — the
    layout Spark requires to also use the sortBy order and skip the
    join-side Sort.
    """
    from pyspark.sql import functions as F

    (
        df.repartition(buckets, F.col(key))
        .write.format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def register_bucketed(
    spark: SparkSession,
    table: str,
    path: str,
    schema: str,
    buckets: int = 64,
    key: str = "node_id",
) -> DataFrame:
    """Re-attach a `write_bucketed` table in a fresh session (the in-memory
    catalog does not persist across JVMs; Iceberg's catalog would).
    `schema` is the DDL column list, e.g. 'node_id long, lon double, ...'."""
    esc_path = path.replace("\\", "\\\\").replace("'", "''")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} ({schema}) USING parquet "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {buckets} BUCKETS "
        f"LOCATION '{esc_path}'"
    )
    return spark.table(table)
