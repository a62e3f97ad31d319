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
