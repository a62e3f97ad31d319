"""S4/S5/J13 — the osmcoastline_segments change-detection workflow.

Reference: src/osmcoastline_segments.cpp:118-204 mmaps two sorted segment
dumps and runs std::set_difference both ways. Spark: two parquet segment
tables + exceptAll in both directions; equality = both diffs empty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SEG_COLS = ["x1", "y1", "x2", "y2"]


def write_segments(segments: DataFrame, path: str) -> None:
    """S4: canonical segment table — sorted within files so that diffs and
    scans are locality-friendly (parquet stand-in for Iceberg sort order)."""
    segments.select(*SEG_COLS).sortWithinPartitions(*SEG_COLS).write.mode(
        "overwrite"
    ).parquet(path)


def read_segments(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).select(*SEG_COLS)


def diff_segments(old: DataFrame, new: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(removed, added) — multiset semantics like std::set_difference."""
    removed = old.exceptAll(new)
    added = new.exceptAll(old)
    return removed, added


def segments_equal(old: DataFrame, new: DataFrame) -> bool:
    removed, added = diff_segments(old, new)
    return removed.isEmpty() and added.isEmpty()
