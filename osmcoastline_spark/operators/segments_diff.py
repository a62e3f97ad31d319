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


def _fmt_coord(v: float) -> str:
    """libosmium location coordinate formatting (fixed-point 7 decimals,
    trailing zeros stripped) as used by UndirectedSegment's operator<<."""
    i = int(round(v * 1e7))
    sign = "-" if i < 0 else ""
    whole, frac = divmod(abs(i), 10**7)
    if frac == 0:
        return f"{sign}{whole}"
    return f"{sign}{whole}.{str(frac).zfill(7).rstrip('0')}"


def dump_changes(
    removed: DataFrame, added: DataFrame, max_driver_segments: int = 1_000_000
) -> str:
    """The --dump text output (reference src/osmcoastline_segments.cpp:
    183-192): 'Removed:'/'Added:' headers, one '  (x1,y1)->(x2,y2)' line
    per segment in canonical (sorted) segment order — std::set_difference
    emits sorted, so the dump is deterministic; we sort explicitly.

    Driver-side by design: the reference streams the whole diff to stdout.
    Like every other driver collect in this engine, it loud-fails past
    `max_driver_segments` rather than OOMing the driver on a pathological
    diff (same idiom as close.py's max_driver_endpoints).
    """
    out = []
    for title, df in (("Removed:", removed), ("Added:", added)):
        out.append(title)
        rows = (
            df.select(*SEG_COLS)
            .orderBy(*SEG_COLS)
            .limit(max_driver_segments + 1)
            .collect()
        )
        if len(rows) > max_driver_segments:
            raise RuntimeError(
                f"segment diff exceeds max_driver_segments={max_driver_segments}; "
                "write the diff with write_segments/changes_layer instead of --dump"
            )
        for r in rows:
            out.append(
                f"  ({_fmt_coord(r.x1)},{_fmt_coord(r.y1)})"
                f"->({_fmt_coord(r.x2)},{_fmt_coord(r.y2)})"
            )
    return "\n".join(out) + "\n"


def changes_layer(removed: DataFrame, added: DataFrame) -> DataFrame:
    """The OGR 'changes' layer analog (reference src/osmcoastline_segments
    .cpp:97-113): one 2-point LINESTRING per changed segment with
    change=0 (removed) / change=1 (added). Geometry rides as xs/ys arrays
    like every other line table in this engine (WKB-free convention)."""
    from pyspark.sql import functions as F

    def side(df: DataFrame, change: int) -> DataFrame:
        return df.select(
            F.lit(change).alias("change"),
            F.array("x1", "x2").alias("xs"),
            F.array("y1", "y2").alias("ys"),
        )

    return side(removed, 0).unionByName(side(added, 1))
