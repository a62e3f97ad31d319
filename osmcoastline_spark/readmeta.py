"""`osmcoastline_readmeta` parity (reference osmcoastline_readmeta shell
script): human-readable report over a finished run's output directory.

Reads the one-row `meta`/`options` parquet tables plus the error tables
directly with pyarrow (no Spark session — this is a metadata peek, not a
job), and takes output counts from the stage _MANIFEST.json files the
CheckpointSink committed (no data scan at all for counts).

Run as `python -m osmcoastline_spark.readmeta OUTDIR` or
`python -m osmcoastline_spark.cli readmeta OUTDIR`.
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter


def _read_one_row(outdir: str, table: str) -> dict | None:
    path = os.path.join(outdir, table)
    if not os.path.isdir(path):
        return None
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    if t.num_rows == 0:
        return None
    return {c: t.column(c)[0].as_py() for c in t.column_names}


def _error_counts(outdir: str, table: str) -> Counter:
    path = os.path.join(outdir, table)
    if not os.path.isdir(path):
        return Counter()
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["error"])
    return Counter(t.column("error").to_pylist())


def _manifest_rows(outdir: str, table: str) -> int | None:
    mpath = os.path.join(outdir, table, "_MANIFEST.json")
    if not os.path.exists(mpath):
        return None
    with open(mpath) as f:
        return json.load(f).get("rows")


def readmeta_report(outdir: str) -> str:
    """The reference report, section for section (same labels/order)."""
    lines: list[str] = []
    opts = _read_one_row(outdir, "options")
    meta = _read_one_row(outdir, "meta")

    lines.append("Options used to create this data:")
    lines.append("")
    if opts:
        lines.append(f"  Overlap (--bbox-overlap/-b): {opts['overlap']}")
        lines.append(
            "  Close gaps in coastline smaller than (--close-distance/-c): "
            f"{opts['close_distance']}"
        )
        lines.append(
            f"  Max points in polygons (--max-points/-m): {opts['max_points_in_polygons']}"
        )
        lines.append(
            "  Split large polygons: "
            + ("yes" if opts["split_large_polygons"] else "no")
        )
    else:
        lines.append("  (no options table)")

    lines.append("")
    lines.append("Metadata:")
    lines.append("")
    if meta:
        lines.append(f"  Database created at: {meta['timestamp']}")
        # half-away-from-zero, matching SQLite's round() in the reference
        # report (Python's round() is banker's: round(2.5) == 2, but the
        # reference prints 3 for a 150-second run)
        lines.append(
            f"  Runtime (minutes): {int(meta['runtime'] / 60 + 0.5)}"
        )
        lines.append(f"  Memory usage (MB): {meta['memory_usage']}")
        lines.append(f"  Ways tagged natural=coastline: {meta['num_ways']}")
        lines.append(
            "  Number of nodes where coastline is not closed (before fixing): "
            f"{meta['num_unconnected_nodes']}"
        )
        lines.append(f"  Coastline rings: {meta['num_rings']}")
        lines.append(
            "  Coastline rings created from a single way: "
            f"{meta['num_rings_from_single_way']}"
        )
        lines.append(
            "  Coastline rings created from more then one way: "
            f"{meta['num_rings'] - meta['num_rings_from_single_way']}"
        )
        lines.append(f"  Number of rings fixed (closed): {meta['num_rings_fixed']}")
        lines.append(
            f"  Number of rings turned around: {meta['num_rings_turned_around']}"
        )
        lines.append(
            "  Number of land polygons before split: "
            f"{meta['num_land_polygons_before_split']}"
        )
        after = meta["num_land_polygons_after_split"]
        lines.append(
            "  Number of land polygons after split: "
            + ("NOT SPLIT" if after == 0 else str(after))
        )
    else:
        lines.append("  (no meta table)")

    lines.append("")
    lines.append("Errors/warnings (Points):")
    lines.append("")
    for err, n in sorted(_error_counts(outdir, "error_points").items()):
        lines.append(f"  {n:<3} {err}")
    lines.append("")
    lines.append("Errors/warnings (LineStrings):")
    lines.append("")
    for err, n in sorted(_error_counts(outdir, "error_lines").items()):
        lines.append(f"  {n:<3} {err}")

    lines.append("")
    lines.append("Output:")
    lines.append("")
    for table in ("land_polygons", "water_polygons", "lines", "rings"):
        n = _manifest_rows(outdir, table)
        if n is not None:
            lines.append(f"  {n:<3} {table}")
    lines.append("")
    return "\n".join(lines)


def main(argv: list[str] | None = None) -> int:
    args = sys.argv[1:] if argv is None else argv
    if args and args[0] in ("-h", "--help"):
        print("Usage: python -m osmcoastline_spark.readmeta [OUTDIR]")
        return 0
    outdir = args[0] if args else "out"
    if not os.path.isdir(outdir):
        print(f"Can't open '{outdir}'")
        return 1
    print(readmeta_report(outdir))
    return 0


if __name__ == "__main__":
    sys.exit(main())
