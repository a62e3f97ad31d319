"""G14/F9 — polygon simplification + area filter (the
simplify_and_split_* SQL workflow, reference
simplify_and_split_postgis/simplify_land_polygons.sql:19-21).

Douglas–Peucker per ring, vectorized across rings in Arrow batches; area
filter as a pure column expression (shoelace — stays in codegen).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_min_area(polygons: DataFrame, min_area: float) -> DataFrame:
    """F9: ST_Area(geom) > min_area (shell area minus holes) — the
    reference's `WHERE ST_Area(geom) > :min_area`
    (simplify_land_polygons.sql:19-21), where ST_Area of a polygon with
    interior rings is the NET area. A shell-only area would keep a
    polygon whose holes eat almost all of it. Shares polygonize's
    shoelace expression (one definition repo-wide)."""
    from osmcoastline_spark.operators.polygonize import _area2_expr

    shell = F.abs(_area2_expr("shell_x", "shell_y"))
    holes = F.aggregate(
        F.zip_with(
            "holes_x", "holes_y", lambda hx, hy: F.abs(_area2_expr(hx, hy))
        ),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    net = (shell - F.coalesce(holes, F.lit(0.0))) / 2.0
    return polygons.filter(net > min_area)


def simplify_polygons(polygons: DataFrame, tolerance: float) -> DataFrame:
    """G14: Douglas–Peucker on shell + holes. Rings that degenerate are
    dropped, like ST_SimplifyPreserveTopology's collapse handling; a
    degenerate shell drops the whole polygon. "Degenerate" is
    closure-aware: a CLOSED ring (first == last, the pipeline's
    polygonize convention) needs 4 points for 3 distinct vertices — a
    flat <3 check let a collapsed [a, b, a] sliver through as a
    zero-area shell.

    Uses the shared util.aslist for ragged arrays.
    """
    from osmcoastline_spark.util import aslist as _aslist

    def _degenerate(xs, ys) -> bool:
        closed = xs[0] == xs[-1] and ys[0] == ys[-1]
        return len(xs) < (4 if closed else 3)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from osmcoastline_spark import geom

        for pdf in it:
            rows = []
            # to_dict('records'): dict rows without iterrows's per-row
            # Series construction (round-3 ADVICE)
            for row in pdf.to_dict("records"):
                sx, sy = geom.douglas_peucker(
                    np.asarray(row["shell_x"], dtype=np.float64),
                    np.asarray(row["shell_y"], dtype=np.float64),
                    tolerance,
                )
                if _degenerate(sx, sy):
                    continue
                hx_out, hy_out = [], []
                for hx, hy in zip(_aslist(row["holes_x"]), _aslist(row["holes_y"])):
                    shx, shy = geom.douglas_peucker(
                        np.asarray(hx, dtype=np.float64), np.asarray(hy, dtype=np.float64), tolerance
                    )
                    if not _degenerate(shx, shy):
                        hx_out.append(shx.tolist())
                        hy_out.append(shy.tolist())
                d = dict(row)
                d["shell_x"] = sx.tolist()
                d["shell_y"] = sy.tolist()
                d["holes_x"] = hx_out
                d["holes_y"] = hy_out
                d["npoints"] = len(sx)
                rows.append(d)
            yield pd.DataFrame(rows, columns=list(pdf.columns))

    return polygons.mapInPandas(run, polygons.schema)
