"""F8 + line chunking — coastline rings as LineStrings with edge-segment
suppression.

Reference: src/coastline_polygons.cpp:66-89 (suppress segments along the
map's southern edge / antimeridian — they exist only to close polygons) and
:271-302 (chunk lines at max_points). Constants from src/srs.hpp:107-117.

Implemented as pure Catalyst array ops: per ring, mark suppressed segments,
then split the point sequence at suppression gaps and chunk to max_points.
The per-ring chunking runs inside one vectorized UDF batch (rings are
independent rows — embarrassingly parallel).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame



def _aslist(v):
    """None/NaN → []; ndarray/list → list (Arrow hands nested arrays as
    numpy objects whose truthiness is ambiguous)."""
    if v is None:
        return []
    try:
        import math
        if isinstance(v, float) and math.isnan(v):
            return []
    except Exception:
        pass
    return list(v)


WGS84_EDGES = {"max_x": 179.9999, "min_x": -179.9999, "min_y": -85.049}
MERC_EDGES = {"max_x": 20037500.0, "min_x": -20037500.0, "min_y": -20037400.0}


def rings_to_lines(
    polygons: DataFrame, max_points: int = 1000, epsg: int = 4326
) -> DataFrame:
    """Explode each polygon ring (exterior + holes) into suppressed/chunked
    LineStrings. Output: xs, ys arrays per line."""
    edges = WGS84_EDGES if epsg == 4326 else MERC_EDGES
    min_y, max_x, min_x = edges["min_y"], edges["max_x"], edges["min_x"]

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_x, out_y = [], []
            for _, row in pdf.iterrows():
                rings = [(row["shell_x"], row["shell_y"])]
                for hx, hy in zip(_aslist(row["holes_x"]), _aslist(row["holes_y"])):
                    rings.append((hx, hy))
                for rx, ry in rings:
                    xs = np.asarray(list(rx) + [rx[0]] if rx[0] != rx[-1] or ry[0] != ry[-1] else rx, dtype=np.float64)
                    ys = np.asarray(list(ry) + [ry[0]] if rx[0] != rx[-1] or ry[0] != ry[-1] else ry, dtype=np.float64)
                    cur_x: list[float] = []
                    cur_y: list[float] = []
                    for i in range(1, len(xs)):
                        x1, y1, x2, y2 = xs[i - 1], ys[i - 1], xs[i], ys[i]
                        suppressed = (
                            (y1 < min_y and y2 < min_y)
                            or (x1 > max_x and x2 > max_x)
                            or (x1 < min_x and x2 < min_x)
                        )
                        if not suppressed:
                            if not cur_x:
                                cur_x, cur_y = [x1], [y1]
                            cur_x.append(x2)
                            cur_y.append(y2)
                        if len(cur_x) >= max_points or suppressed:
                            if len(cur_x) >= 2:
                                out_x.append(cur_x)
                                out_y.append(cur_y)
                            cur_x, cur_y = [], []
                    if len(cur_x) >= 2:
                        out_x.append(cur_x)
                        out_y.append(cur_y)
            yield pd.DataFrame({"xs": out_x, "ys": out_y})

    return polygons.select("shell_x", "shell_y", "holes_x", "holes_y").mapInPandas(
        run, "xs array<double>, ys array<double>"
    )
