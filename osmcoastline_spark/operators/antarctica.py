"""G12 — Antarctica ring closure.

Reference: src/coastline_ring_collection.cpp:334-349 (detection window) +
src/coastline_ring.cpp:100-121 (synthesized walk down the antimeridian,
along the map's southern edge, and back up). At most one ring matches; the
closure points are appended via a tiny targeted transform.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmcoastline_spark import geom


def close_antarctica_ring(open_rings: DataFrame, epsg: int) -> tuple[DataFrame, bool]:
    """Returns (open_rings with the Antarctica ring closed, found_flag)."""
    first_lon = F.element_at("xs", 1)
    last_lon = F.element_at("xs", -1)
    first_lat = F.element_at("ys", 1)
    last_lat = F.element_at("ys", -1)
    cond = (
        (first_lon > 179.99)
        & (last_lon < -179.99)
        & (first_lat < -77.0)
        & (first_lat > -78.0)
        & (last_lat < -77.0)
        & (last_lat > -78.0)
    )
    matches = open_rings.filter(cond)
    # min() instead of limit(1).collect(): collect-limit executes as an
    # ESCALATING sequence of jobs (1 partition, then 4, ...) — on the
    # common no-Antarctica input that is 3-4 driver-floor-priced jobs to
    # learn "empty"; the aggregate is always exactly one parallel job
    target = matches.select(F.min("ring_id")).first()[0]
    if target is None:
        return open_rings, False

    lons, lats = geom.antarctica_closure_points(epsg)

    def close(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        # itertuples over the single Antarctica ring (round-3 sweep idiom)
        for row in pdf.itertuples(index=False):
            ids_ = list(row.node_ids) + [0] * len(lons)
            xs = list(row.xs) + list(lons)
            ys = list(row.ys) + list(lats)
            # close back to the first node (reference push_back(front))
            ids_.append(ids_[0])
            xs.append(xs[0])
            ys.append(ys[0])
            out.append((row.ring_id, ids_, xs, ys, row.nways, True, row.lead))
        return pd.DataFrame(
            out, columns=["ring_id", "node_ids", "xs", "ys", "nways", "fixed", "lead"]
        )

    schema = (
        "ring_id long, node_ids array<long>, xs array<double>, ys array<double>, "
        "nways int, fixed boolean, lead long"
    )
    closed_ring = (
        open_rings.filter(F.col("ring_id") == target).groupBy("ring_id").applyInPandas(close, schema)
    )
    rest = open_rings.filter(F.col("ring_id") != target)
    return rest.unionByName(closed_ring), True
