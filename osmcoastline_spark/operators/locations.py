"""Location scatter-join (reference J2) + missing-location check (J3).

The reference fills node locations through a pointer multimap
(src/osmcoastline.cpp:276-297, src/coastline_ring.cpp:36-40). The Spark
equivalent is explode → equi-join → re-collect. Per the north rule the
join is an explicit hash shuffle on node_id; hot node ids (shared ring
endpoints) are bounded (≤2 ways share a node in valid coastline data) so
no salting is needed here — skew lives in *cells*, not node ids, and is
handled in the cell-binned joins.

Re-collect kernel (round-3 rewrite): the round-1/2 shape was
groupBy(way_id).agg(sort_array(collect_list(struct(pos,node_id,lon,lat))))
— measured at 0.40 scaling efficiency 2→8 cores (BENCH/BASELINE.md §2):
every row materializes an UnsafeRow struct inside the aggregation buffer
and the sort_array copies the whole struct array again, all through one
allocator. The replacement keeps every column PRIMITIVE end-to-end:

    repartition(way_id)                      -- one hash shuffle, same as
    sortWithinPartitions(way_id, pos)        -- before (groupBy shuffled too)
    mapInPandas(regroup)                     -- zero-copy Arrow batches,
                                             -- np.split on group bounds

The shuffle moves flat (long, int, long, double, double) rows — ~40 B/row
vs the struct-array aggregation's per-group buffers — and the regroup is
O(rows) numpy slicing with no per-row Python. Batches inside a partition
arrive in sorted order, so a way split across Arrow batches is carried
over to the next batch (groups are contiguous after the sort).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "way_id long, node_ids array<long>, xs array<double>, ys array<double>"
)


def _build_frame(pdf: pd.DataFrame, count_missing: bool) -> pd.DataFrame:
    """Regroup one contiguous run of complete ways into array rows."""
    wid = pdf["way_id"].to_numpy()
    bounds = np.nonzero(np.diff(wid))[0] + 1
    node = pdf["node_id"].to_numpy()
    lon = pdf["lon"].to_numpy(dtype=np.float64)
    lat = pdf["lat"].to_numpy(dtype=np.float64)
    way_ids = wid[np.concatenate([[0], bounds])]
    node_groups = np.split(node, bounds)
    lon_groups = np.split(lon, bounds)
    lat_groups = np.split(lat, bounds)
    out = {
        "way_id": way_ids,
        "node_ids": node_groups,
        "xs": lon_groups,
        "ys": lat_groups,
    }
    if count_missing:
        # left-join misses carry NaN lon: count them per way and exclude
        # them from the arrays (collect_list-skips-nulls parity)
        miss = np.isnan(lon)
        nmiss = np.array([int(m.sum()) for m in np.split(miss, bounds)], dtype=np.int32)
        keep = ~miss
        keep_groups = np.split(keep, bounds)
        out["node_ids"] = [g[k] for g, k in zip(node_groups, keep_groups)]
        out["xs"] = [g[k] for g, k in zip(lon_groups, keep_groups)]
        out["ys"] = [g[k] for g, k in zip(lat_groups, keep_groups)]
        out["nmiss"] = nmiss
    return pd.DataFrame(out)


def regroup_locations(joined: DataFrame, count_missing: bool = False) -> DataFrame:
    """(way_id, pos, node_id, lon, lat) rows → one array row per way.

    Requires pos to be unique per way (posexplode output). The caller's
    join may be left (count_missing=True adds an `nmiss` column; refs
    with NULL lon are excluded from the arrays) or inner.
    """
    # full tiebreak (pos is unique per way in posexplode output, but a
    # malformed nodes table with duplicate node_id rows must still regroup
    # deterministically — same order as the old sort_array-of-struct)
    part = joined.select("way_id", "pos", "node_id", "lon", "lat").repartition(
        "way_id"
    ).sortWithinPartitions("way_id", "pos", "node_id", "lon", "lat")
    schema = _OUT_SCHEMA + (", nmiss int" if count_missing else "")

    def regroup(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in it:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # hold back the last (possibly batch-straddling) way
            wid = pdf["way_id"].to_numpy()
            cut = int(np.searchsorted(wid, wid[-1], side="left"))
            carry = pdf.iloc[cut:]
            body = pdf.iloc[:cut]
            if len(body):
                yield _build_frame(body, count_missing)
        if carry is not None and len(carry):
            yield _build_frame(carry, count_missing)

    return part.mapInPandas(regroup, schema)


def ways_with_locations(
    ways: DataFrame, nodes: DataFrame, count_missing: bool = False
) -> DataFrame:
    """Attach ordered coordinate arrays to each way.

    Output: way_id, node_ids, xs, ys (+ `nmiss` when `count_missing`).

    With `count_missing` the node join runs LEFT and each way carries its
    missing-location count — the J3 check then reads a tiny aggregate off
    the materialized result instead of paying a second explode+join pass
    (refs with missing locations are excluded from the arrays, matching
    the inner-join behavior).
    """
    refs = ways.select("way_id", F.posexplode("node_ids").alias("pos", "node_id"))
    joined = refs.join(
        nodes.select("node_id", "lon", "lat"),
        "node_id",
        "left" if count_missing else "inner",
    )
    return regroup_locations(joined, count_missing)


def missing_location_count(ways: DataFrame, nodes: DataFrame) -> int:
    """J3: way-node refs with no node row. Any ⇒ caller aborts
    (reference return_code_error, src/osmcoastline.cpp:304-310)."""
    refs = ways.select(F.explode("node_ids").alias("node_id"))
    return refs.join(nodes.select("node_id"), "node_id", "left_anti").count()
