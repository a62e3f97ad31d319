"""Radius-bounded spatial kNN join — the general form of J7/J8's endpoint
matching.

Reference analog: src/coastline_ring_collection.cpp:351-425 finds, for every
open ring end, its nearest candidate starts within a distance bound. That is
a 1-NN-within-radius join on a driver-sized set; this operator is the same
primitive generalized to corpus scale — "for every point, the k nearest
sites within radius r" — which the north rule names directly ("kNN endpoint
matching") and which a 10^12-image geo pipeline needs for nearest-coastline
attribution, reverse geocoding against a site table, and tile-seam
stitching.

Unbounded global kNN is ill-posed at planet scale (the k-th neighbor can be
an ocean away, forcing an all-pairs pass); the radius-bounded form is the
primitive every production spatial engine ships (Sedona DistanceJoin + rank,
PostGIS `<->` with a bound) and is exactly expressible with one equi-join:

  1. each SITE is replicated to every grid cell within Chebyshev distance
     ceil(r / cell_deg) of its own cell (a constant (2c+1)^2 fan-out of the
     SMALL side — the corpus-sized point side is never replicated and never
     moves except by its own cell hash);
  2. each POINT carries its single home cell; one equi-join on the cell key
     yields every candidate pair exactly once (a point meets a site only in
     the point's own cell — no dedup pass);
  3. the exact predicate d2 <= r^2 filters the square corners;
  4. one row_number window per point (order by d2, then site id — total,
     deterministic) keeps the k nearest.

Covering guarantee: if |p - s| <= r (Euclidean, hence per-axis), the cell
index difference per axis is at most ceil(r / cell_deg): axis distance
d <= r spans at most floor(d / cell) + 1 <= ceil(r / cell) cell boundaries,
and exactly r on an aligned boundary still lands within ceil(r / cell).

Plan shape (asserted by tests/test_knn.py): one shuffle-hash/sort-merge
equi-join on the cell key and NOTHING else — the per-point top-k window
partitions by (cell, point) so the join's hash partitioning on the cell
already satisfies its distribution (a point lives in exactly one cell),
and the candidate frame — the largest in the plan — is never re-shuffled.
Exactly 2 exchanges total (one per join input); never BroadcastNestedLoop
or CartesianProduct, which is what a raw `d2 <= r2` theta-join plans as.

Scale posture at 100 TB: the join partitions by spatial cell, so coastline
density skew concentrates candidates in shoreline cells; candidates per
point are bounded by (site density x pi r^2), not by corpus size. For a
skewed site table, pre-split mega-cells with cells.with_salt on the site
side and OR-duplicate the point side's salt (AQE skew-join handles the
moderate case unaided). The window adds no exchange of its own, so the
cell skew story above is the whole skew story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osmcoastline_spark.cells import CELL_STRIDE, cell_ixy_exprs


def knn_join(
    points: DataFrame,
    sites: DataFrame,
    k: int,
    radius: float,
    cell_deg: float,
    point_id: str = "point_id",
    site_id: str = "site_id",
    x: str = "lon",
    y: str = "lat",
    strategy: str = "window",
) -> DataFrame:
    """For every row of `points`, the `k` nearest rows of `sites` within
    Euclidean (planar-degree) distance `radius`, ties broken by `site_id`.

    Both inputs need (id, x, y) columns; output is
    (point_id, site_id, d2, rnk) with rnk in [1, k]. Points with no site
    within `radius` produce no rows (inner semantics — the caller left-joins
    back if absence matters). `d2` is the squared distance, same parity
    choice as the reference's close_distance (squared degrees, NOT
    haversine; src/coastline_ring.cpp:157-164).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if radius <= 0 or cell_deg <= 0:
        raise ValueError(f"radius and cell_deg must be > 0, got {radius}, {cell_deg}")
    import math

    reach = int(math.ceil(radius / cell_deg))
    # Fan-out guard, same idiom as temporal.range_join's bin-explosion cap:
    # a tiny cell under a huge radius silently turns the "constant factor"
    # into thousands; fail loudly at plan time, where it's a config bug.
    if (2 * reach + 1) ** 2 > 1024:
        raise ValueError(
            f"site fan-out (2*{reach}+1)^2 exceeds 1024 cells; "
            f"raise cell_deg (= {cell_deg}) toward radius (= {radius})"
        )

    # shared cell convention (origin/step/packing) from cells.py — a
    # drifted private copy here would silently mis-join against covers
    # built with cell_id_expr
    px, py = cell_ixy_exprs(F.col(x), F.col(y), cell_deg)
    p = points.select(
        F.col(point_id).alias("_pid"),
        F.col(x).alias("_px"),
        F.col(y).alias("_py"),
        (px * CELL_STRIDE + py).alias("_cell"),
    )

    sx, sy = cell_ixy_exprs(F.col(x), F.col(y), cell_deg)
    off = F.sequence(F.lit(-reach), F.lit(reach))
    s = (
        sites.select(
            F.col(site_id).alias("_sid"),
            F.col(x).alias("_sx"),
            F.col(y).alias("_sy"),
            sx.alias("_ix"),
            sy.alias("_iy"),
        )
        .withColumn("_dx", F.explode(off))
        .withColumn("_dy", F.explode(off))
        .select(
            "_sid",
            "_sx",
            "_sy",
            ((F.col("_ix") + F.col("_dx")) * CELL_STRIDE + (F.col("_iy") + F.col("_dy"))).alias(
                "_cell"
            ),
        )
    )

    d2 = (F.col("_px") - F.col("_sx")) * (F.col("_px") - F.col("_sx")) + (
        F.col("_py") - F.col("_sy")
    ) * (F.col("_py") - F.col("_sy"))
    cand = (
        p.join(s, "_cell")
        .withColumn("_d2", d2)
        .filter(F.col("_d2") <= F.lit(radius * radius))
    )
    # Window partitioned by (_cell, _pid), not _pid alone: a point has ONE
    # home cell, so _pid functionally determines _cell and the row_number
    # semantics are identical — but the join output is already hash-
    # partitioned on _cell, which SATISFIES ClusteredDistribution(_cell,
    # _pid) (partitioning expressions ⊆ clustering keys), so Spark plans
    # the window with ZERO additional exchange. Partitioning by _pid alone
    # would re-shuffle the full candidate set (|points| × candidates rows,
    # the largest frame in the plan) purely to regroup rows that are
    # already co-located. tests/test_knn.py pins the exchange count.
    if strategy == "agg":
        # Same distribution argument as the window below — groupBy
        # (_cell, _pid) is satisfied by the join's _cell hash partitioning
        # (grouping keys ⊇ partitioning exprs), so the aggregate adds ZERO
        # exchange — but it replaces the window's whole-partition SORT
        # (16M-row sorter over the largest frame in the plan) with a hash
        # aggregate + an in-row array_sort of each point's own bounded
        # candidate list. array_sort on struct(_d2, _sid) orders by d2
        # then site id — byte-identical output to the window variant
        # (pinned by test_knn_agg_strategy_matches_window).
        agg = cand.groupBy("_cell", "_pid").agg(
            F.collect_list(F.struct("_d2", "_sid")).alias("_c")
        )
        top = F.slice(F.array_sort("_c"), 1, k)
        return (
            agg.select("_pid", F.posexplode(top).alias("_pos", "_s"))
            .select(
                F.col("_pid").alias(point_id),
                F.col("_s._sid").alias(site_id),
                F.col("_s._d2").alias("d2"),
                (F.col("_pos") + 1).cast("long").alias("rnk"),
            )
        )
    if strategy != "window":
        raise ValueError(f"strategy must be 'window' or 'agg', got {strategy!r}")
    w = Window.partitionBy("_cell", "_pid").orderBy(
        F.col("_d2").asc(), F.col("_sid").asc()
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("_pid").alias(point_id),
            F.col("_sid").alias(site_id),
            F.col("_d2").alias("d2"),
            "rnk",
        )
    )
