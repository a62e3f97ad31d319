"""Radius-bounded spatial kNN join (operators/knn.py)."""

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from osmcoastline_spark.operators.knn import knn_join


def _df(spark, rows, idcol):
    return spark.createDataFrame(rows, f"{idcol}: long, lon: double, lat: double")


def test_knn_hand_computed(spark):
    # point 1 at origin; sites at d2 = 1, 2, 4, 9 and one outside radius.
    points = _df(spark, [(1, 0.0, 0.0)], "point_id")
    sites = _df(
        spark,
        [
            (10, 1.0, 0.0),  # d2 = 1
            (11, 1.0, 1.0),  # d2 = 2
            (12, 0.0, 2.0),  # d2 = 4
            (13, 3.0, 0.0),  # d2 = 9
            (14, 50.0, 0.0),  # outside radius
        ],
        "site_id",
    )
    out = knn_join(points, sites, k=3, radius=4.0, cell_deg=2.0)
    got = [(r.site_id, r.d2, r.rnk) for r in out.orderBy("rnk").collect()]
    assert got == [(10, 1.0, 1), (11, 2.0, 2), (12, 4.0, 3)]


def test_knn_tie_breaks_by_site_id(spark):
    # two sites equidistant from the point: lower site_id wins rank 1
    points = _df(spark, [(1, 0.0, 0.0)], "point_id")
    sites = _df(spark, [(20, 1.0, 0.0), (7, -1.0, 0.0)], "site_id")
    out = knn_join(points, sites, k=2, radius=2.0, cell_deg=1.0)
    got = [(r.site_id, r.rnk) for r in out.orderBy("rnk").collect()]
    assert got == [(7, 1), (20, 2)]


def test_knn_no_sites_in_radius_emits_nothing(spark):
    points = _df(spark, [(1, 0.0, 0.0)], "point_id")
    sites = _df(spark, [(10, 30.0, 30.0)], "site_id")
    assert knn_join(points, sites, k=1, radius=1.0, cell_deg=1.0).count() == 0


def test_knn_matches_brute_force(spark):
    # random points/sites, binned kNN == crossJoin + window definitional kNN
    rng = random.Random(42)
    points = _df(
        spark,
        [(i, rng.uniform(-20, 20), rng.uniform(-10, 10)) for i in range(60)],
        "point_id",
    )
    sites = _df(
        spark,
        [(i, rng.uniform(-20, 20), rng.uniform(-10, 10)) for i in range(200)],
        "site_id",
    )
    k, radius = 4, 3.0
    got = knn_join(points, sites, k=k, radius=radius, cell_deg=1.5)

    p = points.select("point_id", F.col("lon").alias("px"), F.col("lat").alias("py"))
    s = sites.select("site_id", F.col("lon").alias("sx"), F.col("lat").alias("sy"))
    d2 = (F.col("px") - F.col("sx")) * (F.col("px") - F.col("sx")) + (
        F.col("py") - F.col("sy")
    ) * (F.col("py") - F.col("sy"))
    w = Window.partitionBy("point_id").orderBy("d2", "site_id")
    ref = (
        p.crossJoin(s)
        .withColumn("d2", d2)
        .filter(F.col("d2") <= radius * radius)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("point_id", "site_id", "d2", "rnk")
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, ref.collect()))
    assert a == b and len(a) > 100


def test_knn_boundary_site_exactly_at_radius_kept(spark):
    # site exactly at distance r on a cell boundary: the ceil() covering
    # guarantee must still reach it (d2 <= r2 is inclusive)
    points = _df(spark, [(1, 0.0, 0.0)], "point_id")
    sites = _df(spark, [(10, 2.0, 0.0)], "site_id")
    out = knn_join(points, sites, k=1, radius=2.0, cell_deg=1.0)
    assert [(r.site_id, r.d2) for r in out.collect()] == [(10, 4.0)]


def test_knn_plan_has_no_nested_loop(spark):
    points = _df(spark, [(1, 0.0, 0.0)], "point_id")
    sites = _df(spark, [(10, 1.0, 0.0)], "site_id")
    plan = knn_join(points, sites, k=1, radius=1.0, cell_deg=1.0)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_knn_window_adds_no_exchange(spark):
    # The top-k window partitions by (_cell, _pid); the join's hash
    # partitioning on _cell must satisfy it, so the only exchanges in the
    # whole plan are the two join inputs — the candidate frame (the
    # largest in the plan) is never re-shuffled. Disable broadcast so the
    # join is a genuine shuffle join regardless of the tiny test input.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        points = _df(spark, [(1, 0.0, 0.0), (2, 3.0, 3.0)], "point_id")
        sites = _df(spark, [(10, 1.0, 0.0), (11, 3.5, 3.0)], "site_id")
        plan = (
            knn_join(points, sites, k=1, radius=1.0, cell_deg=1.0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 2, f"expected 2 join-input exchanges, got {n_exchanges}:\n{plan}"


def test_knn_fanout_guard(spark):
    points = _df(spark, [(1, 0.0, 0.0)], "point_id")
    sites = _df(spark, [(10, 1.0, 0.0)], "site_id")
    with pytest.raises(ValueError, match="fan-out"):
        knn_join(points, sites, k=1, radius=100.0, cell_deg=0.01)
    with pytest.raises(ValueError, match="k must be"):
        knn_join(points, sites, k=0, radius=1.0, cell_deg=1.0)


@pytest.mark.parametrize(
    "radius,cell_deg,k,extent",
    [
        # radius an exact integer multiple of the cell: the ceil() in the
        # covering bound has no slack — boundary pairs must still be found
        (3.0, 1.0, 3, 10.0),
        (1.0, 0.25, 2, 4.0),
        # cell much larger than the radius: reach=1, neighbors come only
        # from the 3x3 block; most same-cell candidates fail the filter
        (0.5, 5.0, 4, 20.0),
        # radius barely over a cell multiple: reach rounds UP (2.01 -> 3)
        (2.01, 1.0, 2, 8.0),
        # k larger than any point's candidate count: every in-radius pair
        # must appear, ranks dense from 1
        (2.0, 1.0, 50, 6.0),
    ],
)
def test_knn_covering_grid_matches_brute_force(spark, radius, cell_deg, k, extent):
    """Adversarial covering-guarantee grid: binned kNN == definitional kNN
    for radius/cell ratios with zero ceil() slack, cells larger than the
    radius, and k beyond the candidate count — placed at EXTREME negative
    coordinates so the (x+180)/cell index arithmetic runs far from 0."""
    rng = random.Random(radius * 100 + cell_deg)
    pts = [
        (i, -180.0 + rng.uniform(0, extent), -85.0 + rng.uniform(0, extent))
        for i in range(40)
    ]
    # sites on an exact lattice INCLUDING cell-boundary-aligned positions,
    # plus random fill — boundary alignment is where a floor() flip would
    # break the covering bound
    lat_steps = int(extent / cell_deg)
    lattice = [
        (1000 + j, -180.0 + (j % max(lat_steps, 1)) * cell_deg,
         -85.0 + (j // max(lat_steps, 1)) * cell_deg)
        for j in range(min(lat_steps * lat_steps, 60))
    ]
    fill = [
        (2000 + j, -180.0 + rng.uniform(0, extent), -85.0 + rng.uniform(0, extent))
        for j in range(40)
    ]
    points = _df(spark, pts, "point_id")
    sites = _df(spark, lattice + fill, "site_id")

    got = knn_join(points, sites, k=k, radius=radius, cell_deg=cell_deg)

    p = points.select("point_id", F.col("lon").alias("px"), F.col("lat").alias("py"))
    s = sites.select("site_id", F.col("lon").alias("sx"), F.col("lat").alias("sy"))
    d2 = (F.col("px") - F.col("sx")) * (F.col("px") - F.col("sx")) + (
        F.col("py") - F.col("sy")
    ) * (F.col("py") - F.col("sy"))
    w = Window.partitionBy("point_id").orderBy("d2", "site_id")
    ref = (
        p.crossJoin(s)
        .withColumn("d2", d2)
        .filter(F.col("d2") <= radius * radius)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("point_id", "site_id", "d2", "rnk")
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, ref.collect()))
    assert a == b
    assert len(a) > 0  # non-vacuous for every config


def test_knn_agg_strategy_matches_window(spark):
    import random

    from osmcoastline_spark.operators.knn import knn_join

    rng = random.Random(4)
    pts = spark.createDataFrame(
        [(i, rng.uniform(0, 10), rng.uniform(0, 10)) for i in range(300)],
        ["point_id", "lon", "lat"],
    )
    sites = spark.createDataFrame(
        [(i, rng.uniform(0, 10), rng.uniform(0, 10)) for i in range(120)],
        ["site_id", "lon", "lat"],
    )
    kw = dict(k=3, radius=2.0, cell_deg=2.0)
    a = sorted(map(tuple, knn_join(pts, sites, **kw).collect()))
    b = sorted(map(tuple, knn_join(pts, sites, strategy="agg", **kw).collect()))
    assert a == b and len(a) > 100
    # the agg variant must stay exchange-free past the join, like the window
    plan = knn_join(pts, sites, strategy="agg", **kw)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2  # one per join input, nothing after
