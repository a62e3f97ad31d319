"""Pytest port of the reference golden test suite (FIXTURES.md, derived from
/root/reference/test/t/*.sh). Assertions: exit code, warning/error counters,
table row counts, canonical WKT."""

import pytest

from osmcoastline_spark import geom
from osmcoastline_spark.plans.pipeline import Options, run_pipeline
from osmcoastline_spark.synth import fixture_df


def canon(xs, ys):
    return geom.canonical_ring(xs, ys)


def errs(res, table, kind):
    return [r for r in res.tables[table].collect() if r.error == kind]


# ------------------------------------------------------------------ F2


F2_NODES = [(100, 1.01, 1.01), (101, 1.04, 1.01), (102, 1.04, 1.04), (103, 1.01, 1.04)]
F2_WAYS = [(200, [100, 101, 102, 103])]


def test_ring_not_closed_default(spark):
    nodes, ways = fixture_df(spark, F2_NODES, F2_WAYS)
    res = run_pipeline(spark, nodes, ways, Options(output_rings=True))
    assert res.exit_code == 2
    assert res.warnings == 0
    assert res.errors == 1
    land = res.tables["land_polygons"].collect()
    assert len(land) == 1
    assert canon(land[0].shell_x, land[0].shell_y) == canon(
        [1.01, 1.01, 1.04, 1.04], [1.01, 1.04, 1.04, 1.01]
    )
    fep = errs(res, "error_points", "fixed_end_point")
    assert sorted((r.osm_id, r.x, r.y) for r in fep) == [
        (100, 1.01, 1.01),
        (103, 1.01, 1.04),
    ]
    added = errs(res, "error_lines", "added_line")
    assert len(added) == 1
    assert list(added[0].xs) == [1.01, 1.01] and list(added[0].ys) == [1.04, 1.01]
    assert res.tables["rings"].count() == 1


def test_ring_not_closed_no_closing(spark):
    nodes, ways = fixture_df(spark, F2_NODES, F2_WAYS)
    res = run_pipeline(spark, nodes, ways, Options(close_distance=0, output_rings=True))
    assert res.exit_code == 2
    assert res.warnings == 1
    assert res.errors == 1  # "No polygons created!"
    assert "land_polygons" not in res.tables or res.tables["land_polygons"].count() == 0
    nc = errs(res, "error_lines", "not_closed")
    assert len(nc) == 1 and nc[0].osm_id == 200
    # reversed linestring golden
    assert list(nc[0].xs) == [1.01, 1.04, 1.04, 1.01]
    assert list(nc[0].ys) == [1.04, 1.04, 1.01, 1.01]
    ep = errs(res, "error_points", "end_point")
    assert sorted(r.osm_id for r in ep) == [100, 103]


# ------------------------------------------------------------------ F3


def test_node_id_mismatch(spark):
    nodes, ways = fixture_df(
        spark,
        [(100, 1.00, 1.00), (101, 1.00, 1.01), (102, 1.01, 1.01), (103, 1.01, 1.00), (104, 1.00, 1.00)],
        [(200, [100, 101, 102]), (201, [102, 103, 104])],
    )
    res = run_pipeline(spark, nodes, ways, Options())
    assert res.exit_code == 2
    assert res.warnings == 0
    assert res.errors == 2  # 1 fixed ring + "No polygons created!"
    assert "land_polygons" not in res.tables
    fep = errs(res, "error_points", "fixed_end_point")
    assert sorted((r.osm_id, r.x, r.y) for r in fep) == [(100, 1.0, 1.0), (104, 1.0, 1.0)]
    assert len(errs(res, "error_lines", "added_line")) == 0


# ------------------------------------------------------------------ F4


def test_wrong_direction(spark):
    nodes, ways = fixture_df(
        spark,
        [(100, 1.01, 1.01), (101, 1.01, 1.04), (102, 1.04, 1.04), (103, 1.04, 1.01)],
        [(200, [100, 101, 102, 103, 100])],
    )
    res = run_pipeline(spark, nodes, ways, Options())
    assert res.exit_code == 1
    assert res.warnings == 1
    assert res.errors == 0
    assert res.stats["rings_turned_around"] == 1
    land = res.tables["land_polygons"].collect()
    assert len(land) == 1
    assert geom.is_clockwise(land[0].shell_x, land[0].shell_y)
    assert len(errs(res, "error_lines", "direction")) == 1


# ------------------------------------------------------------------ F5-style


def test_self_intersection_bowtie(spark):
    nodes, ways = fixture_df(
        spark,
        [(100, 1.0, 1.0), (101, 1.1, 1.1), (102, 1.1, 1.0), (103, 1.0, 1.1)],
        [(200, [100, 101, 102, 103, 100])],
    )
    res = run_pipeline(spark, nodes, ways, Options())
    assert res.exit_code == 1
    assert res.errors == 0
    pts = errs(res, "error_points", "intersection")
    assert len(pts) == 1
    assert (round(pts[0].x, 10), round(pts[0].y, 10)) == (1.05, 1.05)


# ------------------------------------------------------------------ F6


def test_duplicate_segments(spark):
    nodes, ways = fixture_df(
        spark,
        [
            (100, 1.10, 1.06), (101, 1.30, 1.06), (102, 1.35, 1.05), (103, 1.30, 1.04),
            (104, 1.25, 1.04), (105, 1.20, 1.04), (106, 1.15, 1.04), (107, 1.10, 1.04),
            (108, 1.05, 1.05),
        ],
        [
            (200, [106, 105, 104]),
            (201, [106, 105, 104]),
            (202, [104, 103, 102, 101, 100, 108, 107, 106]),
        ],
    )
    res = run_pipeline(spark, nodes, ways, Options())
    assert res.errors == 0
    assert res.warnings == 3  # 2 overlaps + 1 questionable
    assert res.exit_code == 1
    assert res.tables["land_polygons"].count() == 1
    assert res.tables["error_points"].count() == 0
    ov = errs(res, "error_lines", "overlap")
    assert len(ov) == 2
    golden_ov = {((1.15, 1.04), (1.2, 1.04)), ((1.2, 1.04), (1.25, 1.04))}
    got_ov = {((r.xs[0], r.ys[0]), (r.xs[1], r.ys[1])) for r in ov}
    assert got_ov == golden_ov
    q = errs(res, "error_lines", "questionable")
    assert len(q) == 1
    land = res.tables["land_polygons"].collect()[0]
    assert canon(land.shell_x, land.shell_y) == canon(
        [1.15, 1.1, 1.05, 1.1, 1.3, 1.35, 1.3, 1.25, 1.2],
        [1.04, 1.04, 1.05, 1.06, 1.06, 1.05, 1.04, 1.04, 1.04],
    )


def test_duplicate_segments_3857(spark):
    nodes, ways = fixture_df(
        spark,
        [
            (100, 1.10, 1.06), (101, 1.30, 1.06), (102, 1.35, 1.05), (103, 1.30, 1.04),
            (104, 1.25, 1.04), (105, 1.20, 1.04), (106, 1.15, 1.04), (107, 1.10, 1.04),
            (108, 1.05, 1.05),
        ],
        [
            (200, [106, 105, 104]),
            (201, [106, 105, 104]),
            (202, [104, 103, 102, 101, 100, 108, 107, 106]),
        ],
    )
    res = run_pipeline(spark, nodes, ways, Options(epsg=3857))
    # questionable check only runs in 4326 (osmcoastline.cpp:381-389)
    assert res.warnings == 2
    assert res.exit_code == 1
    assert res.tables["land_polygons"].count() == 1


# ------------------------------------------------------------------ F9


def test_overlapping_islands(spark):
    # two closed rings whose edges cross twice
    nodes, ways = fixture_df(
        spark,
        [
            (100, 1.00, 1.00), (101, 1.06, 1.00), (102, 1.06, 1.06), (103, 1.00, 1.06),
            (110, 1.04, 1.04), (111, 1.10, 1.04), (112, 1.10, 1.10), (113, 1.04, 1.10),
        ],
        [
            (200, [100, 101, 102, 103, 100]),
            (201, [110, 111, 112, 113, 110]),
        ],
    )
    res = run_pipeline(spark, nodes, ways, Options())
    assert res.errors == 0
    pts = errs(res, "error_points", "intersection")
    assert len(pts) == 2
    got = sorted((round(p.x, 10), round(p.y, 10)) for p in pts)
    assert got == [(1.04, 1.06), (1.06, 1.04)]
    assert res.tables["land_polygons"].count() == 2
    assert res.exit_code == 1


# ------------------------------------------------------------------ F7


def test_antimeridian(spark):
    nodes, ways = fixture_df(
        spark,
        [
            (100, -180.0, 1.1), (101, -179.0, 1.1), (102, -179.0, 1.4), (103, -180.0, 1.4),
            (110, 180.0, 1.4), (111, 179.0, 1.4), (112, 179.0, 1.1), (113, 180.0, 1.1),
        ],
        [
            (200, [100, 101, 102, 103, 100]),
            (201, [110, 111, 112, 113, 110]),
        ],
    )
    res = run_pipeline(spark, nodes, ways, Options(output_lines=True))
    assert res.exit_code == 0
    assert res.warnings == 0 and res.errors == 0
    assert res.tables["land_polygons"].count() == 2
    # antimeridian edge segments suppressed from the lines output
    lines = res.tables["lines"].collect()
    assert len(lines) == 2
    for ln in lines:
        for i in range(1, len(ln.xs)):
            assert not (abs(ln.xs[i - 1]) > 179.9999 and abs(ln.xs[i]) > 179.9999)


# ------------------------------------------------------------------ inland sea (hole nesting)


def test_inland_sea_with_correct_island(spark):
    # land ring (CCW), inland sea (CW = proper hole), island inside the sea
    # wound like land (CCW) — valid nesting: 2 land polygons, 1 hole
    outer = [(100 + i, x, y) for i, (x, y) in enumerate(
        [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0)])]
    hole = [(110 + i, x, y) for i, (x, y) in enumerate(
        [(1.2, 1.2), (1.2, 1.8), (1.8, 1.8), (1.8, 1.2)])]  # CW = sea
    isle = [(120 + i, x, y) for i, (x, y) in enumerate(
        [(1.4, 1.4), (1.6, 1.4), (1.6, 1.6), (1.4, 1.6)])]  # CCW = land
    nodes = outer + hole + isle
    ways = [
        (200, [100, 101, 102, 103, 100]),
        (201, [110, 111, 112, 113, 110]),
        (202, [120, 121, 122, 123, 120]),
    ]
    ndf, wdf = fixture_df(spark, nodes, ways)
    res = run_pipeline(spark, ndf, wdf, Options(output_polygons="both", water_cell_deg=2.0))
    land = res.tables["land_polygons"].collect()
    assert len(land) == 2  # outer land + island (sea is an interior ring)
    outer_poly = [p for p in land if 1.0 in list(p.shell_x)][0]
    assert outer_poly.holes_x is not None and len(outer_poly.holes_x) == 1
    water = res.tables["water_polygons"].collect()
    assert len(water) >= 1


def test_inland_sea_with_island_reference_fixture(spark):
    """Exact port of test/t/valid-inland-sea-with-island.sh: the island is
    drawn wound like a hole, so the assembled polygon has a hole inside a
    hole ⇒ invalid ⇒ dropped: land 0, 1 error, 3 questionable rings."""
    from osmcoastline_spark.synth import nodegrid

    art = (
        "\n"
        "    0--------1----\\\n"
        "   /               \\--2\\\n"
        "   3     4------5       6\n"
        "   |     |  bc  |       |\n"
        "   |     |   d  |       |\n"
        "    \\     \\7---8/      /\n"
        "     \\                /\n"
        "      -9------------a\n"
    )
    nodes = nodegrid(art)
    ways = [
        (200, [100, 103, 109, 110, 106, 102, 101, 100]),
        (201, [104, 105, 108, 107, 104]),
        (202, [111, 112, 113, 111]),
    ]
    ndf, wdf = fixture_df(spark, nodes, ways)
    res = run_pipeline(spark, ndf, wdf, Options())
    assert res.errors == 1
    assert res.warnings == 3
    assert res.exit_code == 2
    assert res.tables["land_polygons"].count() == 0
    assert res.tables["error_points"].count() == 0
    q = errs(res, "error_lines", "questionable")
    assert len(q) == 3
    # 3857: questionable check skipped → 0 warnings, land still 0
    res2 = run_pipeline(spark, ndf, wdf, Options(epsg=3857))
    assert res2.warnings == 0 and res2.errors == 1
    assert res2.tables["error_lines"].count() == 0


# ------------------------------------------------- 3857 twins (CMakeLists 9-21)
# The reference runs every scenario at SRID 4326 AND 3857. The 4326 legs
# above carry the exact goldens; these twins re-run each fixture in 3857
# and assert the SRS-invariant contract: same error/land/point counts with
# the questionable check skipped (osmcoastline.cpp:381-389) and all output
# coordinates in mercator metres.

import pytest as _pytest

_TWIN_CASES = [
    # (name, nodes, ways, options-kwargs, expected dict)
    ("ring_not_closed", F2_NODES, F2_WAYS, {},
     {"errors": 1, "land": 1, "fixed_end_points": 2}),
    ("wrong_direction",
     [(100, 1.01, 1.01), (101, 1.01, 1.04), (102, 1.04, 1.04), (103, 1.04, 1.01)],
     [(200, [100, 101, 102, 103, 100])],
     {}, {"errors": 0, "land": 1, "warnings": 1}),
    ("bowtie",
     [(100, 1.0, 1.0), (101, 1.1, 1.1), (102, 1.1, 1.0), (103, 1.0, 1.1)],
     [(200, [100, 101, 102, 103, 100])],
     {}, {"errors": 0, "land": 1, "intersections": 1}),
    ("overlapping_islands",
     [
         (100, 1.00, 1.00), (101, 1.06, 1.00), (102, 1.06, 1.06), (103, 1.00, 1.06),
         (110, 1.04, 1.04), (111, 1.10, 1.04), (112, 1.10, 1.10), (113, 1.04, 1.10),
     ],
     [(200, [100, 101, 102, 103, 100]), (201, [110, 111, 112, 113, 110])],
     {}, {"errors": 0, "land": 2, "intersections": 2}),
]


@_pytest.mark.parametrize(
    "name,nodes,ways,opts,exp", _TWIN_CASES, ids=[c[0] for c in _TWIN_CASES]
)
def test_3857_twin(spark, name, nodes, ways, opts, exp):
    ndf, wdf = fixture_df(spark, nodes, ways)
    res = run_pipeline(spark, ndf, wdf, Options(epsg=3857, **opts))
    assert res.errors == exp["errors"]
    if "warnings" in exp:
        assert res.warnings == exp["warnings"]
    land = res.tables.get("land_polygons")
    assert (land.count() if land is not None else 0) == exp["land"]
    if "fixed_end_points" in exp:
        assert len(errs(res, "error_points", "fixed_end_point")) == exp["fixed_end_points"]
    if "intersections" in exp:
        # error points stay in input (4326) space: intersections are found
        # BEFORE the transform, exactly like the reference
        assert len(errs(res, "error_points", "intersection")) == exp["intersections"]
    # land coordinates must be mercator metres, not degrees
    if exp["land"]:
        p = land.collect()[0]
        assert max(abs(v) for v in p.shell_x) > 1000.0
