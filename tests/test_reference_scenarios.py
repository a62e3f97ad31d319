"""Ports of the reference test scenarios that were missing after round 1
(/root/reference/test/t/*.sh), with exact goldens; SRS-parametrized where
the reference scripts branch on SRID (test/CMakeLists.txt:9-21). For 3857
legs the WKT goldens are asserted on the 4326 twin (the scripts transform
back to 4326 before comparing) and the 3857 run asserts counts/counters.
"""

import pytest

from osmcoastline_spark import geom
from osmcoastline_spark.plans.pipeline import Options, run_pipeline
from osmcoastline_spark.synth import fixture_df, nodegrid


def canon(xs, ys):
    return geom.canonical_ring(xs, ys)


def errs(res, table, kind):
    return [r for r in res.tables[table].collect() if r.error == kind]


# ------------------------------------------------- invalid-part-reversed.sh

PART_REVERSED_NODES = [
    (100, 1.10, 1.06), (101, 1.30, 1.06), (102, 1.35, 1.05), (103, 1.30, 1.04),
    (104, 1.25, 1.04), (105, 1.20, 1.04), (106, 1.15, 1.04), (107, 1.10, 1.04),
    (108, 1.05, 1.05),
]
PART_REVERSED_WAYS = [
    (200, [104, 105, 106]),
    (201, [104, 103, 102, 101, 100, 108, 107, 106]),
]


@pytest.mark.parametrize("epsg", [4326, 3857])
def test_part_reversed(spark, epsg):
    nodes, ways = fixture_df(spark, PART_REVERSED_NODES, PART_REVERSED_WAYS)
    res = run_pipeline(spark, nodes, ways, Options(epsg=epsg))
    assert res.exit_code == 2
    assert res.errors == 1  # one fixed ring
    land = res.tables["land_polygons"].collect()
    assert len(land) == 1
    assert len(errs(res, "error_points", "fixed_end_point")) == 2
    if epsg == 4326:
        assert res.warnings == 1  # the overwritten-ownership twin is questionable
        assert res.tables["error_lines"].count() == 2  # added_line + questionable
        # exact land golden (:55-58)
        assert canon(land[0].shell_x, land[0].shell_y) == canon(
            [1.25, 1.15, 1.1, 1.05, 1.1, 1.3, 1.35, 1.3],
            [1.04, 1.04, 1.04, 1.05, 1.06, 1.06, 1.05, 1.04],
        )
    else:
        assert res.warnings == 0  # questionable check is 4326-only
        assert res.tables["error_lines"].count() == 1


# ----------------------------------------------- invalid-complex-overlap.sh

COMPLEX_NODES = [
    (100, 1.00, 1.07), (101, 1.00, 1.06), (102, 1.00, 1.03),
    (103, 1.00, 1.02), (104, 1.00, 1.05), (105, 1.00, 1.04),
]
COMPLEX_WAYS = [
    (200, [101, 100]),
    (201, [100, 101, 104]),
    (202, [103, 102, 105]),
    (203, [105, 104]),
    (204, [104, 105]),
    (205, [104, 101]),
]


@pytest.mark.parametrize("epsg", [4326, 3857])
def test_complex_overlap(spark, epsg):
    """Coastline looping back over itself (:38-44): 3 overlap warnings, one
    fixed ring, and both degenerate zero-area rings dropped by the G5
    triage ⇒ 'No polygons created!' second error."""
    nodes, ways = fixture_df(spark, COMPLEX_NODES, COMPLEX_WAYS)
    res = run_pipeline(spark, nodes, ways, Options(epsg=epsg))
    assert res.exit_code == 2
    assert res.warnings == 3
    assert res.errors == 2
    assert "land_polygons" not in res.tables or res.tables["land_polygons"].count() == 0
    assert res.tables["error_points"].count() == 2
    assert res.tables["error_lines"].count() == 4
    assert len(errs(res, "error_lines", "overlap")) == 3
    assert len(errs(res, "error_lines", "added_line")) == 1
    assert len(errs(res, "error_points", "fixed_end_point")) == 2


# ---------------------------------------- invalid-node-with-coastline-tag.sh


@pytest.mark.parametrize("epsg", [4326, 3857])
def test_node_with_coastline_tag(spark, epsg):
    nodes, ways = fixture_df(
        spark, [(100, 1.01, 1.01, {"natural": "coastline"})], []
    )
    res = run_pipeline(spark, nodes, ways, Options(epsg=epsg))
    assert res.exit_code == 2
    assert res.warnings == 0
    assert res.errors == 1  # No polygons created!
    assert "land_polygons" not in res.tables or res.tables["land_polygons"].count() == 0
    pts = res.tables["error_points"].collect()
    assert len(pts) == 1
    assert (pts[0].osm_id, pts[0].error, pts[0].x, pts[0].y) == (
        100, "tagged_node", 1.01, 1.01,
    )
    assert res.tables["error_lines"].count() == 0


# -------------------- invalid-self-intersection-on-closed-ring-two-ways.sh

SI_ART = (
    "    0         8\n"
    "         4\n"
    "       5  3\n"
    "      2  6    7\n"
    "    1\n"
)


@pytest.mark.parametrize("epsg", [4326, 3857])
def test_self_intersection_closed_ring_two_ways(spark, epsg):
    """Reference uses way id 200 for BOTH ways (an OPL quirk); the semantics
    under test — a self-crossing ring assembled from two ways surviving as
    the dominant lobe — are id-independent, so the port uses 200/201."""
    nodes = nodegrid(SI_ART)
    ways = [
        (200, [103, 104, 105, 106, 107, 108]),
        (201, [108, 100, 101, 102, 103]),
    ]
    ndf, wdf = fixture_df(spark, nodes, ways)
    res = run_pipeline(spark, ndf, wdf, Options(epsg=epsg))
    assert res.exit_code == 1
    assert res.warnings == 1
    assert res.errors == 0
    assert res.tables["land_polygons"].count() == 1
    pts = res.tables["error_points"].collect()
    assert len(pts) == 1
    assert pts[0].error == "intersection"
    assert (round(pts[0].x, 9), round(pts[0].y, 9)) == (1.09, 1.975)
    assert res.tables["error_lines"].count() == 0


# ------------------------- invalid-self-intersection-on-open-ring.sh

SI_OPEN_ART = (
    "\n"
    "         4\n"
    "       5  3\n"
    "      2  6    7\n"
    "    1\n"
)


@pytest.mark.parametrize("epsg", [4326, 3857])
def test_self_intersection_open_ring(spark, epsg):
    nodes = nodegrid(SI_OPEN_ART)
    ways = [(200, [101, 102, 103, 104, 105, 106, 107])]
    ndf, wdf = fixture_df(spark, nodes, ways)
    res = run_pipeline(spark, ndf, wdf, Options(epsg=epsg))
    assert res.exit_code == 2
    assert res.errors == 1  # the gap-closed (fixed) ring
    assert 1 <= res.warnings <= 2  # intersection + (possibly) questionable
    assert res.tables["land_polygons"].count() == 1
    pts = sorted(
        ((r.error, round(r.x, 9), round(r.y, 9)) for r in res.tables["error_points"].collect())
    )
    assert len(pts) == 3
    assert ("intersection", 1.09, 1.975) in pts
    assert ("fixed_end_point", 1.05, 1.96) in pts
    assert ("fixed_end_point", 1.15, 1.97) in pts
    n_lines = res.tables["error_lines"].count()
    assert 1 <= n_lines <= 2  # added_line (+ questionable)


# ------------------------------------------------ valid-two-small-islands.sh


@pytest.mark.parametrize("epsg", [4326, 3857])
def test_two_small_islands(spark, epsg):
    nodes = [
        (100, 1.01, 1.01), (101, 1.04, 1.01), (102, 1.04, 1.04), (103, 1.01, 1.04),
        (110, 1.01, 1.11), (111, 1.04, 1.11), (112, 1.04, 1.14), (113, 1.01, 1.14),
    ]
    ways = [
        (200, [100, 101, 102, 103, 100]),
        (201, [110, 111, 112, 113, 110]),
    ]
    ndf, wdf = fixture_df(spark, nodes, ways)
    res = run_pipeline(spark, ndf, wdf, Options(epsg=epsg))
    assert res.exit_code == 0
    assert res.warnings == 0 and res.errors == 0
    land = res.tables["land_polygons"].collect()
    assert len(land) == 2
    assert res.tables["error_points"].count() == 0
    assert res.tables["error_lines"].count() == 0
    if epsg == 4326:
        got = {canon(p.shell_x, p.shell_y) for p in land}
        assert got == {
            canon([1.01, 1.01, 1.04, 1.04], [1.01, 1.04, 1.04, 1.01]),
            canon([1.01, 1.01, 1.04, 1.04], [1.11, 1.14, 1.14, 1.11]),
        }


# ---------------------------------------------------- valid-inland-sea.sh

INLAND_SEA_ART = (
    "\n"
    "    0--------1----\\\n"
    "   /               \\--2\\\n"
    "   3     4------5       6\n"
    "    \\     \\7--8/       /\n"
    "     \\                /\n"
    "      -9------------a\n"
)


@pytest.mark.parametrize("epsg", [4326, 3857])
def test_valid_inland_sea(spark, epsg):
    nodes = nodegrid(INLAND_SEA_ART)
    ways = [
        (200, [100, 103, 109, 110, 106, 102, 101, 100]),
        (201, [104, 105, 108, 107, 104]),
    ]
    ndf, wdf = fixture_df(spark, nodes, ways)
    res = run_pipeline(spark, ndf, wdf, Options(epsg=epsg))
    assert res.errors == 0
    assert res.tables["error_points"].count() == 0
    land = res.tables["land_polygons"].collect()
    assert len(land) == 1
    if epsg == 4326:
        assert res.exit_code == 1
        assert res.warnings == 1
        q = errs(res, "error_lines", "questionable")
        assert len(q) == 1 and q[0].osm_id == 201
        # questionable linestring is NOT reversed (add_error_line(..., false))
        assert list(q[0].xs)[0] == 1.10 and list(q[0].xs)[-1] == 1.10
        # exact land golden with the inland sea as a hole
        assert canon(land[0].shell_x, land[0].shell_y) == canon(
            [1.05, 1.14, 1.23, 1.25, 1.21, 1.08, 1.04],
            [1.99, 1.99, 1.98, 1.97, 1.94, 1.94, 1.97],
        )
        assert land[0].holes_x is not None and len(land[0].holes_x) == 1
        assert canon(list(land[0].holes_x[0]), list(land[0].holes_y[0])) == canon(
            [1.1, 1.12, 1.15, 1.17], [1.97, 1.96, 1.96, 1.97]
        )
    else:
        assert res.exit_code == 0
        assert res.warnings == 0
        assert res.tables["error_lines"].count() == 0


# ---------------------------------------------- valid-island-from-one-way.sh


@pytest.mark.parametrize("epsg", [4326, 3857])
def test_island_from_one_way_golden(spark, epsg):
    nodes = [
        (100, 80.01, 10.01), (101, 80.04, 10.01), (102, 80.04, 10.04), (103, 80.01, 10.04),
    ]
    ways = [(200, [100, 101, 102, 103, 100])]
    ndf, wdf = fixture_df(spark, nodes, ways)
    res = run_pipeline(spark, ndf, wdf, Options(epsg=epsg))
    assert res.exit_code == 0
    assert res.warnings == 0 and res.errors == 0
    land = res.tables["land_polygons"].collect()
    assert len(land) == 1
    assert res.tables["error_points"].count() == 0
    assert res.tables["error_lines"].count() == 0
    if epsg == 4326:
        assert canon(land[0].shell_x, land[0].shell_y) == canon(
            [80.01, 80.01, 80.04, 80.04], [10.01, 10.04, 10.04, 10.01]
        )
        assert geom.is_clockwise(land[0].shell_x, land[0].shell_y)


# --------------------------------------------------------- usage-and-help.sh


def test_usage_and_help(capsys):
    """Reference exits 4 without arguments and prints usage; -h/--help print
    usage and exit 0 (test/t/usage-and-help.sh)."""
    from osmcoastline_spark.cli import main

    assert main([]) == 4
    err = capsys.readouterr().err
    assert "usage" in err.lower() and "osmcoastline" in err.lower()
    for flag in ("-h", "--help"):
        with pytest.raises(SystemExit) as e:
            main([flag])
        assert e.value.code == 0
        out = capsys.readouterr().out
        assert "usage" in out.lower() and "osmcoastline" in out.lower()
