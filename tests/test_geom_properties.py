"""Property-based kernel tests (hypothesis)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osmcoastline_spark import geom


def convex_ring(n, cx, cy, r):
    theta = np.sort(np.random.default_rng(n).uniform(0, 2 * np.pi, max(n, 3)))
    return cx + r * np.cos(theta), cy + r * np.sin(theta)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(4, 30),
    cx=st.floats(-50, 50),
    cy=st.floats(-40, 40),
    r=st.floats(0.1, 5.0),
    frac=st.floats(0.1, 0.9),
)
def test_cut_partitions_area(n, cx, cy, r, frac):
    xs, ys = convex_ring(n, cx, cy, r)
    total = abs(geom.signed_area2(xs, ys)) / 2
    c = xs.min() + frac * (xs.max() - xs.min())
    lo = geom.cut_ring(xs, ys, 0, c, keep_low=True)
    hi = geom.cut_ring(xs, ys, 0, c, keep_low=False)
    got = sum(abs(geom.signed_area2(px, py)) / 2 for px, py in lo + hi)
    assert abs(got - total) < 1e-9 * max(total, 1.0)


@settings(max_examples=50, deadline=None)
@given(
    ax1=st.floats(-10, 10), ay1=st.floats(-10, 10),
    ax2=st.floats(-10, 10), ay2=st.floats(-10, 10),
    bx1=st.floats(-10, 10), by1=st.floats(-10, 10),
    bx2=st.floats(-10, 10), by2=st.floats(-10, 10),
)
def test_intersection_symmetric(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    m1, ix1, iy1 = geom.segment_intersections(
        [ax1], [ay1], [ax2], [ay2], [bx1], [by1], [bx2], [by2]
    )
    m2, ix2, iy2 = geom.segment_intersections(
        [bx1], [by1], [bx2], [by2], [ax1], [ay1], [ax2], [ay2]
    )
    assert m1[0] == m2[0]
    if m1[0]:
        assert abs(ix1[0] - ix2[0]) < 1e-9 and abs(iy1[0] - iy2[0]) < 1e-9


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(4, 30),
    r=st.floats(0.5, 5.0),
    px=st.floats(-10, 10),
    py=st.floats(-10, 10),
)
def test_pip_matches_distance_for_circle(n, r, px, py):
    xs, ys = convex_ring(n, 0.0, 0.0, r)
    # for a convex ring, PIP must agree with the half-plane test over edges
    x = np.asarray(xs)
    y = np.asarray(ys)
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    cross = (x2 - x) * (py - y) - (y2 - y) * (px - x)
    ccw = geom.signed_area2(xs, ys) > 0
    strict_inside = bool(np.all(cross > 1e-12)) if ccw else bool(np.all(cross < -1e-12))
    strict_outside = bool(np.any(cross < -1e-12)) if ccw else bool(np.any(cross > 1e-12))
    got = bool(geom.points_in_ring(np.array([px]), np.array([py]), xs, ys)[0])
    if strict_inside:
        assert got
    elif strict_outside and not strict_inside:
        pass_band = np.min(np.abs(cross))
        if pass_band > 1e-9:  # avoid ray-cast edge ties right on the boundary
            assert not got


@settings(max_examples=30, deadline=None)
@given(lon=st.floats(-179.9, 179.9), lat=st.floats(-84.9, 84.9))
def test_merc_inverse_property(lon, lat):
    x, y = geom.merc_forward([lon], [lat])
    lon2, lat2 = geom.merc_inverse(x, y)
    assert abs(lon2[0] - lon) < 1e-9
    assert abs(lat2[0] - lat) < 1e-7
