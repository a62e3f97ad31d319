"""G5 — ring-polygon validity triage with a pure-numpy Buffer(0) equivalent.

Reference: src/coastline_ring_collection.cpp:148-168 (add_polygons_to_vector)
— every closed ring with npoints>3 becomes a polygon ONLY if it IsValid;
invalid rings get one GEOS Buffer(0) repair attempt and are dropped
SILENTLY (stderr only — no warning, no error, no error line) when the
repair does not yield a single valid polygon. When every ring drops this
way, create_polygons throws "No polygons created!" (osmcoastline.cpp:119)
which the caller converts into one error and skips lines/questionable/
split/water entirely (osmcoastline.cpp:355-416).

Buffer(0) equivalence implemented here (validated against the reference's
four self-intersection scenarios + the degenerate complex-overlap case):

  1. split the ring at transversal self-crossings and repeated
     (non-closure) vertices into simple pieces;
  2. drop zero-area pieces;
  3. dominant sign S = sign of the summed piece areas (+ if zero — the
     symmetric-bowtie case keeps the positively-wound lobe);
  4. candidates = pieces with sign S; a candidate strictly inside another
     candidate is absorbed (union semantics — the "curl" case where a
     doubly-wound inner lobe merges into the outer);
  5. exactly one candidate left ⇒ repaired ring; anything else ⇒ the
     GEOS result would be empty/MultiPolygon ⇒ drop.

Scale shape: only FLAGGED rings (self-crossing via the distributed
cell-binned kernel, repeated vertex, or zero area — pure Catalyst
predicates) enter the Arrow repair batch; clean rings pass through
untouched with no Python in their path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmcoastline_spark import geom
from osmcoastline_spark.operators.intersections import ring_segments, ring_self_intersections

# rings larger than this are dropped un-repaired (the in-batch crossing
# search is O(n²) bbox-filtered; genuinely invalid rings are data-error
# sized, not continent sized)
MAX_REPAIR_POINTS = 50_000


def _crossing(xs, ys, i, j):
    """Transversal crossing of edges i and j (non-adjacent), or None."""
    mask, px, py = geom.segment_intersections(
        np.array([xs[i]]), np.array([ys[i]]), np.array([xs[i + 1]]), np.array([ys[i + 1]]),
        np.array([xs[j]]), np.array([ys[j]]), np.array([xs[j + 1]]), np.array([ys[j + 1]]),
    )
    if mask[0]:
        return float(px[0]), float(py[0])
    return None


def _first_split(xs: list, ys: list):
    """First repeated vertex or edge crossing of a closed ring, as a split
    instruction (i, j, px, py, is_vertex) with i<j, or None if simple."""
    n = len(xs) - 1  # distinct vertices
    # repeated (non-closure) vertices
    seen: dict[tuple, int] = {}
    for k in range(n):
        key = (xs[k], ys[k])
        if key in seen:
            return seen[key], k, xs[k], ys[k], True
        seen[key] = k
    # transversal crossings, bbox-filtered pair scan
    ex1 = np.minimum(xs[:-1], xs[1:])
    ex2 = np.maximum(xs[:-1], xs[1:])
    ey1 = np.minimum(ys[:-1], ys[1:])
    ey2 = np.maximum(ys[:-1], ys[1:])
    for i in range(n):
        js = np.nonzero(
            (ex1[i + 2 :] <= ex2[i]) & (ex1[i] <= ex2[i + 2 :])
            & (ey1[i + 2 :] <= ey2[i]) & (ey1[i] <= ey2[i + 2 :])
        )[0]
        for j in js + i + 2:
            if i == 0 and j == n - 1:
                continue  # adjacent through the closure
            hit = _crossing(np.asarray(xs), np.asarray(ys), i, int(j))
            if hit is not None:
                return i, int(j), hit[0], hit[1], False
    return None


def _split_simple(xs: list, ys: list) -> list[tuple[list, list]]:
    """Recursively split a closed ring into simple closed pieces."""
    sp = _first_split(xs, ys)
    if sp is None:
        return [(xs, ys)]
    i, j, px, py, is_vertex = sp
    if is_vertex:
        # v[i] == v[j]: the slice i..j is ALREADY closed — appending v[i]
        # again would add a zero-length edge and recurse forever on spikes
        a_x = xs[i : j + 1]
        a_y = ys[i : j + 1]
        b_x = xs[j : len(xs) - 1] + xs[: i + 1]
        b_y = ys[j : len(ys) - 1] + ys[: i + 1]
    else:
        a_x = [px] + xs[i + 1 : j + 1] + [px]
        a_y = [py] + ys[i + 1 : j + 1] + [py]
        b_x = [px] + xs[j + 1 : len(xs) - 1] + xs[: i + 1] + [px]
        b_y = [py] + ys[j + 1 : len(ys) - 1] + ys[: i + 1] + [py]
    out = []
    for rx, ry in ((a_x, a_y), (b_x, b_y)):
        if len(rx) >= 4:
            out.extend(_split_simple(rx, ry))
    return out


def buffer0_repair(xs: list, ys: list) -> tuple[list, list] | None:
    """Numpy Buffer(0): repaired (xs, ys) or None (drop).

    Accepts closed rings (repeated closing vertex) or open ones (split
    pieces — the cut kernel omits the closing vertex): an open ring is
    closed up front. Feeding an open ring to the closed-form splitter
    directly would both treat the real last vertex as the closure
    duplicate (truncating it) and skip genuine crossings between the
    first and last explicit edges as 'adjacent through closure'."""
    if len(xs) > MAX_REPAIR_POINTS:
        return None
    if xs[0] != xs[-1] or ys[0] != ys[-1]:
        xs = list(xs) + [xs[0]]
        ys = list(ys) + [ys[0]]
    pieces = [
        (rx, ry, geom.signed_area2(np.asarray(rx), np.asarray(ry)))
        for rx, ry in _split_simple(list(xs), list(ys))
    ]
    pieces = [p for p in pieces if p[2] != 0.0]
    if not pieces:
        return None
    total = sum(p[2] for p in pieces)
    s = 1.0 if total == 0.0 else np.sign(total)
    cands = [p for p in pieces if np.sign(p[2]) == s]
    # union absorb: a candidate strictly inside another candidate merges away
    kept = []
    # one O(total-vertices) set per candidate instead of a nested
    # all()-generator scan (round-3 ADVICE: the nested form was ~n² tuple
    # comparisons per candidate — quadratic in MAX_REPAIR_POINTS)
    all_pts = [
        {(ox[m], oy[m]) for m in range(len(ox) - 1)} for ox, oy, _oa in cands
    ]
    for idx, (rx, ry, _a) in enumerate(cands):
        inside_other = False
        others: set = set()
        for oi, pts in enumerate(all_pts):
            if oi != idx:
                others |= pts
        probe_x, probe_y = None, None
        for k in range(len(rx) - 1):
            if (rx[k], ry[k]) not in others:
                probe_x, probe_y = rx[k], ry[k]
                break
        if probe_x is None:
            probe_x = float(np.mean(rx[:-1]))
            probe_y = float(np.mean(ry[:-1]))
        for oi, (ox, oy, _oa) in enumerate(cands):
            if oi == idx:
                continue
            if geom.points_in_ring(
                np.array([probe_x]), np.array([probe_y]), np.asarray(ox), np.asarray(oy)
            )[0]:
                inside_other = True
                break
        if not inside_other:
            kept.append((rx, ry))
    if len(kept) != 1:
        return None
    rx, ry = kept[0]
    # GEOS buffer(0) emits canonical orientation (CW shells in the
    # reference's post-reversal frame); our repair runs PRE-reversal, so
    # normalize the kept lobe to OSM orientation (CCW = land-left) — the
    # later OSM→GIS reversal then yields a CW shell and fix_direction does
    # NOT warn (invalid-self-intersection-on-open-ring.sh caps warnings
    # at 2: intersection + questionable, no 'direction').
    if geom.signed_area2(np.asarray(rx), np.asarray(ry)) < 0:
        rx, ry = rx[::-1], ry[::-1]
    return rx, ry


def buffer0_triage(
    rings: DataFrame, cell_deg: float = 0.5, crossing_ids: DataFrame | None = None
) -> DataFrame:
    """Filter/repair polygonizable rings before polygonization.

    Input/output columns: ring_id, node_ids, xs, ys, nways, fixed, lead,
    npoints. Clean rings stream through a pure-Catalyst anti-join; only
    flagged rings pay the Arrow repair batch. Pass `crossing_ids`
    (ring_id rows) to reuse an already-computed intersection join — the
    pipeline derives it from the same pass that feeds the 'intersection'
    error points, so the triage adds NO extra shuffle there.
    """
    # repeated-COORDINATE detection (not node ids): GEOS IsValid flags a
    # ring that touches itself at a point regardless of node identity —
    # two distinct nodes at one location (testdata's double_node) make the
    # polygon invalid in the reference's triage too. Subsumes the node-id
    # check: a repeated node id is necessarily a repeated coordinate.
    pts = F.arrays_zip("xs", "ys")
    degenerate_or_dup = F.size(pts) != F.size(F.array_distinct(pts)) + 1
    from osmcoastline_spark.operators.polygonize import _area2_expr

    zero_area = _area2_expr("xs", "ys") == 0.0
    if crossing_ids is None:
        crossing_ids = (
            ring_self_intersections(ring_segments(rings), cell_deg)
            .select("ring_id")
            .distinct()
        )
    else:
        crossing_ids = crossing_ids.select("ring_id").distinct()
    flagged_ids = (
        rings.filter(degenerate_or_dup | zero_area)
        .select("ring_id")
        .unionByName(crossing_ids)
        .distinct()
    )
    # checkpoint-then-count: the id set is tiny (usually empty) while `rings`
    # carries full coordinate arrays — deciding emptiness with one small job
    # avoids shuffling every array through the anti-join + an empty Arrow
    # stage in the clean case. Checkpointing BEFORE the count (round-5
    # ADVICE) means the dirty path doesn't run the flag/crossing DAG a
    # second time for the broadcast; the count on the checkpointed RDD is
    # an in-memory scan of a handful of rows.
    flagged_ids = flagged_ids.localCheckpoint(eager=True)
    n_flagged = flagged_ids.count()
    if n_flagged == 0:
        return rings
    flagged_ids = F.broadcast(flagged_ids)
    clean = rings.join(flagged_ids, "ring_id", "left_anti")
    flagged = rings.join(flagged_ids, "ring_id", "left_semi")

    cols = ["ring_id", "node_ids", "xs", "ys", "nways", "fixed", "lead", "npoints"]
    out_schema = (
        "ring_id long, node_ids array<long>, xs array<double>, ys array<double>, "
        "nways int, fixed boolean, lead long, npoints int"
    )

    def repair_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.to_dict("records"):
                fixed_ring = buffer0_repair(list(r["xs"]), list(r["ys"]))
                if fixed_ring is None:
                    continue  # silent drop, reference parity
                rx, ry = fixed_ring
                rows.append(
                    {
                        "ring_id": r["ring_id"],
                        "node_ids": [0] * len(rx),
                        "xs": rx,
                        "ys": ry,
                        "nways": r["nways"],
                        "fixed": r["fixed"],
                        "lead": r["lead"],
                        "npoints": len(rx),
                    }
                )
            if rows:  # yielding nothing is fine; an empty untyped frame
                yield pd.DataFrame(rows, columns=cols)  # breaks Arrow casts

    repaired = flagged.select(*cols).mapInPandas(repair_batch, out_schema)
    return clean.select(*cols).unionByName(repaired)


def check_polygons(
    polys: DataFrame,
    cell_deg: float = 0.5,
    suspect_col: str | None = None,
    crossing_scan: bool = True,
) -> tuple[DataFrame, int]:
    """Post-split validity pass (reference src/coastline_polygons.cpp:444-467
    check_polygons, called from src/osmcoastline.cpp:398-399 AFTER the
    optional split): every invalid polygon counts ONE warning and gets a
    Buffer(0) repair attempt; if the repair does not yield a single
    polygon it is dropped silently (stderr-only in the reference).

    Validity here is shell-level (self-crossing via the distributed
    cell-binned kernel, repeated vertex, zero area) — the axis-parallel
    split cuts can only introduce invalidity on the cut shell, never new
    hole-vs-shell conflicts, and hole validity was already established
    before polygonization (buffer0_triage). Clean polygons stream through
    a pure-Catalyst anti-join; only flagged polygons pay the Arrow batch.

    Shells may be closed (polygonize output) or open (split pieces — the
    cut kernel emits rings without the repeated closing vertex); the
    repeated-vertex and shoelace predicates account for both.

    `suspect_col` (a boolean column, e.g. split's `cut_suspect`) is the
    scale lever: a transversal cut of a simple ring produces simple pieces
    by construction (see geom.cut_ring_checked), so the distributed
    crossing kernel only needs to run over rows where the column is true —
    in the common all-clean case this whole pass is ONE small aggregate
    job. Without it, `crossing_scan` toggles the full kernel over every
    row (exhaustive mode, used by unit tests and the no-split pipeline
    branch where inputs are already triage-validated).

    Returns (checked_polys, warning_count); all input columns preserved.
    """
    from osmcoastline_spark.operators.polygonize import _area2_expr

    closed = (
        F.element_at("shell_x", 1) == F.element_at("shell_x", -1)
    ) & (F.element_at("shell_y", 1) == F.element_at("shell_y", -1))
    pts = F.arrays_zip("shell_x", "shell_y")
    degenerate = F.size("shell_x") != F.size(F.array_distinct(pts)) + F.when(
        closed, F.lit(1)
    ).otherwise(F.lit(0))
    # shoelace needs the wraparound term when the closing vertex is absent
    wrap = (
        F.element_at("shell_x", -1) * F.element_at("shell_y", 1)
        - F.element_at("shell_x", 1) * F.element_at("shell_y", -1)
    )
    area2 = _area2_expr("shell_x", "shell_y") + F.when(
        closed, F.lit(0.0)
    ).otherwise(wrap)
    base_flag = degenerate | (area2 == 0.0)

    cross_src = None
    n_base = None
    if suspect_col is not None:
        needs_kernel = F.col(suspect_col) & ~base_flag
        agg = polys.agg(
            F.sum(base_flag.cast("long")).alias("nb"),
            F.sum(needs_kernel.cast("long")).alias("ns"),
        ).collect()[0]
        n_base, n_susp = int(agg["nb"] or 0), int(agg["ns"] or 0)
        if n_base == 0 and n_susp == 0:
            return polys, 0
        if n_susp:
            cross_src = polys.filter(needs_kernel)
    elif crossing_scan:
        cross_src = polys

    base_ids = polys.filter(base_flag).select("poly_id")
    if cross_src is not None:
        # close OPEN shells before segment extraction: ring_segments emits
        # consecutive edges only, so without the appended closing vertex a
        # crossing involving the implicit last→first bridge edge (which
        # for split pieces runs along the cut line) would never be scanned
        shells = cross_src.select(
            F.col("poly_id").alias("ring_id"),
            F.when(closed, F.col("shell_x"))
            .otherwise(F.concat("shell_x", F.slice("shell_x", 1, 1)))
            .alias("xs"),
            F.when(closed, F.col("shell_y"))
            .otherwise(F.concat("shell_y", F.slice("shell_y", 1, 1)))
            .alias("ys"),
        )
        crossing_ids = (
            ring_self_intersections(ring_segments(shells), cell_deg)
            .select(F.col("ring_id").alias("poly_id"))
            .distinct()
        )
        flagged_ids = (
            base_ids.unionByName(crossing_ids).distinct().localCheckpoint(eager=True)
        )
        warnings = flagged_ids.count()
    else:
        flagged_ids = base_ids.localCheckpoint(eager=True)
        warnings = n_base if n_base is not None else flagged_ids.count()
    if warnings == 0:
        return polys, 0

    clean = polys.join(flagged_ids, "poly_id", "left_anti")
    flagged = polys.join(flagged_ids, "poly_id", "left_semi")
    schema = flagged.schema
    colnames = [f.name for f in schema.fields]

    def repair_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.to_dict("records"):
                rep = buffer0_repair(list(r["shell_x"]), list(r["shell_y"]))
                if rep is None:
                    continue  # silent drop, reference parity
                rx, ry = rep
                # post-fix_direction shells are CW (GIS frame);
                # buffer0_repair normalizes to CCW — flip back
                rx, ry = rx[::-1], ry[::-1]
                r["shell_x"], r["shell_y"] = list(rx), list(ry)
                r["npoints"] = len(rx)
                r["env_minx"], r["env_maxx"] = min(rx), max(rx)
                r["env_miny"], r["env_maxy"] = min(ry), max(ry)
                rows.append(r)
            if rows:
                yield pd.DataFrame(rows, columns=colnames)

    repaired = flagged.mapInPandas(repair_batch, schema)
    return clean.unionByName(repaired), warnings
