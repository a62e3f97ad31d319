"""The full osmcoastline DAG (reference src/osmcoastline.cpp:177-440, §3.1 of
SURVEY.md) as one orchestrated Spark job.

Ordering constraints preserved: intersections before gap closing (closing
segments never appear in the segment dump); fix_direction before transform
(winding checked in 4326); questionable before split, 4326 only; water
derivation consumes the *split* land polygons.

Warning/error accounting matches the reference:
  warnings: intersections+overlaps, output_rings routing, turned-around
            polygons, questionable rings
  errors:   fixed rings, unconnected nodes after closing, 'No polygons
            created!' (+1)
  exit:     2 if errors or warnings > 500; 1 if warnings; else 0
            (src/osmcoastline.cpp:70,428-439)

GEOS-free geometry (all pure numpy): IsValid/Buffer(0) are implemented as
the cell-binned self-intersection kernel + the numpy Buffer(0) equivalent
in operators/repair.py, applied BOTH pre-polygonize (buffer0_triage,
reference add_polygons_to_vector) and post-split (check_polygons,
reference coastline_polygons.cpp:444-467). Known deviations:
  * check_polygons validity is shell-level (the axis-parallel split cuts
    cannot introduce new hole-vs-shell conflicts); GEOS IsValid also
    re-checks hole nesting.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmcoastline_spark import geom
from osmcoastline_spark.operators.antarctica import close_antarctica_ring
from osmcoastline_spark.operators.close import close_rings
from osmcoastline_spark.operators.filter import coastline_ways, tagged_node_errors
from osmcoastline_spark.operators.intersections import (
    duplicate_segment_counts,
    duplicate_segments,
    intersection_pairs,
    ring_segments,
    ring_self_intersections,
)
from osmcoastline_spark.operators.repair import buffer0_triage, check_polygons
from osmcoastline_spark.operators.lines import rings_to_lines
from osmcoastline_spark.operators.locations import (
    ways_with_locations,
    ways_with_locations_from_refs,
)
from osmcoastline_spark.operators.polygonize import fix_direction, polygonize
from osmcoastline_spark.operators.questionable import questionable_rings
from osmcoastline_spark.operators.rings import assemble_rings, route_rings
from osmcoastline_spark.operators.split import split_polygons
from osmcoastline_spark.operators.water import drop_antimeridian_slivers, water_polygons
from osmcoastline_spark.util import run_concurrently
from osmcoastline_spark.schemas import (
    DEFAULT_BBOX_OVERLAP_3857,
    DEFAULT_BBOX_OVERLAP_4326,
    DEFAULT_CLOSE_DISTANCE,
    DEFAULT_MAX_POINTS_IN_POLYGON,
    ERROR_LINES_SCHEMA,
    ERROR_POINTS_SCHEMA,
    EXTENT_3857,
    EXTENT_4326,
    MAX_WARNINGS,
)


@dataclass
class Options:
    epsg: int = 4326
    close_distance: float = DEFAULT_CLOSE_DISTANCE
    max_points_in_polygon: int = DEFAULT_MAX_POINTS_IN_POLYGON
    bbox_overlap: float | None = None
    split_large_polygons: bool = True
    output_rings: bool = False
    output_lines: bool = False
    output_polygons: str = "land"  # land | water | both | none
    water_cell_deg: float = 1.0
    cell_deg: float = 0.5  # intersection-join binning
    collect_stats: bool = True  # False skips non-essential count actions

    def effective_overlap(self) -> float:
        if self.bbox_overlap is not None:
            return self.bbox_overlap
        return DEFAULT_BBOX_OVERLAP_4326 if self.epsg == 4326 else DEFAULT_BBOX_OVERLAP_3857


@dataclass
class PipelineResult:
    tables: dict = field(default_factory=dict)  # name -> DataFrame
    stats: dict = field(default_factory=dict)
    warnings: int = 0
    errors: int = 0
    persisted: list = field(default_factory=list)  # frames pinned for reuse

    def unpersist(self) -> None:
        """Release cached frames (call between repeated in-session runs —
        cache entries are plan-keyed and never GC'd on their own)."""
        for df in self.persisted:
            try:
                df.unpersist()
            except Exception:
                pass
        self.persisted.clear()

    @property
    def exit_code(self) -> int:
        if self.errors or self.warnings > MAX_WARNINGS:
            return 2
        if self.warnings:
            return 1
        return 0




from osmcoastline_spark.util import aslist as _aslist


def _empty(spark: SparkSession, schema):
    return spark.createDataFrame([], schema)


# one shared driver thread for the overlapped error-category count (the
# submit sites never queue more than one task per pipeline run)
from concurrent.futures import ThreadPoolExecutor as _TPE

_acct_pool = _TPE(max_workers=2)


def _count_error_categories(error_points: list, error_lines: list) -> list:
    """One pruned aggregate over both error-table union lineages: rows of
    (kind 'p'|'l', error, count). Counting only touches the `error`
    column, so Catalyst prunes every coordinate array out of the plan."""
    ep = error_points[0]
    for df in error_points[1:]:
        ep = ep.unionByName(df)
    el = error_lines[0]
    for df in error_lines[1:]:
        el = el.unionByName(df)
    return (
        ep.select(F.lit("p").alias("kind"), "error")
        .unionByName(el.select(F.lit("l").alias("kind"), "error"))
        .groupBy("kind", "error")
        .count()
        .collect()
    )


def _transform_polygons_3857(polys: DataFrame) -> DataFrame:
    """G11: closed-form WebMercator. The whole Arrow batch transforms in
    ONE numpy call per coordinate axis: ragged shell/hole arrays are
    flattened with np.concatenate, transformed, and split back by the
    recorded lengths — no per-row Python in the kernel."""
    import numpy as np

    def tx(it):
        for pdf in it:
            n = len(pdf)
            if n == 0:
                yield pdf
                continue
            shell_lens = pdf["shell_x"].map(len).to_numpy()
            flat_sx = np.concatenate([np.asarray(v, dtype=np.float64) for v in pdf["shell_x"]])
            flat_sy = np.concatenate([np.asarray(v, dtype=np.float64) for v in pdf["shell_y"]])
            hole_rows = [list(map(list, _aslist(v))) for v in pdf["holes_x"]]
            hole_rows_y = [list(map(list, _aslist(v))) for v in pdf["holes_y"]]
            hole_lens = [[len(h) for h in hr] for hr in hole_rows]
            flat_hx = np.concatenate(
                [np.asarray(h, dtype=np.float64) for hr in hole_rows for h in hr]
                or [np.empty(0)]
            )
            flat_hy = np.concatenate(
                [np.asarray(h, dtype=np.float64) for hr in hole_rows_y for h in hr]
                or [np.empty(0)]
            )
            env_x = np.concatenate([pdf["env_minx"].to_numpy(), pdf["env_maxx"].to_numpy()])
            env_y = np.concatenate([pdf["env_miny"].to_numpy(), pdf["env_maxy"].to_numpy()])

            tsx, tsy = geom.merc_forward(flat_sx, flat_sy)
            thx, thy = geom.merc_forward(flat_hx, flat_hy)
            tex, tey = geom.merc_forward(env_x, env_y)

            out = pdf.copy()
            cuts = np.cumsum(shell_lens)[:-1]
            out["shell_x"] = [a.tolist() for a in np.split(tsx, cuts)]
            out["shell_y"] = [a.tolist() for a in np.split(tsy, cuts)]
            hx_out, hy_out, pos = [], [], 0
            for lens in hole_lens:
                row_hx, row_hy = [], []
                for ln in lens:
                    row_hx.append(thx[pos : pos + ln].tolist())
                    row_hy.append(thy[pos : pos + ln].tolist())
                    pos += ln
                hx_out.append(row_hx)
                hy_out.append(row_hy)
            out["holes_x"] = hx_out
            out["holes_y"] = hy_out
            out["env_minx"], out["env_maxx"] = tex[:n], tex[n:]
            out["env_miny"], out["env_maxy"] = tey[:n], tey[n:]
            yield out

    return polys.mapInPandas(tx, polys.schema)


def _meta_tables(spark: SparkSession, opt: Options, res: PipelineResult, t0: float) -> None:
    """S8 — the reference's `options` + 11-column `meta` SQLite tables
    (src/output_database.cpp:66-80,113-136) as one-row DataFrames."""
    import datetime
    import resource
    import time

    res.tables["options"] = spark.createDataFrame(
        [(
            float(opt.effective_overlap()),
            float(opt.close_distance),
            int(opt.max_points_in_polygon),
            int(bool(opt.split_large_polygons)),
        )],
        "overlap double, close_distance double, max_points_in_polygons int, "
        "split_large_polygons int",
    )
    s = res.stats
    res.tables["meta"] = spark.createDataFrame(
        [(
            datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%M:%S"),
            int(time.time() - t0),
            int(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024),
            int(s.get("ways", 0)),
            int(s.get("unconnected_nodes", 0)),
            int(s.get("rings", 0)),
            int(s.get("rings_from_single_way", 0)),
            int(s.get("rings_fixed", 0)),
            int(s.get("rings_turned_around", 0)),
            int(s.get("land_polygons_before_split", 0)),
            int(s.get("land_polygons_after_split", 0)),
        )],
        "timestamp string, runtime int, memory_usage int, num_ways int, "
        "num_unconnected_nodes int, num_rings int, num_rings_from_single_way int, "
        "num_rings_fixed int, num_rings_turned_around int, "
        "num_land_polygons_before_split int, num_land_polygons_after_split int",
    )


def run_pipeline(
    spark: SparkSession,
    nodes: DataFrame,
    ways: DataFrame,
    options: Options | None = None,
    mid_sink=None,
    preassembled: tuple | None = None,
    prebucketed: tuple | None = None,
) -> PipelineResult:
    """`mid_sink` (a CheckpointSink) commits rings_closed/rings_open
    snapshots right after R1 assembly — the finer-grained resume point;
    `preassembled` = (closed_df, open_df, pre_stats) restarts the pipeline
    FROM those snapshots, skipping filter/locations/assembly entirely.

    `prebucketed` = (refs_df, nodes_df): run the J2 location join off
    bucket-hashed source tables (sources.tables.write_bucketed — refs are
    the already-coastline-filtered exploded (way_id, pos, node_id) rows)
    so the planet-sized node side joins with ZERO shuffle; `ways`/`nodes`
    args are then only used for the tagged-node error scan."""
    import time as _time

    t0 = _time.time()
    opt = options or Options()
    res = PipelineResult()

    # env-gated stage trace (SPARK_GRAFT_TRACE=1): prints elapsed time
    # between action boundaries — the profiling hook behind the bench
    # regression work; zero cost when off
    if os.environ.get("SPARK_GRAFT_TRACE"):
        _st = spark.sparkContext.statusTracker()
        _last = [t0, len(_st.getJobIdsForGroup(None) or [])]

        def _trace(label: str) -> None:
            now = _time.time()
            nj = len(_st.getJobIdsForGroup(None) or [])
            print(
                f"[pipeline] {label:22s} {now - _last[0]:7.2f}s"
                f"  +{nj - _last[1]} jobs",
                flush=True,
            )
            _last[0], _last[1] = now, nj
    else:
        def _trace(label: str) -> None:
            pass

    error_points = [tagged_node_errors(nodes)]
    error_lines = [_empty(spark, ERROR_LINES_SCHEMA)]
    acct_future = None
    acct_sig = None

    if preassembled is not None:
        closed, open_, pre_stats = preassembled
        res.stats.update(pre_stats)
        n_closed_pre = None
        if opt.collect_stats:
            # a snapshot written with collect_stats=False has no stats_pre
            # (round-3 ADVICE): recompute the missing counts from the
            # loaded rings instead of silently reporting 0 in `meta`.
            # `ways` = distinct ways across both ring sets (cheap explode
            # over the snapshot, no node join).
            if "rings_from_single_way" not in res.stats:
                res.stats["rings_from_single_way"] = closed.filter(
                    F.col("nways") == 1
                ).count()
            if "unconnected_nodes_before_close" not in res.stats:
                res.stats["unconnected_nodes_before_close"] = open_.count() * 2
            if "ways" not in res.stats:
                res.stats["ways"] = int(
                    closed.select(F.sum("nways")).first()[0] or 0
                ) + int(open_.select(F.sum("nways")).first()[0] or 0)
    else:
        # pass 1+2: filter, locations — the location join materializes ONCE
        # here; the J3 missing-location check is a tiny aggregate over the
        # materialized result (round 1 paid a second full explode+join)
        if prebucketed is not None:
            refs_b, nodes_b = prebucketed
            # loud-fail contract check: refs must be the EXPLODED
            # (way_id, pos, node_id) layout from sources.tables.ways_refs —
            # a caller handing us the raw ways table (node_ids array, tags)
            # would otherwise silently process non-coastline ways
            _refs_cols = set(refs_b.columns)
            if not {"way_id", "node_id"}.issubset(_refs_cols) or "node_ids" in _refs_cols or "tags" in _refs_cols:
                raise ValueError(
                    "prebucketed refs must be the exploded (way_id, pos, node_id) "
                    f"table (coastline-filtered, see sources.tables.ways_refs); got columns {sorted(_refs_cols)}"
                )
            if not {"node_id", "lon", "lat"}.issubset(set(nodes_b.columns)):
                raise ValueError(
                    f"prebucketed nodes must carry (node_id, lon, lat); got columns {sorted(nodes_b.columns)}"
                )
            if opt.collect_stats:
                # counted from the exploded refs: a way with ZERO node refs
                # has no exploded rows, so this can undercount vs the
                # standard path's cways.count() for degenerate ways (which
                # the reference never produces — coastline ways always
                # reference >=2 nodes). Documented divergence, not a bug.
                res.stats["ways"] = refs_b.select("way_id").distinct().count()
            ways_loc = ways_with_locations_from_refs(
                refs_b, nodes_b, count_missing=True
            ).localCheckpoint(eager=True)
        else:
            cways = coastline_ways(ways)
            if opt.collect_stats:
                # the ways count and the location-join materialization are
                # independent DAGs over the same checkpointed inputs — run
                # them concurrently so the count hides inside the join's
                # wall time instead of paying its own job floor first
                n_ways, ways_loc = run_concurrently(
                    cways.count,
                    lambda: ways_with_locations(
                        cways, nodes, count_missing=True
                    ).localCheckpoint(eager=True),
                )
                res.stats["ways"] = n_ways
            else:
                ways_loc = ways_with_locations(
                    cways, nodes, count_missing=True
                ).localCheckpoint(eager=True)
        missing = ways_loc.agg(F.sum("nmiss")).first()[0] or 0
        if missing:
            res.stats["missing_locations"] = int(missing)
            res.errors += 1
            _meta_tables(spark, opt, res, t0)
            return res
        ways_loc = ways_loc.drop("nmiss")
        _trace("locations")

        # R1 assembly (input already materialized — no second checkpoint).
        # The ways count — when collected — is an exact upper bound on the
        # chain count (one chain per way), letting assembly skip its
        # round-0 count job whenever the driver finish provably applies.
        closed, open_ = assemble_rings(
            ways_loc,
            assume_materialized=True,
            max_chains_hint=res.stats.get("ways") if opt.collect_stats else None,
        )
        n_closed_pre = None
        if opt.collect_stats:
            # three independent floor-priced count jobs — overlap them; the
            # post-assembly closed count feeds stats["rings"] ARITHMETICALLY
            # (closed-after-close = closed-now + antarctica + gap-close
            # merges, all driver-known) so the later dedicated count job
            # disappears (round 6)
            n1, n2, n_closed_pre = run_concurrently(
                closed.filter(F.col("nways") == 1).count,
                open_.count,
                closed.count,
            )
            res.stats["rings_from_single_way"] = n1
            res.stats["unconnected_nodes_before_close"] = n2 * 2
        if mid_sink is not None:
            pre = {
                k: res.stats[k]
                for k in ("ways", "rings_from_single_way", "unconnected_nodes_before_close")
                if k in res.stats
            }
            extra = getattr(mid_sink, "run_lineage", {})
            mid_sink.write("rings_closed", closed, lineage={"stats_pre": pre, **extra})
            mid_sink.write("rings_open", open_, lineage={"stats_pre": pre, **extra})
        _trace("assemble")

    # J5/J6 intersections & overlaps (before closing!)
    # checkpoint: segs feeds duplicates, intersections, the orphan filter
    # and the output table — without it the explode re-executes 4×
    segs = ring_segments(closed.unionByName(open_)).localCheckpoint(eager=True)
    _trace("segments")
    # ONE duplicate-segment aggregation shared by the overlap error lines
    # and the gap-close orphan filter (persist: the orphan checkpoint
    # materializes it first, the error accounting reads the cache)
    dup_counts = duplicate_segment_counts(segs).persist()
    res.persisted.append(dup_counts)
    overlaps = duplicate_segments(segs, dup=dup_counts)
    # This pre-close intersection join feeds ONLY the 'intersection' error
    # points (reference parity: those are reported on the raw segment set,
    # src/osmcoastline.cpp:340-352). The G5 validity triage ids are
    # computed POST-close below — gap closing merges rings (new ring_id =
    # min member) and adds closure segments, so pre-close ids would both
    # miss new self-crossings and name rings that no longer exist
    # (round-3 ADVICE fix).
    # the checkpoint (cell-binned self-join + exact Arrow kernel — the
    # longest independent computation in this phase) runs on a driver
    # thread UNDER the Antarctica/gap-close block below, which only needs
    # segs/dup_counts; the result is joined right before its first
    # consumer. The 'intersection' error points slot into the error list
    # at this position (recorded index) so union order is unchanged.
    ipairs_future = _acct_pool.submit(
        lambda: intersection_pairs(segs, opt.cell_deg).localCheckpoint(eager=True)
    )
    error_lines.append(overlaps)
    isects_pos = len(error_points)
    res.tables["segments"] = segs

    # G12 Antarctica — its detection aggregate and the duplicate-segment
    # count the gap-close block needs are independent single jobs over
    # already-checkpointed frames: overlap them (guide §2.6)
    if opt.close_distance > 0:
        (open_, found), n_dup_keys = run_concurrently(
            lambda: close_antarctica_ring(open_, opt.epsg), dup_counts.count
        )
    else:
        open_, found = close_antarctica_ring(open_, opt.epsg)
        n_dup_keys = None
    res.stats["antarctica_closed"] = found
    # rings whose GEOMETRY is new or changed after this point (Antarctica
    # closure, gap-close merges) — the incremental post-close validity
    # pass below re-runs the self-intersection kernel only on these
    changed_ring_ids: list = []
    n_closed_delta = 0  # rings closed after assembly (driver-known)
    if found:
        n_closed_delta += 1
        # only the Antarctica ring can have closed — skip the filter/union
        # replumbing entirely on the (common) no-Antarctica input
        newly = open_.filter(
            F.element_at("node_ids", 1) == F.element_at("node_ids", -1)
        )
        closed = closed.unionByName(newly.select(*closed.columns))
        open_ = open_.filter(
            F.element_at("node_ids", 1) != F.element_at("node_ids", -1)
        )
        changed_ring_ids.append(newly.select("ring_id"))

    # R2 gap closing. Open rings ENTIRELY made of duplicated segments are
    # leftover duplicate-way artifacts — the reference orphans them via its
    # endpoint-map overwrite semantics (see invalid-duplicate-segments-1);
    # we detect them explicitly and exclude them from closing.
    if opt.close_distance > 0:
        # n_dup_keys was materialized concurrently with the Antarctica
        # aggregate above — if the input has no duplicate segments at all
        # (the common healthy-data case) the whole orphan-detection branch
        # (explode + semi-join + two groupBys + an eager checkpoint, ~5
        # driver-floor jobs) is provably a no-op and is skipped; the count
        # also pre-fills the dup_counts cache that the overlap error lines
        # read later either way
        if n_dup_keys:
            open_segs = ring_segments(open_)
            dup_keys = dup_counts.drop("k")
            per_ring = open_segs.groupBy("ring_id").agg(F.count("*").alias("ntot"))
            dup_per_ring = (
                open_segs.join(dup_keys, ["x1", "y1", "x2", "y2"], "left_semi")
                .groupBy("ring_id")
                .agg(F.count("*").alias("ndup"))
            )
            # tiny id set, but its lineage (global duplicate-segment groupBy
            # + two joins) would otherwise re-execute for every consumer:
            # the close count, the endpoint collect, the orphan semi-join
            # and the merged checkpoint — four evaluations without this pin
            orphan_ids = (
                per_ring.join(dup_per_ring, "ring_id")
                .filter(F.col("ndup") == F.col("ntot"))
                .select("ring_id")
                .localCheckpoint(eager=True)
            )
            orphans = open_.join(orphan_ids, "ring_id", "left_semi")
            active = open_.join(orphan_ids, "ring_id", "left_anti")
        else:
            orphans = None
            active = open_
        merged, cres = close_rings(active, opt.close_distance)
        if orphans is not None:
            merged = merged.unionByName(orphans)
        merged = merged.localCheckpoint(eager=True)
        res.stats["rings_fixed"] = cres.fixed_rings
        res.stats["unconnected_nodes"] = cres.unconnected_nodes
        res.errors += cres.fixed_rings + cres.unconnected_nodes
        if cres.error_points:
            error_points.append(spark.createDataFrame(cres.error_points, ERROR_POINTS_SCHEMA))
        if cres.error_lines:
            error_lines.append(spark.createDataFrame(cres.error_lines, ERROR_LINES_SCHEMA))
        now_closed = merged.filter(F.element_at("node_ids", 1) == F.element_at("node_ids", -1))
        closed = closed.unionByName(now_closed.select(*closed.columns))
        open_ = merged.filter(F.element_at("node_ids", 1) != F.element_at("node_ids", -1))
        n_closed_delta += len(cres.closed_group_ids)
        if cres.closed_group_ids:
            # the planner already knows exactly which output ring_ids
            # closed — a tiny driver-built frame replaces re-deriving the
            # set from the merged checkpoint (same ids, one less filter +
            # distinct lineage in the validity joins below)
            changed_ring_ids.append(
                spark.createDataFrame(
                    [(int(i),) for i in cres.closed_group_ids], "ring_id long"
                )
            )
    if opt.collect_stats:
        if n_closed_pre is not None:
            # exact arithmetic: post-close closed set = post-assembly closed
            # set (counted concurrently with the other assembly stats) plus
            # the driver-known closures (Antarctica + gap-close groups) —
            # no dedicated count job
            res.stats["rings"] = n_closed_pre + n_closed_delta
        else:
            res.stats["rings"] = closed.count()
    _trace("close+rings_count")

    # join the background intersection checkpoint (launched above) and
    # slot its error points into their original union position
    ipairs = ipairs_future.result()
    error_points.insert(
        isects_pos,
        ipairs.select(
            F.lit(0).cast("long").alias("osm_id"),
            F.lit("intersection").alias("error"),
            "x",
            "y",
        ),
    )
    _trace("ipairs_join")

    routed = route_rings(closed)

    # G5 self-intersection detection on the FINAL (post-close) rings: one
    # result shared by the rings-output error points, the rings.valid
    # column and the Buffer(0) triage — matching the reference, which runs
    # IsValid on the rings as they are polygonized
    # (src/coastline_ring_collection.cpp:148-168), i.e. after closing.
    # Computed INCREMENTALLY: self-intersection is a per-ring property, so
    # rings untouched by closing keep their pre-close result (the same-ring
    # pairs already materialized in `ipairs` for the error points — zero
    # extra kernel work), and the cell-binned kernel re-runs only on the
    # small set of closure-created/merged rings. Bit-equal to a full
    # post-close pass at a fraction of the cost.
    si_first = None
    if opt.output_rings or opt.output_polygons != "none" or opt.output_lines:
        pring = routed["polygonizable"]
        si_base = ipairs.filter(F.col("a_ring") == F.col("b_ring")).select(
            F.col("a_ring").alias("ring_id"), "x", "y"
        ).join(pring.select("ring_id"), "ring_id", "left_semi")
        if changed_ring_ids:
            # no checkpoint: the id set is either driver-built (gap-close
            # groups) or a filter over a checkpointed frame (Antarctica) —
            # re-evaluating it for the semi+anti join pair is cheaper than
            # one more eager-checkpoint job on the driver's ~0.2 s/job floor
            changed_ids = changed_ring_ids[0]
            for df in changed_ring_ids[1:]:
                changed_ids = changed_ids.unionByName(df)
            changed_ids = changed_ids.distinct()
            si_pre = si_base.join(changed_ids, "ring_id", "left_anti")
            si_new = ring_self_intersections(
                ring_segments(pring.join(changed_ids, "ring_id", "left_semi")),
                opt.cell_deg,
            )
            si_points = si_pre.unionByName(si_new)
        else:
            # nothing closed after assembly: every polygonizable ring kept
            # its pre-close geometry, so the pre-computed ipairs rows ARE
            # the complete self-intersection set (same output, minus the
            # empty incremental-kernel branch and its join/Arrow stages)
            si_points = si_base
        if opt.output_rings:
            # GEOS IsValid is also false for a ring touching itself at a
            # POINT (repeated coordinate, e.g. two nodes at one location)
            # and GEOSisValidReason reports "Ring Self-intersection[x y]"
            # there (reference output_database.cpp:169-211) — include
            # those in the rings-mode invalid set + error points. The
            # polygons path doesn't need this scan: buffer0_triage
            # detects repeated coordinates with a shuffle-free Catalyst
            # predicate.
            interior = F.slice(F.arrays_zip("xs", "ys"), 1, F.size("xs") - 1)
            dup_pts = (
                pring.select("ring_id", F.explode(interior).alias("pt"))
                .groupBy(
                    "ring_id",
                    F.col("pt.xs").alias("x"),
                    F.col("pt.ys").alias("y"),
                )
                .agg(F.count("*").alias("k"))
                .filter(F.col("k") > 1)
                .select("ring_id", "x", "y")
            )
            si_points = si_points.unionByName(dup_pts)
        if opt.output_rings:
            # rings mode needs one (min x, y) crossing POINT per invalid
            # ring for the error table — build the per-ring min aggregate
            # and pin it (3 consumers: error points, rings.valid, triage)
            si_first = si_points.groupBy("ring_id").agg(
                F.min(F.struct("x", "y")).alias("p")
            ).localCheckpoint(eager=True)
            crossing_ids = si_first.select("ring_id")
        else:
            # polygons-only: the triage consumes only the ID SET of
            # crossing rings (it dedups internally) — skip the min-point
            # groupBy exchange entirely (round 6)
            crossing_ids = si_points.select("ring_id")
        _trace("validity")

    if opt.output_rings:
        # routing: single_point / not_a_ring / not_closed (+end_point);
        # warnings derived from the final error-category counts in one pass
        sp = routed["single_point"]
        nar = routed["not_a_ring"]
        error_points.append(
            sp.select(
                F.element_at("node_ids", 1).alias("osm_id"),
                F.lit("single_point_in_ring").alias("error"),
                F.element_at("xs", 1).alias("x"),
                F.element_at("ys", 1).alias("y"),
            )
        )
        error_lines.append(
            nar.select(
                F.col("ring_id").alias("osm_id"),
                F.lit("not_a_ring").alias("error"),
                F.reverse("xs").alias("xs"),
                F.reverse("ys").alias("ys"),
            )
        )
        error_points.append(
            nar.selectExpr(
                "element_at(node_ids, 1) as osm_id", "'not_a_ring' as error",
                "element_at(xs, 1) as x", "element_at(ys, 1) as y"
            ).unionByName(
                nar.selectExpr(
                    "element_at(node_ids, -1) as osm_id", "'not_a_ring' as error",
                    "element_at(xs, -1) as x", "element_at(ys, -1) as y"
                )
            )
        )
        error_lines.append(
            open_.select(
                F.col("ring_id").alias("osm_id"),
                F.lit("not_closed").alias("error"),
                F.reverse("xs").alias("xs"),
                F.reverse("ys").alias("ys"),
            )
        )
        error_points.append(
            open_.selectExpr(
                "element_at(node_ids, 1) as osm_id", "'end_point' as error",
                "element_at(xs, 1) as x", "element_at(ys, 1) as y"
            ).unionByName(
                open_.selectExpr(
                    "element_at(node_ids, -1) as osm_id", "'end_point' as error",
                    "element_at(xs, -1) as x", "element_at(ys, -1) as y"
                )
            )
        )
        # G13 + rings land/valid (reference src/output_database.cpp:59-64,
        # 165-221): `land` = exterior CW after the OSM→GIS reversal (i.e.
        # OSM orientation CCW ⇒ shoelace > 0); `valid` = the single-ring
        # polygon has no self-intersection — detected with the same exact
        # kernel as J5, restricted to same-ring pairs, standing in for
        # GEOS IsValid; one 'self_intersection' error point per invalid
        # ring at its first (min x,y) crossing, rings-output mode only.
        from osmcoastline_spark.operators.polygonize import _area2_expr

        pring = routed["polygonizable"]
        error_points.append(
            si_first.select(
                F.col("ring_id").alias("osm_id"),
                F.lit("self_intersection").alias("error"),
                F.col("p.x").alias("x"),
                F.col("p.y").alias("y"),
            )
        )
        res.tables["rings"] = (
            pring.join(si_first.select("ring_id", F.lit(1).alias("_inv")), "ring_id", "left")
            .select(
                F.col("ring_id").alias("osm_id"),
                "nways",
                "npoints",
                F.col("fixed").cast("int").alias("fixed"),
                (_area2_expr("xs", "ys") > 0).cast("int").alias("land"),
                F.when(F.col("_inv").isNotNull(), 0).otherwise(1).alias("valid"),
                "node_ids",
                "xs",
                "ys",
            )
        )

    if opt.output_polygons != "none" or opt.output_lines:
        # G5: each closed ring must form a valid polygon; invalid rings get
        # a Buffer(0)-equivalent repair attempt and drop SILENTLY otherwise
        # (reference add_polygons_to_vector,
        # src/coastline_ring_collection.cpp:148-168). When every ring drops,
        # "No polygons created!" becomes one error and the whole polygon
        # branch (lines/questionable/split/water) is skipped, matching the
        # reference's thrown runtime_error (osmcoastline.cpp:355-417).
        pg_in = routed["polygonizable"]
        polygonizable = buffer0_triage(
            pg_in, opt.cell_deg, crossing_ids=crossing_ids
        )
        if polygonizable is not pg_in:
            # repairs rewrote arrays — pin them; the clean identity return
            # rides the existing ring checkpoints (no third array write)
            polygonizable = polygonizable.localCheckpoint(eager=True)
        _trace("triage")
        pres = polygonize(polygonizable)
        res.errors += pres.invalid_count
        res.stats["invalid_polygons"] = pres.invalid_count
        error_lines.append(pres.invalid_error_lines)
        if pres.good_count == 0 and pres.invalid_count == 0:
            # reference throws when add_polygons_to_vector() returned no
            # ring polygons at all (osmcoastline.cpp:118-119) — every
            # triage-surviving ring lands in polygonize's good OR bad set,
            # so good+bad==0 is exactly "triage output empty", replacing
            # the isEmpty() pre-check (3-4 driver-floor jobs on an empty
            # frame). An all-invalid run (good=0, bad>0) is NOT this
            # error: the reference drops those polygons with errors++ and
            # continues with an empty vector.
            res.errors += 1  # "No polygons created!"
            res.stats["no_polygons"] = True
        else:
            polys = pres.polygons  # already a filter over polygonize's
            # internal checkpoint — re-checkpointing doubles the write
            if opt.collect_stats:
                res.stats["land_polygons_before_split"] = pres.good_count
            polys, direrr = fix_direction(polys)
            # fix_direction is a pure-Catalyst projection (conditional
            # reverse) over polygonize's fresh checkpoint — re-evaluating
            # it per consumer is cheaper than a second full array write
            error_lines.append(direrr)
            _trace("polygonize+fixdir")

            if opt.epsg != 4326:
                polys = _transform_polygons_3857(polys).localCheckpoint(eager=True)

            if opt.output_lines:
                res.tables["lines"] = rings_to_lines(
                    polys, opt.max_points_in_polygon, opt.epsg
                )

            if opt.output_polygons != "none":
                if opt.epsg == 4326:
                    all_rings = closed.unionByName(open_)
                    q = questionable_rings(all_rings, polys)
                    error_lines.append(q.select("osm_id", "error", "xs", "ys"))
                    _trace("questionable_plan")

                # error tables are COMPLETE here (split/check/water add
                # warnings as ints, never error rows) — launch the
                # accounting count in a driver thread so its wall time
                # hides under the split + check_polygons actions below
                # (round 6; the guard at the accounting site falls back to
                # a synchronous count if a future edit appends later)
                acct_sig = (len(error_points), len(error_lines))
                acct_future = _acct_pool.submit(
                    _count_error_categories, list(error_points), list(error_lines)
                )

                if opt.split_large_polygons and opt.max_points_in_polygon > 0:
                    polys = split_polygons(
                        polys,
                        opt.max_points_in_polygon,
                        opt.effective_overlap(),
                        opt.epsg,
                    )
                    if opt.collect_stats:
                        res.stats["land_polygons_after_split"] = polys.count()
                    _trace("split")

                    # reference check_polygons (src/osmcoastline.cpp:398-399
                    # → src/coastline_polygons.cpp:444-467): validity
                    # re-check after splitting — one warning per invalid
                    # polygon, Buffer(0) repair attempt, silent drop if
                    # unrepairable. Scanning only the split-produced pieces
                    # is exact: every input polygon passed the Buffer(0)
                    # triage (simple shell) and survived fix_direction /
                    # the strictly-monotonic 3857 transform, so cutting is
                    # the only step that can introduce invalidity — on
                    # unsplit polygons the reference's IsValid loop finds
                    # nothing by construction. Runs AFTER the SRS
                    # transform, so the binning cell size must be in
                    # OUTPUT units (meters for 3857 — degree-sized cells
                    # over mercator coords would explode the bbox cover).
                    cp_cell = opt.cell_deg * (
                        1.0 if opt.epsg == 4326 else EXTENT_3857[2] / 180.0
                    )
                    pieces = polys.filter("was_split").drop("was_split")
                    untouched = polys.filter(~F.col("was_split")).drop(
                        "was_split", "cut_suspect"
                    )
                    # cut_suspect (split's per-piece cut-degeneracy flag)
                    # limits the distributed crossing kernel to pieces whose
                    # cut could actually have produced a non-simple shell;
                    # the all-clean case costs ONE aggregate job
                    checked, cp_warnings = check_polygons(
                        pieces, cp_cell, suspect_col="cut_suspect"
                    )
                    polys = untouched.unionByName(checked.drop("cut_suspect"))
                    res.stats["invalid_polygons_after_split"] = cp_warnings
                    res.warnings += cp_warnings
                    if cp_warnings:
                        polys = polys.localCheckpoint(eager=True)
                    _trace("check_polygons")
                else:
                    # reference calls check_polygons unconditionally after the
                    # optional split (src/osmcoastline.cpp:398-399). With
                    # splitting off nothing has cut the shells since the
                    # coordinate-based Buffer(0) triage + polygonize validated
                    # them, so the distributed crossing kernel is provably
                    # redundant — run only the cheap column-level repeated-
                    # vertex / zero-area predicates (one aggregate job).
                    # Known deviation: a >MAX_REPAIR_POINTS ring that skipped
                    # triage repair could in principle carry a transversal
                    # crossing here undetected; the reference would warn.
                    checked, cp_warnings = check_polygons(
                        polys.withColumn("no_kernel", F.lit(False)),
                        suspect_col="no_kernel",
                    )
                    polys = checked.drop("no_kernel")
                    res.stats["invalid_polygons_after_split"] = cp_warnings
                    res.warnings += cp_warnings
                    if cp_warnings:
                        polys = polys.localCheckpoint(eager=True)

                own_cols = [c for c in polys.columns if c.startswith("own_")]
                if opt.output_polygons in ("land", "both"):
                    # the owned-region lineage (split.py) is internal to the
                    # even-odd water derivation — the land output keeps the
                    # reference's overlapping-piece shape and schema
                    res.tables["land_polygons"] = polys.drop(*own_cols)
                if opt.output_polygons in ("water", "both"):
                    # tile math runs in the OUTPUT SRS: the grid origin,
                    # cell size, and sliver threshold all scale with the
                    # extent (degree-space constants would generate ~4e7
                    # cells per mercator polygon)
                    extent = EXTENT_4326 if opt.epsg == 4326 else EXTENT_3857
                    water = water_polygons(
                        polys,
                        opt.water_cell_deg,
                        extent=extent,
                        unit_per_deg=1.0 if opt.epsg == 4326 else extent[2] / 180.0,
                    )
                    res.tables["water_polygons"] = drop_antimeridian_slivers(
                        water, max_x=extent[2] * (179.9999 / 180.0)
                    )
                    _trace("water_plan")

    ep = error_points[0]
    for df in error_points[1:]:
        ep = ep.unionByName(df)
    el = error_lines[0]
    for df in error_lines[1:]:
        el = el.unionByName(df)
    # single-JOB warning accounting: the exit-code contract only needs the
    # per-category COUNTS, and counting needs only the `error` column — so
    # one union-of-projections aggregate covers both tables (round 6;
    # previously two concurrent per-table count jobs whose ~18 AQE stage
    # jobs dominated the accounting span at sf0.1). The count runs BEFORE
    # persist() is registered so Catalyst prunes the coordinate arrays out
    # of the counting plan (no cache substitution forces a full-row
    # materialization); the persisted error tables then fill lazily on
    # their first real consumer (sink write) — same total work for CLI
    # runs, array-free accounting for everyone. When the polygon branch
    # launched the count early (overlapped with split/check), reuse its
    # result iff no error frame was appended since.
    if acct_future is not None and acct_sig == (len(error_points), len(error_lines)):
        counts = acct_future.result()
    else:
        counts = _count_error_categories(error_points, error_lines)
    epc = {r["error"]: r["count"] for r in counts if r["kind"] == "p"}
    elc = {r["error"]: r["count"] for r in counts if r["kind"] == "l"}
    ep = ep.persist()
    el = el.persist()
    res.persisted += [ep, el]
    _trace("error_accounting")
    res.stats["overlaps"] = elc.get("overlap", 0)
    res.stats["intersections"] = epc.get("intersection", 0)
    res.stats["rings_turned_around"] = elc.get("direction", 0)
    res.stats["questionable"] = elc.get("questionable", 0)
    res.warnings += (
        elc.get("overlap", 0)
        + epc.get("intersection", 0)
        + elc.get("direction", 0)
        + elc.get("questionable", 0)
    )
    if opt.output_rings:
        res.warnings += (
            epc.get("single_point_in_ring", 0)
            + elc.get("not_a_ring", 0)
            + elc.get("not_closed", 0)
        )
    res.tables["error_points"] = ep
    res.tables["error_lines"] = el
    _meta_tables(spark, opt, res, t0)
    return res
