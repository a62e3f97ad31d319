#!/usr/bin/env python
"""10x-class scale-up run (round-5 VERDICT #4).

One recorded full-pipeline run at 2M islands (~29M nodes — 200x the bench
fixture's row count, 10x the kernel harness's largest pipeline-level run)
with the SPARK_GRAFT_TRACE stage trace: per-stage seconds, job-count
deltas (expected data-independent), and per-row cost vs the 200k-island
A/B run, to show which stage departs from linear first.

Usage: python BENCH/run_scale10x.py [islands]
Prints one JSON line; the trace lines go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from osmcoastline_spark.plans.pipeline import Options, run_pipeline  # noqa: E402
from osmcoastline_spark.session import get_spark  # noqa: E402
from osmcoastline_spark.synth import synth_nodes_ways  # noqa: E402


def main() -> None:
    islands = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "scale10x", master=f"local[{cpus}]", shuffle_partitions=int(cpus) * 2
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="scale10x-")

    t0 = time.time()
    nodes, ways = synth_nodes_ways(spark, islands, seed=42)
    nodes.write.mode("overwrite").parquet(os.path.join(tmp, "nodes"))
    ways.write.mode("overwrite").parquet(os.path.join(tmp, "ways"))
    synth_s = round(time.time() - t0, 1)
    nodes_p = spark.read.parquet(os.path.join(tmp, "nodes"))
    ways_p = spark.read.parquet(os.path.join(tmp, "ways"))
    n_nodes, n_ways = nodes_p.count(), ways_p.count()

    # warm plan shapes so the trace measures operators, not first-run JIT
    _n, _w = synth_nodes_ways(spark, 10, seed=7)
    run_pipeline(spark, _n, _w, Options(output_polygons="land"))

    os.environ["SPARK_GRAFT_TRACE"] = "1"
    st = spark.sparkContext.statusTracker()
    jobs_before = len(st.getJobIdsForGroup(None) or [])
    t0 = time.time()
    res = run_pipeline(
        spark,
        nodes_p,
        ways_p,
        Options(output_polygons="both", water_cell_deg=4.0, max_points_in_polygon=500),
    )
    land = res.tables["land_polygons"].count()
    water = res.tables["water_polygons"].count()
    wall = round(time.time() - t0, 1)
    jobs = len(st.getJobIdsForGroup(None) or []) - jobs_before

    print(
        json.dumps(
            {
                "islands": islands,
                "nodes": n_nodes,
                "ways": n_ways,
                "synth_write_s": synth_s,
                "pipeline_s": wall,
                "jobs": jobs,
                "rings": res.stats.get("rings"),
                "land_polygons": land,
                "water_tiles": water,
                "warnings": res.warnings,
                "errors": res.errors,
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
