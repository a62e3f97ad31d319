#!/usr/bin/env python
"""Assembly driver-threshold knob A/B at 2M-island scale.

BENCH/BASELINE.md §2b flagged ring assembly as the stage to watch at the
next 10×: at 2M islands the open-chain set (~2.4M: islands split into 1-3
ways) sits ABOVE the default driver-finish threshold (200k), so the
operator runs ~10 extra distributed mating rounds (+64 jobs) before the
sequential finish. The named mitigation is a knob, not a redesign — this
script measures the knob.

A/B: assemble_rings over the SAME checkpointed location-join output with
  low  = 200 000   (default: distributed rounds until below threshold)
  high = 4 000 000 (first count already below: immediate driver finish —
                    one Arrow toPandas of (id, first, last) triples + the
                    O(n log n) sequential chain walk)
interleaved low/high/low/high (best-of-2), outputs cross-checked by
count + xxhash64 bit_xor checksum. Prints one JSON line.

The 100 TB reading: the triples transfer is ~24 bytes/chain, so even 100M
open chains is ~2.4 GB driver RAM — the knob buys out entire shuffle
rounds for as long as the driver can hold the endpoint set, and the
distributed rounds remain the fallback ABOVE that, unchanged.

Usage: python BENCH/run_assembly_knob.py [islands]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from osmcoastline_spark.operators.filter import coastline_ways  # noqa: E402
from osmcoastline_spark.operators.locations import ways_with_locations  # noqa: E402
from osmcoastline_spark.operators.rings import assemble_rings  # noqa: E402
from osmcoastline_spark.session import get_spark  # noqa: E402
from osmcoastline_spark.synth import synth_nodes_ways  # noqa: E402


def checksum(df):
    """Order-insensitive ring digest: count, total points, id/size hash."""
    row = df.select(
        F.count("*").alias("n"),
        F.sum(F.size("node_ids")).alias("pts"),
        F.bit_xor(F.xxhash64("ring_id", F.size("node_ids"))).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["pts"]), int(row["h"])


def main() -> None:
    islands = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "assembly-knob", master=f"local[{cpus}]", shuffle_partitions=int(cpus) * 2
    )
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()

    nodes, ways = synth_nodes_ways(spark, islands, seed=42)
    cw = coastline_ways(ways)
    wl = ways_with_locations(cw, nodes).localCheckpoint(eager=True)
    n_ways = wl.count()

    # warm every plan shape once (JIT volume warmth is real but the A/B is
    # interleaved, so residual warmth cancels across variants)
    sn, sw = synth_nodes_ways(spark, 2_000, seed=7)
    swl = ways_with_locations(coastline_ways(sw), sn).localCheckpoint(eager=True)
    for thr in (50, 10_000_000):
        c, o = assemble_rings(swl, driver_threshold=thr, assume_materialized=True)
        checksum(c)

    thresholds = {"low": 200_000, "high": 4_000_000}
    times: dict[str, list[float]] = {k: [] for k in thresholds}
    jobs: dict[str, list[int]] = {k: [] for k in thresholds}
    sums = {}
    for attempt in range(2):
        for name, thr in thresholds.items():
            gc.collect()
            time.sleep(2)  # let ContextCleaner drain before timing
            j0 = len(st.getJobIdsForGroup(None) or [])
            t0 = time.time()
            closed, open_ = assemble_rings(
                wl, driver_threshold=thr, assume_materialized=True
            )
            cs = checksum(closed)
            os_ = checksum(open_)
            times[name].append(round(time.time() - t0, 1))
            jobs[name].append(len(st.getJobIdsForGroup(None) or []) - j0)
            key = (cs, os_)
            sums.setdefault(name, key)
            assert sums[name] == key, f"{name}: nondeterministic output {key}"
    (k0, k1) = sums.keys()
    identical = sums[k0] == sums[k1]

    print(
        json.dumps(
            {
                "islands": islands,
                "ways": n_ways,
                "thresholds": thresholds,
                "assemble_s": {k: min(v) for k, v in times.items()},
                "attempts": times,
                "jobs": {k: v[0] for k, v in jobs.items()},
                "closed_rings": sums[k0][0][0],
                "outputs_identical": identical,
                "cpus": int(cpus),
            }
        )
    )
    if not identical:
        print(f"MISMATCH: {sums}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
