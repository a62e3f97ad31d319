#!/usr/bin/env python
"""Scaling evidence for the round-5 temporal kernels (N vs 4N cores, same
protocol as the other kernel harnesses: identical input, fresh JVM per
level, interleaved best-of-N, per-kernel MIN per level).

Kernels over an amplified events table (sf0.1 × AMP, distinct synthetic
user spread so keys scale with rows):
  sessionize — cumsum-of-starts window + per-session agg (one exchange).
  asof       — joinless union+window as-of join of clicks vs errors.

Appends a section to BENCH/KERNELS.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO"])
from pyspark.sql import functions as F
from osmcoastline_spark.session import get_spark
from osmcoastline_spark.functions import temporal as T

cpus = int(sys.argv[1])
amp = int(sys.argv[2])
spark = get_spark("temporalkern", master=f"local[{cpus}]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ev0 = spark.read.parquet(sf + "/events.parquet").select(
    "event_id", "user_id", "ts", "event_type", "value"
)
ev = ev0
for k in range(1, amp):
    ev = ev.unionByName(
        ev0.withColumn("user_id", F.col("user_id") + F.lit(k * 10_000))
        .withColumn("event_id", F.col("event_id") + F.lit(k * 10_000_000))
    )
ev = ev.localCheckpoint(eager=True)

spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM
spark.range(64).repartition(64).mapInPandas(lambda it: it, "id long").count()

res = {}

def act(name, fn):
    t0 = time.time()
    df = fn()
    df.write.format("noop").mode("overwrite").save()
    res[name] = [round(time.time() - t0, 2), df.count()]

act("sessionize", lambda: T.sessionize(ev, gap_seconds=86400))
clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
errors = (
    ev.filter(F.col("event_type") == "error")
    .groupBy("user_id", "ts").agg(F.max("value").alias("value"))
)
act("asof", lambda: T.asof_join(clicks, errors, on="user_id"))
print(json.dumps({"cpus": cpus, "kernels": res}))
spark.stop()
"""


def main() -> None:
    amp = int(os.environ.get("SPARK_GRAFT_EVENT_AMP", "64"))
    lo = int(os.environ.get("SPARK_GRAFT_SCALING_LO", "2"))
    hi = int(os.environ.get("SPARK_GRAFT_SCALING_HI", "8"))
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "3"))
    env = dict(os.environ, REPO=REPO)

    def level(cpus: int) -> dict:
        lenv = dict(env, SPARK_GRAFT_DRIVER_MEM=f"{max(cpus, 4)}g")
        out = subprocess.run(
            [sys.executable, "-c", CHILD, str(cpus), str(amp)],
            capture_output=True, text=True, env=lenv, timeout=3600,
        )
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if out.returncode != 0 or not lines:
            raise RuntimeError(
                f"temporal-kernel child (cpus={cpus}) failed rc={out.returncode}:\n"
                + out.stderr[-2000:]
            )
        return json.loads(lines[-1])["kernels"]

    attempts = {lo: [], hi: []}
    for _ in range(repeats):
        attempts[lo].append(level(lo))
        attempts[hi].append(level(hi))

    def best(la: list[dict]) -> dict:
        return {name: [min(a[name][0] for a in la), la[0][name][1]] for name in la[0]}

    k_lo, k_hi = best(attempts[lo]), best(attempts[hi])
    rows = []
    for name in k_lo:
        (t_lo, n_lo), (t_hi, n_hi) = k_lo[name], k_hi[name]
        assert n_lo == n_hi, (name, n_lo, n_hi)
        sp = t_lo / t_hi if t_hi else 0.0
        rows.append((name, t_lo, t_hi, n_lo, round(sp, 2), round(sp / (hi / lo), 3)))

    md_rows = "\n".join(
        f"| {n} | {a} | {b} | {c} | {d}× | {e} |" for n, a, b, c, d, e in rows
    )
    section = f"""

## Temporal kernels ({lo} vs {hi} cores, events×{amp}, best of {repeats} interleaved)

Round-5 as-of join + sessionization under the main-table protocol (fresh
JVM per level, noop-sink action, per-kernel min across interleaved
repeats). The amplification spreads synthetic user ids, so key-count —
the parallelism unit of both kernels — scales with rows.

| kernel | {lo}-core s | {hi}-core s | out rows | speedup | efficiency |
|---|---|---|---|---|---|
{md_rows}
"""
    with open(os.path.join(REPO, "BENCH", "KERNELS.md"), "a") as f:
        f.write(section)
    print(json.dumps({
        "lo": k_lo, "hi": k_hi,
        "attempts": {str(k): v for k, v in attempts.items()},
    }))


if __name__ == "__main__":
    main()
