#!/usr/bin/env python
"""Scaling evidence for the document-cleaning kernels (N vs 4N cores,
same protocol as run_text_kernel_scaling.py: identical input, fresh JVM
per level, ONE noop-sink action per kernel, interleaved best-of-N,
per-kernel MIN per level).

Kernels (over sf0.1 documents amplified by id-offset copies; the copies
carry IDENTICAL text, which for linededup is the realistic regime — a
boilerplate-heavy corpus where most line instances are duplicates):
  linededup — corpus keep-first line dedup at word granularity
              (explode, partial_min(struct) agg, join back, reassemble)
  c4filters — narrow zero-shuffle per-line rule filter
  pii       — pure-Catalyst regex redaction + counts

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
from osmcoastline_spark.functions import clean as CL
from osmcoastline_spark.functions import dedup as D

cpus = int(sys.argv[1])
amp = int(sys.argv[2])
spark = get_spark("cleankern", master=f"local[{cpus}]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
docs0 = spark.read.parquet(
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1") + "/documents.parquet"
).select("doc_id", "text")
docs = docs0
for k in range(1, amp):
    docs = docs.unionByName(docs0.withColumn("doc_id", F.col("doc_id") + F.lit(k * 1_000_000_000)))
docs = docs.localCheckpoint(eager=True)
spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

res = {}

def act(df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = round(time.time() - t0, 2)
    return dt, df.count()

dt, n = act(CL.line_dedup(docs, sep=" ")); res["linededup"] = [dt, n]
dt, n = act(CL.c4_line_filters(docs, sep=" ", min_words=3)); res["c4filters"] = [dt, n]
dt, n = act(CL.pii_redact(docs)); res["pii"] = [dt, n]
# dupspans: every window is duplicated across the id-offset copies, so
# ALL positions flag and the island window sees the full corpus — the
# operator's worst-case regime, measured deliberately.
dt, n = act(D.duplicated_spans(docs, k=8)); res["dupspans"] = [dt, n]
print(json.dumps({"cpus": cpus, "kernels": res}))
spark.stop()
"""


def main() -> None:
    amp = int(os.environ.get("SPARK_GRAFT_TEXT_AMP", "32"))
    lo = int(os.environ.get("SPARK_GRAFT_SCALING_LO", "2"))
    hi = int(os.environ.get("SPARK_GRAFT_SCALING_HI", "8"))
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "3"))
    env = dict(os.environ, REPO=REPO)

    def level(cpus: int) -> dict:
        per_core = float(os.environ.get("SPARK_GRAFT_MEM_PER_CORE", "1"))
        lenv = dict(env, SPARK_GRAFT_DRIVER_MEM=f"{max(int(cpus * per_core), 4)}g")
        out = subprocess.run(
            [sys.executable, "-c", CHILD, str(cpus), str(amp)],
            capture_output=True, text=True, env=lenv, timeout=3600,
        )
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if out.returncode != 0 or not lines:
            raise RuntimeError(
                f"clean-kernel child (cpus={cpus}) failed rc={out.returncode}:\n"
                + out.stderr[-2000:]
            )
        return json.loads(lines[-1])["kernels"]

    attempts = {lo: [], hi: []}
    for _ in range(repeats):
        attempts[lo].append(level(lo))
        attempts[hi].append(level(hi))

    def best(la: list[dict]) -> dict:
        return {
            name: [min(a[name][0] for a in la), la[0][name][1]] for name in la[0]
        }

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

## Document-cleaning kernels ({lo} vs {hi} cores, {amp}× sf0.1 documents, best of {repeats} interleaved)

Same protocol as the text-curation table (fresh JVM per level, one
noop-sink action per kernel, per-kernel min). The 32× id-offset copies
carry identical text — the boilerplate-heavy regime linededup exists for.

| kernel | local[{lo}] s | local[{hi}] s | rows | speedup | efficiency |
|---|---|---|---|---|---|
{md_rows}
"""
    with open(os.path.join(REPO, "BENCH", "KERNELS.md"), "a") as f:
        f.write(section)
    print(json.dumps({"lo": k_lo, "hi": k_hi, "attempts_lo": attempts[lo], "attempts_hi": attempts[hi]}))


if __name__ == "__main__":
    main()
