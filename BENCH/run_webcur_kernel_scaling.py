#!/usr/bin/env python
"""Scaling evidence for the round-5 web-curation kernels (N vs 4N cores,
same protocol as run_kernel_scaling.py: fresh JVM per level, ONE Spark
action per kernel, interleaved best-of-N, per-kernel MIN per level,
probe-bracketed via host_probe.gate_or_abort).

Kernels (inputs synthesized deterministically from spark.range — unique
strings per row so id-offset duplication cannot fabricate quadratic
candidate clusters):
  fuzzy   — Ed-Join edit-distance pair join (dedup.fuzzy_pairs) over
            ROWS strings: each is a unique md5-derived 8-char head plus
            two common vocabulary words (high-df grams), so the
            rarest-first d*q+1 prefix indexes the head and the hot word
            grams never enter the candidate join — the designed skew
            mechanism under load. Every 5th string gets a one-char
            mutated copy (the true pair set).
  urlchain— canonicalize_urls -> url_keep_first -> domain_topn(10) over
            ROWS*5 synthetic URLs (the q_url_dedup generator shapes).
  mixture — budget-driven mixture sampler over ROWS*10 docs, 20
            sources, upsampling weights (epochs explode ~2x).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from host_probe import gate_or_abort  # noqa: E402

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO"])
from pyspark.sql import functions as F
from osmcoastline_spark.session import get_spark
from osmcoastline_spark.functions.dedup import fuzzy_pairs
from osmcoastline_spark.functions.urls import canonicalize_urls, url_keep_first, domain_topn
from osmcoastline_spark.functions.curate import mixture_sample

cpus = int(sys.argv[1])
rows = int(sys.argv[2])
spark = get_spark("webcur", master=f"local[{cpus}]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

res = {}

def act(build, name):
    # `build` is a THUNK: construction runs inside the timed region, so
    # operators whose construction launches jobs (fuzzy_pairs' eager
    # prefix checkpoint) are timed whole. Row count via Observation on
    # the same action — a second count() would re-run the pipeline.
    from pyspark.sql import Observation
    obs = Observation(name)
    t0 = time.time()
    build().observe(obs, F.count(F.lit(1)).alias("n")).write.format("noop").mode("overwrite").save()
    dt = round(time.time() - t0, 2)
    res[name] = [dt, obs.get["n"]]

# ---- fuzzy: unique head + common-word tail, planted ed-1 mutations ----
head = F.substring(F.md5(F.concat(F.lit("fz:"), F.col("id").cast("string"))), 1, 8)
w1 = F.substring(F.md5(F.concat(F.lit("w:"), (F.col("id") % 701).cast("string"))), 1, 6)
w2 = F.substring(F.md5(F.concat(F.lit("v:"), (F.col("id") % 97).cast("string"))), 1, 6)
s = F.concat(head, F.lit(" "), w1, F.lit(" "), w2)
base = spark.range(rows).select(F.col("id").alias("doc_id"), s.alias("text"))
mut = base.filter(F.col("doc_id") % 5 == 0).select(
    (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
    F.concat(F.substring("text", 1, 12), F.lit("Z"), F.substring("text", 14, 64)).alias("text"),
)
corpus = base.unionByName(mut).localCheckpoint(eager=True)
act(lambda: fuzzy_pairs(corpus, d=2, q=3), "fuzzy")

# ---- urlchain -------------------------------------------------------
n_u = rows * 5
d = F.col("id")
scheme = F.when(d % 3 == 0, F.lit("http")).when(d % 3 == 1, F.lit("https")).otherwise(F.lit("HTTPS"))
port = (F.when((d % 4 == 0) & (d % 3 == 0), F.lit(":80"))
        .when(d % 4 == 0, F.lit(":443"))
        .when(d % 4 == 1, F.lit(":8080")).otherwise(F.lit("")))
url = F.concat(
    scheme, F.lit("://WWW.h"), (d % 997).cast("string"), F.lit("-Example.COM"), port,
    F.lit("/Docs/"), (d % 50000).cast("string"),
    F.when(d % 3 == 0, F.lit("/")).otherwise(F.lit("")),
    F.lit("?utm_source=feed&id="), (d % 25000).cast("string"),
    F.when(d % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
)
urls = spark.range(n_u).select(
    F.col("id").alias("doc_id"), url.alias("url"), (d % 1000).cast("long").alias("n_chars")
).localCheckpoint(eager=True)
chain = domain_topn(
    url_keep_first(canonicalize_urls(urls)), 10,
    order_cols=[F.col("n_chars").desc(), F.col("doc_id")],
)
act(lambda: chain, "urlchain")

# ---- mixture --------------------------------------------------------
n_m = rows * 10
docs = spark.range(n_m).select(
    F.col("id").alias("doc_id"),
    F.concat(F.lit("s"), (F.col("id") % 20).cast("string")).alias("source"),
    (F.lit(100) + F.col("id") % 500).cast("long").alias("n_chars"),
).localCheckpoint(eager=True)
weights = {f"s{i}": (0.3 if i < 2 else 0.05) for i in range(10)}
tokens_total = n_m * 350  # approx; budget drives rates ~2x on s0/s1
act(lambda: mixture_sample(docs, weights, int(tokens_total * 0.8)), "mixture")

print(json.dumps({"cpus": cpus, "kernels": res}))
spark.stop()
"""


def main() -> None:
    rows = int(os.environ.get("SPARK_GRAFT_WEBCUR_ROWS", "150000"))
    lo = int(os.environ.get("SPARK_GRAFT_SCALING_LO", "2"))
    hi = int(os.environ.get("SPARK_GRAFT_SCALING_HI", "8"))
    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "3"))
    env = dict(os.environ, REPO=REPO)
    probes: list = []
    attempts: dict = {lo: [], hi: []}

    def level(cpus: int) -> dict:
        gate_or_abort(probes, attempts)
        per_core = float(os.environ.get("SPARK_GRAFT_MEM_PER_CORE", "1"))
        lenv = dict(env, SPARK_GRAFT_DRIVER_MEM=f"{max(int(cpus * per_core), 4)}g")
        out = subprocess.run(
            [sys.executable, "-c", CHILD, str(cpus), str(rows)],
            capture_output=True, text=True, env=lenv, timeout=3600,
        )
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if out.returncode != 0 or not lines:
            raise RuntimeError(
                f"webcur child (cpus={cpus}) failed rc={out.returncode}:\n"
                + out.stderr[-2000:]
            )
        return json.loads(lines[-1])["kernels"]

    for _ in range(repeats):
        attempts[lo].append(level(lo))
        attempts[hi].append(level(hi))
    gate_or_abort(probes, attempts)  # trailing bracket

    def best(la: list[dict]) -> dict:
        return {n: [min(a[n][0] for a in la), la[0][n][1]] for n in la[0]}

    k_lo, k_hi = best(attempts[lo]), best(attempts[hi])
    rows_md = []
    for name in k_lo:
        (t_lo, n_lo), (t_hi, n_hi) = k_lo[name], k_hi[name]
        assert n_lo == n_hi, (name, n_lo, n_hi)
        sp = t_lo / t_hi if t_hi else 0.0
        rows_md.append((name, t_lo, t_hi, n_lo, round(sp, 2), round(sp / (hi / lo), 3)))
    md = "\n".join(f"| {n} | {a} | {b} | {c} | {d}× | {e} |" for n, a, b, c, d, e in rows_md)
    section = f"""

## Web-curation kernels ({lo} vs {hi} cores, rows={rows}, best of {repeats} interleaved, probe-bracketed)

Round-5 web-curation operators (fuzzy_pairs / url chain / mixture_sample)
under the standard protocol (fresh JVM per level, one action per kernel,
per-kernel min, probe-clean bracket):

| kernel | local[{lo}] s | local[{hi}] s | rows | speedup | efficiency |
|---|---|---|---|---|---|
{md}
"""
    with open(os.path.join(REPO, "BENCH", "KERNELS.md"), "a") as f:
        f.write(section)
    print(json.dumps({"lo": k_lo, "hi": k_hi, "probes": probes,
                      "attempts_lo": attempts[lo], "attempts_hi": attempts[hi]}))


if __name__ == "__main__":
    main()
