"""A/B: explode+groupBy minhash signatures vs zero-shuffle narrow variants.

The shipped minhash_signatures (functions/dedup.py) explodes shingles x
n_hashes band-structs and groupBy(doc_id, band).min(h) — one shuffle (small
after partial agg, but a shuffle nonetheless) and docs x shingles x n_hashes
rows through the hash aggregate.  A document's shingles all live in ONE input
row, so the signature is computable narrowly, with zero shuffle:

  v1 "agg-hof"   — one F.aggregate pass over the shingle array carrying a
                   struct of n_hashes running minima (md5 per band inside the
                   lambda; HOF lambdas are interpreted, not codegen).
  v2 "array-min" — materialize transform(sh, s -> struct(md5 s#0..#B)) once,
                   then n_hashes cheap array_min(transform(field)) scans.

Both emit (doc_id, band, sig) via posexplode of the per-row signature array —
a narrow 8x explode of TINY rows, no aggregation, no exchange.

Run: python BENCH/run_minhash_ab.py [cores ...]  (default 8 32)
Prints per-variant best-of-3 interleaved + correctness (full value-hash
equality across variants).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, DataFrame
from pyspark.sql import functions as F

from osmcoastline_spark.functions.dedup import minhash_signatures

N_HASHES = 8
K = 5
AMPLIFY = 16  # id-offset copies, same shape as BENCH/run_kernel_scaling.py


def _shingle_array(text_col: str, k: int):
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)), "
        f"i -> substring({text_col}, i, {k})))"
    )


def sig_agg_hof(docs: DataFrame, n_hashes: int = N_HASHES, k: int = K) -> DataFrame:
    sh = docs.select(F.col("doc_id"), _shingle_array("text", k).alias("_sh"))
    init = F.struct(*[F.lit("g").alias(f"c{b}") for b in range(n_hashes)])  # 'g' > any hex
    def merge(acc, s):
        return F.struct(*[
            F.least(acc[f"c{b}"], F.md5(F.concat(s, F.lit(f"#{b}")))).alias(f"c{b}")
            for b in range(n_hashes)
        ])
    mins = sh.select("doc_id", F.aggregate("_sh", init, merge).alias("_m"))
    out = mins.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"_m.c{b}") for b in range(n_hashes)])),
    )
    return out.withColumnRenamed("pos", "band").withColumnRenamed("col", "sig")


def sig_array_min(docs: DataFrame, n_hashes: int = N_HASHES, k: int = K) -> DataFrame:
    sh = docs.select(F.col("doc_id"), _shingle_array("text", k).alias("_sh"))
    hs = sh.select(
        "doc_id",
        F.transform(
            "_sh",
            lambda s: F.struct(*[
                F.md5(F.concat(s, F.lit(f"#{b}"))).alias(f"c{b}") for b in range(n_hashes)
            ]),
        ).alias("_hs"),
    )
    mins = hs.select(
        "doc_id",
        *[
            # single-arg lambda only: a 2-arg lambda is (element, index) to
            # F.transform, which would clobber a b=b default with the index
            F.array_min(F.transform("_hs", (lambda bb: lambda x: x[f"c{bb}"])(b))).alias(f"m{b}")
            for b in range(n_hashes)
        ],
    )
    out = mins.select(
        "doc_id", F.posexplode(F.array(*[F.col(f"m{b}") for b in range(n_hashes)]))
    )
    return out.withColumnRenamed("pos", "band").withColumnRenamed("col", "sig")


VARIANTS = {
    "explode-groupby": lambda d: minhash_signatures(d, n_hashes=N_HASHES, k=K),
    "agg-hof": sig_agg_hof,
    "array-min": sig_array_min,
}


def checksum(df: DataFrame) -> tuple[int, int]:
    row = df.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(doc_id, band, sig))"), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def run(cores: int) -> dict[str, float]:
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"minhash-ab-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    docs = base
    for i in range(1, AMPLIFY):
        docs = docs.unionByName(
            base.select((F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"), "text")
        )
    docs = docs.repartition(cores * 2).persist()
    ndocs = docs.count()

    sums = {}
    for name, fn in VARIANTS.items():
        sums[name] = checksum(fn(docs))
    ok = len(set(sums.values())) == 1
    print(f"cores={cores} docs={ndocs} checksums={sums} identical={ok}")

    best: dict[str, float] = {name: 1e9 for name in VARIANTS}
    for attempt in range(3):  # interleaved best-of-3 (round-3 measurement rule)
        for name, fn in VARIANTS.items():
            t0 = time.time()
            fn(docs).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best[name] = min(best[name], dt)
            print(f"  attempt {attempt} {name}: {dt:.2f}s")
    spark.stop()
    return best


if __name__ == "__main__":
    levels = [int(a) for a in sys.argv[1:]] or [8, 32]
    results = {c: run(c) for c in levels}
    print("\n== best-of-3 seconds ==")
    for c, best in results.items():
        print(f"local[{c}]: " + "  ".join(f"{k}={v:.2f}" for k, v in best.items()))
    if len(results) == 2:
        lo, hi = sorted(results)
        for name in VARIANTS:
            eff = (results[lo][name] / results[hi][name]) * (lo / hi)
            print(f"{name}: {lo}->{hi} scaling eff {eff:.3f}")
