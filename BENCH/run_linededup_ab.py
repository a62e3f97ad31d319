"""A/B: line_dedup first-occurrence aggregation — min(struct) vs packed BIGINT.

min(struct(doc_id, pos)) cannot use HashAggregate (struct is not a
mutable agg buffer type), so the partial phase SORT-aggregates every
line instance by line text. Packing the (doc_id, pos) order into one
BIGINT — doc_id * 2^20 + (pos-1), loudly guarded — keeps the identical
keep-first semantics (lexicographic == packed order while pos < 2^20)
but hash-aggregates. This measures both on the 128× corpus at word
granularity, checksum-verified identical.

Run: python BENCH/run_linededup_ab.py [cores ...] (default 8 2)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, DataFrame
from pyspark.sql import functions as F

from osmcoastline_spark.functions.clean import line_dedup

POS_BITS = 20
MAX_POS = 1 << POS_BITS
MAX_DOC = 1 << (62 - POS_BITS)


def line_dedup_struct(docs: DataFrame, sep: str = " ") -> DataFrame:
    """The original round-5 formulation, reproduced for the A/B:
    min(struct) first-occurrence agg (SortAggregate) and a reassembly
    exchange carrying (pos, line) structs."""
    t = F.col("text")
    base = docs.select(
        "doc_id", F.size(F.split(t, sep, -1)).cast("long").alias("n_lines")
    )
    lines = docs.select(
        "doc_id", F.posexplode(F.split(t, sep, -1)).alias("pos0", "line")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "line")
    firsts = (
        lines.filter(F.length("line") > 0)
        .groupBy("line")
        .agg(
            F.min(
                F.struct(F.col("doc_id").alias("d"), F.col("pos").alias("p"))
            ).alias("first_occ")
        )
    )
    kept = lines.join(firsts, "line", "left").filter(
        (F.length("line") == 0)
        | (
            (F.col("first_occ.d") == F.col("doc_id"))
            & (F.col("first_occ.p") == F.col("pos"))
        )
    )
    kagg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("text_dedup"),
        F.count("*").cast("long").alias("n_kept"),
    )
    return base.join(kagg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        "n_lines",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
    )


def line_dedup_packed(docs: DataFrame, sep: str = " ") -> DataFrame:
    t = F.col("text")
    base = docs.select(
        "doc_id", F.size(F.split(t, sep, -1)).cast("long").alias("n_lines")
    )
    lines = docs.select(
        "doc_id", F.posexplode(F.split(t, sep, -1)).alias("pos0", "line")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "line")
    ok = (F.col("pos") <= F.lit(MAX_POS)) & (F.col("doc_id") < F.lit(MAX_DOC)) & (
        F.col("doc_id") >= 0
    )
    packed = F.when(
        ok, F.col("doc_id") * F.lit(MAX_POS) + (F.col("pos") - 1)
    ).otherwise(
        F.raise_error(
            F.lit("line_dedup packed-key overflow: pos or doc_id out of range")
        ).cast("long")
    )
    keyed = lines.withColumn("pk", packed)
    firsts = (
        keyed.filter(F.length("line") > 0).groupBy("line").agg(F.min("pk").alias("fo"))
    )
    kept = keyed.join(firsts, "line", "left").filter(
        (F.length("line") == 0) | (F.col("pk") == F.col("fo"))
    )
    kagg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("text_dedup"),
        F.count("*").cast("long").alias("n_kept"),
    )
    return base.join(kagg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        "n_lines",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
    )


def line_dedup_posjoin(docs: DataFrame, sep: str = " ") -> DataFrame:
    """packed + reassembly by position: only (doc_id, pos) ints cross the
    reassembly exchange; text is rebuilt narrowly from the original doc
    row (element_at over the re-split array), so line text never
    shuffles after the explode."""
    t = F.col("text")
    lines = docs.select(
        "doc_id", F.posexplode(F.split(t, sep, -1)).alias("pos0", "line")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "line")
    ok = (F.col("pos") <= F.lit(MAX_POS)) & (F.col("doc_id") < F.lit(MAX_DOC)) & (
        F.col("doc_id") >= 0
    )
    packed = F.when(
        ok, F.col("doc_id") * F.lit(MAX_POS) + (F.col("pos") - 1)
    ).otherwise(
        F.raise_error(
            F.lit("line_dedup packed-key overflow: pos or doc_id out of range")
        ).cast("long")
    )
    keyed = lines.withColumn("pk", packed)
    firsts = (
        keyed.filter(F.length("line") > 0).groupBy("line").agg(F.min("pk").alias("fo"))
    )
    kept_pos = (
        keyed.join(firsts, "line", "left")
        .filter((F.length("line") == 0) | (F.col("pk") == F.col("fo")))
        .select("doc_id", "pos")
    )
    kagg = kept_pos.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("keep_pos"),
        F.count("*").cast("long").alias("n_kept"),
    )
    arr = F.split(t, sep, -1)
    return docs.join(kagg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(
            F.array_join(
                F.transform(F.col("keep_pos"), lambda p: F.element_at(arr, p)), sep
            ),
            F.lit(""),
        ).alias("text_dedup"),
        F.size(arr).cast("long").alias("n_lines"),
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
    )


VARIANTS = {
    "struct": line_dedup_struct,
    "packed": line_dedup_packed,
    "posjoin": lambda d: line_dedup(d, sep=" "),  # production since the A/B
}


def checksum(df: DataFrame):
    row = df.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.expr("bit_xor(xxhash64(doc_id, text_dedup, n_lines, n_kept))"),
            F.lit(0),
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def run(cores: int, amp: int):
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"linededup-ab-{cores}")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", f"{max(cores, 4)}g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    docs = base
    for k in range(1, amp):
        docs = docs.unionByName(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(k * 1_000_000_000))
        )
    docs = docs.localCheckpoint(eager=True)
    ndocs = docs.count()

    sums = {name: checksum(fn(docs)) for name, fn in VARIANTS.items()}
    ok = len(set(sums.values())) == 1
    print(f"cores={cores} docs={ndocs} identical={ok} checksums={sums}", flush=True)

    best = {name: 1e9 for name in VARIANTS}
    for attempt in range(3):
        for name, fn in VARIANTS.items():
            t0 = time.time()
            fn(docs).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best[name] = min(best[name], dt)
            print(f"  attempt {attempt} {name}: {dt:.2f}s", flush=True)
    spark.stop()
    return best


if __name__ == "__main__":
    amp = int(os.environ.get("SPARK_GRAFT_TEXT_AMP", "128"))
    levels = [int(a) for a in sys.argv[1:]] or [8, 2]
    results = {c: run(c, amp) for c in levels}
    print("\n== best-of-3 seconds ==")
    for c, b in results.items():
        print(f"local[{c}]: " + "  ".join(f"{k}={v:.2f}" for k, v in b.items()))
    if len(results) == 2:
        lo, hi = sorted(results)
        for name in VARIANTS:
            eff = (results[lo][name] / results[hi][name]) * (lo / hi)
            print(f"{name}: {lo}->{hi} scaling eff {eff:.3f}")
