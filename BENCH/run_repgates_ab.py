"""A/B: repetition_stats formulations (the narrow-vs-explode trade-off).

The minhash narrow rewrite won 1.7x because its per-element lambda work
(8 md5s) amortizes HOF interpretation overhead. repetition_stats'
per-element work is a string compare + struct build, so the same rewrite
may LOSE to whole-stage-codegen explode+agg despite saving 4 exchanges.
This measures all three on the text-kernel harness's 32x corpus:

  explode  — the original two-level agg + join (4 exchanges, codegen)
  narrow   — per-row arrays + sorted-run F.aggregate (0 exchanges, HOF)
  hybrid   — narrow dup-word (pure array fns, no lambdas except the token
             filter) + explode/agg top-bigram (2 exchanges)

Run: python BENCH/run_repgates_ab.py [cores ...] (default 8 2)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, DataFrame
from pyspark.sql import functions as F

from osmcoastline_spark.functions.curate import repetition_stats, word_ngrams


def repetition_explode(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The pre-round-5-rewrite formulation, reproduced for the A/B."""
    t = F.col(text_col)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(t), r"\s+")).alias("tok")
    ).filter(F.length("tok") > 0)
    wagg = (
        toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("tokens"), F.count("*").alias("distinct_tokens"))
    )
    grams = docs.select("doc_id", F.explode(word_ngrams(t, 2)).alias("gram"))
    bagg = (
        grams.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram"), F.sum("c").alias("bigrams"))
    )
    dup = F.lit(1.0) - F.col("distinct_tokens").cast("double") / F.col("tokens").cast("double")
    top2 = F.when(
        F.col("bigrams").isNull() | (F.col("bigrams") == 0), F.lit(0.0)
    ).otherwise(F.col("top_bigram").cast("double") / F.col("bigrams").cast("double"))
    return wagg.join(bagg, "doc_id", "left").select(
        "doc_id", "tokens", "distinct_tokens",
        dup.alias("dup_word_frac"), top2.alias("top_bigram_frac"),
        (dup <= 0.5).cast("int").alias("r_dup_word"),
        (top2 <= 0.08).cast("int").alias("r_top_bigram"),
        ((dup <= 0.5) & (top2 <= 0.08)).cast("int").alias("pass_repetition"),
    )


def repetition_hybrid(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Narrow word stats (pure array functions) + explode/agg top-bigram."""
    t = F.col(text_col)
    toks_f = F.filter(F.split(F.trim(t), r"\s+"), lambda x: F.length(x) > 0)
    base = docs.select(
        "doc_id",
        F.size(toks_f).cast("long").alias("tokens"),
        F.size(F.array_distinct(toks_f)).cast("long").alias("distinct_tokens"),
    ).filter(F.col("tokens") > 0)
    grams = docs.select("doc_id", F.explode(word_ngrams(t, 2)).alias("gram"))
    bagg = (
        grams.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram"), F.sum("c").alias("bigrams"))
    )
    dup = F.lit(1.0) - F.col("distinct_tokens").cast("double") / F.col("tokens").cast("double")
    top2 = F.when(
        F.col("bigrams").isNull() | (F.col("bigrams") == 0), F.lit(0.0)
    ).otherwise(F.col("top_bigram").cast("double") / F.col("bigrams").cast("double"))
    return base.join(bagg, "doc_id", "left").select(
        "doc_id", "tokens", "distinct_tokens",
        dup.alias("dup_word_frac"), top2.alias("top_bigram_frac"),
        (dup <= 0.5).cast("int").alias("r_dup_word"),
        (top2 <= 0.08).cast("int").alias("r_top_bigram"),
        ((dup <= 0.5) & (top2 <= 0.08)).cast("int").alias("pass_repetition"),
    )


VARIANTS = {
    "explode": repetition_explode,
    "narrow": repetition_stats,
    "hybrid": repetition_hybrid,
}


def checksum(df: DataFrame):
    row = df.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.expr(
                "bit_xor(xxhash64(doc_id, tokens, distinct_tokens, dup_word_frac,"
                " top_bigram_frac, r_dup_word, r_top_bigram, pass_repetition))"
            ),
            F.lit(0),
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def run(cores: int):
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"repgates-ab-{cores}")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", f"{max(cores, 4)}g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    docs = base
    for k in range(1, 32):
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
    levels = [int(a) for a in sys.argv[1:]] or [8, 2]
    results = {c: run(c) for c in levels}
    print("\n== best-of-3 seconds ==")
    for c, b in results.items():
        print(f"local[{c}]: " + "  ".join(f"{k}={v:.2f}" for k, v in b.items()))
    if len(results) == 2:
        lo, hi = sorted(results)
        for name in VARIANTS:
            eff = (results[lo][name] / results[hi][name]) * (lo / hi)
            print(f"{name}: {lo}->{hi} scaling eff {eff:.3f}")
