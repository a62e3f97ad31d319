"""Deduplication operators for training-data pipelines.

Every variant is designed around one constraint: the pairwise work must be
bounded by bucketing BEFORE any quadratic step — the same cell-binning
discipline as the spatial joins.

* exact           — hash groupBy, keep min doc_id (one shuffle)
* minhash + LSH   — shingle → per-band min(md5(shingle||salt)) signature →
                    band-bucket equi-join → candidate pairs (optionally
                    Jaccard-verified). Hashes are md5 hex strings: portable
                    to DuckDB for the oracle (min() over strings).
* simhash         — 64-bit sign-sum sketch over token md5 bits; near-dup =
                    equal band keys (hamming-adjacent pairs surface via
                    4×16-bit band equality)
* n-gram Jaccard  — exact shingle-set Jaccard via explode + groupBy
* embedding       — cosine near-dup via LSH sign-buckets (see similarity.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------------ exact


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per exact text hash."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


# --------------------------------------------------------------- shingles


def shingles(docs: DataFrame, k: int = 5, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Character k-shingles via sequence+transform (JVM-side) + explode."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(
                f"array_distinct(transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)), "
                f"i -> substring({text_col}, i, {k})))"
            )
        ).alias("shingle"),
    )


# ------------------------------------------------------------ minhash LSH


def minhash_signatures(
    docs: DataFrame, n_hashes: int = 8, k: int = 5,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, band, sig): per band, min over md5(shingle || band-salt).

    One explode + one groupBy; signature strings are portable across
    engines (md5 hex compares lexicographically everywhere).
    """
    sh = shingles(docs, k, text_col, id_col)
    salted = sh.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.md5(F.concat(F.col("shingle"), F.lit(f"#{b}"))).alias("h"))
                for b in range(n_hashes)
            ])
        ).alias("bh"),
    ).select("doc_id", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))
    return salted.groupBy("doc_id", "band").agg(F.min("h").alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame, n_hashes: int = 8, bands: int = 4, k: int = 5,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-duplicate pairs: equal concatenated-signature in ANY
    LSH band (rows_per_band = n_hashes // bands)."""
    rows_per_band = max(n_hashes // bands, 1)
    sigs = minhash_signatures(docs, n_hashes, k, text_col, id_col)
    banded = sigs.withColumn("lsh_band", (F.col("band") / rows_per_band).cast("int"))
    keys = banded.groupBy("doc_id", "lsh_band").agg(
        F.concat_ws("|", F.sort_array(F.collect_list(F.concat_ws(":", F.col("band"), F.col("sig"))))).alias("key")
    )
    a = keys.select(F.col("doc_id").alias("a"), "lsh_band", "key")
    b = keys.select(F.col("doc_id").alias("b"), "lsh_band", "key")
    return (
        a.join(b, ["lsh_band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, k: int = 5, threshold: float = 0.8,
    text_col: str = "text", id_col: str = "doc_id",
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """Exact Jaccard over distinct k-shingle sets, restricted to pairs that
    share at least one shingle (the equi-join bounds the candidates).

    `max_doc_freq` drops shingles appearing in more than that many docs
    BEFORE the self-join — a boilerplate 8-gram shared by k docs otherwise
    contributes k² join rows (the 100 TB hot-key risk). The cap is ON by
    default (1000): at web scale the hot-shingle blow-up is the expected
    failure mode, so uncapped is the opt-in (`max_doc_freq=None`). The
    Jaccard is then computed consistently over the capped shingle sets
    (both intersection and sizes), so the metric stays well-defined;
    mirror the cap in any SQL oracle.

    The jaccard column is the raw IEEE division inter/(na+nb-inter) of
    exact integers — bit-identical on any engine, no rounding step."""
    sh = shingles(docs, k, text_col, id_col)
    if max_doc_freq is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("nsh"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("nsh").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("nsh").alias("nb")), "b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------- simhash


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens.

    Bit b of the sketch = sign of Σ_tokens (±1 depending on bit b of
    md5(token)). Bits come from the first 16 hex chars; each hex char
    contributes 4 bits via its value — portable arithmetic (strpos over
    '0123456789abcdef').
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    hexes = toks.withColumn("h", F.substring(F.md5("tok"), 1, 16))
    # ONE shuffle, 64 partial-aggregating sum columns per doc — no row
    # amplification (the round-1 plan exploded 64 rows per token, a 64×
    # shuffle blow-up). The 16 nibble values are projected ONCE per row so
    # each aggregate is a trivial shift/mask — inlining the string ops into
    # all 64 aggregates blows the codegen method size and falls back to
    # interpreted evaluation (measured 4× slower).
    nibs = hexes.select(
        "doc_id",
        *[
            (F.expr(f"instr('0123456789abcdef', substring(h, {k + 1}, 1))") - 1).alias(
                f"n{k}"
            )
            for k in range(16)
        ],
    )

    def bit_sum(b: int):
        bit = F.shiftright(F.col(f"n{b // 4}"), 3 - b % 4).bitwiseAND(F.lit(1))
        return F.sum(bit * 2 - 1).alias(f"s{b}")

    sums = nibs.groupBy("doc_id").agg(*[bit_sum(b) for b in range(64)])
    total = F.lit(0).cast("long")
    for b in range(64):
        weight = (
            F.lit(-9223372036854775808).cast("long")
            if b == 63
            else F.lit(1 << b).cast("long")
        )
        total = total + F.when(F.col(f"s{b}") > 0, weight).otherwise(F.lit(0).cast("long"))
    return sums.select("doc_id", total.alias("simhash"))


def simhash_band_pairs(sims: DataFrame, band_bits: int = 16) -> DataFrame:
    """Hamming-near candidates: docs sharing any 16-bit band of the sketch."""
    bands = sims.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), i * band_bits)
                    .bitwiseAND(F.lit((1 << band_bits) - 1))
                    .alias("key"),
                )
                for i in range(64 // band_bits)
            ])
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    a = bands.select(F.col("doc_id").alias("a"), "band", "key")
    b = bands.select(F.col("doc_id").alias("b"), "band", "key")
    return a.join(b, ["band", "key"]).filter(F.col("a") < F.col("b")).select("a", "b").distinct()
