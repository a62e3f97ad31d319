"""Text analysis for large-scale training-data pipelines.

These are pure Catalyst column expressions (JVM-side, whole-stage codegen)
— no Python in the hot path — with ONE measured exception: the rolling
fingerprint ships as an Arrow-vectorized pandas_udf, because its Catalyst
formulation is quadratic (element_at(split(text,''), i) re-evaluates the
split per lambda element) and HOF lambdas are interpreted — measured 25 s
for 5k docs at sf0.1 vs <0.5 s vectorized. The Catalyst form is kept as
the definitional twin (it IS the oracle SQL), equality-tested against the
fast path. Each feature has an ANSI-SQL twin in
__spark_entry__.oracle_sql() so DuckDB can verify results bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# tiny per-language stopword marker sets for the n-gram language heuristic
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " de ", " que "],
}

STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it"]


def token_count(text: Column) -> Column:
    """Whitespace token count (empty string ⇒ 0)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens with empties dropped — THE shared tokenization
    for every token-lattice operator (chunking, packing, repetition
    gates, duplicated spans, quality features, C4 line filters). All of
    them and their SQL oracles must agree on what a "token" is; keeping
    one definition here prevents a tweak in one operator from silently
    desynchronizing the lattices of the others."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda w: F.length(w) > 0)


def word_like_count(text: Column) -> Column:
    """BPE-ish unit count: alphanumeric runs + standalone punctuation."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9]+|[^\sA-Za-z0-9]", "\x01")
    return F.length(F.regexp_replace(stripped, "[^\x01]", ""))


# the ASCII punctuation set of the classic regex class [!-/:-@\[-`{-~]
_PUNCT_CHARS = "".join(
    chr(i)
    for i in (*range(33, 48), *range(58, 65), *range(91, 97), *range(123, 127))
)


def punct_ratio(text: Column) -> Column:
    # count-by-removal via translate (single table-lookup pass) instead of
    # regexp_replace with the char-class — same count for the identical
    # ASCII set, ~2x cheaper per row (round 6); the oracle SQL twin keeps
    # the regex formulation
    n = F.length(text)
    p = n - F.length(F.translate(text, _PUNCT_CHARS, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n.cast("double"))


def stopword_ratio(text: Column) -> Column:
    """Fraction of whitespace tokens that are English stopwords."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    total = F.size(toks)
    return F.when(total == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / total.cast("double")
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band, low punctuation,
    healthy stopword rate. Deterministic arithmetic — oracle-checkable."""
    n = F.length(text).cast("double")
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 4.0)
    stop_score = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    return F.round((len_score + punct_pen + stop_score) / 3.0, 6)


def lang_guess(text: Column) -> Column:
    """Marker-phrase language heuristic; 'und' = unknown."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))

    def score(lang: str) -> Column:
        s = F.lit(0)
        for m in LANG_MARKERS[lang]:
            # count occurrences of marker m
            s = s + (
                (F.length(padded) - F.length(F.replace(padded, F.lit(m), F.lit(""))))
                / F.lit(len(m))
            ).cast("int")
        return s

    scores = [(lang, score(lang)) for lang in sorted(LANG_MARKERS)]
    # max-scoring language wins; ties → alphabetically first; all-zero → und
    mx = scores[0][1]
    for _, s in scores[1:]:
        mx = F.greatest(mx, s)
    expr = F.lit("und")
    for lang, s in reversed(scores):
        expr = F.when((s == mx) & (mx > 0), F.lit(lang)).otherwise(expr)
    return expr


def rolling_fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint: polynomial hash of the UTF-8
    code units with an 8-cycle exponent (identical arithmetic expressible
    in DuckDB SQL).

        fp = sum( ascii(s[i]) * 31^(i mod 8) ) mod 1_000_000_007

    The accumulator reduces mod p at every step: each term is
    < 2^55 (codepoint ≤ 0x10FFFF × 31^7) and the running value < 2^30,
    so the int64 add can never overflow no matter the document length —
    an unreduced sum would wrap after ~300 astral-plane chars (or throw
    under ANSI mode), diverging from _fp_one and the DuckDB oracle,
    whose HUGEINT sum is exact. Per-step mod equals mod-at-the-end.
    """
    POWS = [31**k for k in range(8)]
    chars = F.split(text, "")
    n = F.length(text)
    idx = F.sequence(F.lit(1), F.greatest(n, F.lit(1)))
    # element i (1-based): ascii(chars[i]) * POWS[(i-1)%8]
    terms = F.transform(
        idx,
        lambda i: F.ascii(F.element_at(chars, i.cast("int"))).cast("long")
        * F.element_at(
            F.array(*[F.lit(p) for p in POWS]), (F.pmod(i - 1, F.lit(8)) + 1).cast("int")
        ),
    )
    agg = F.aggregate(
        terms,
        F.lit(0).cast("long"),
        lambda a, v: F.pmod(a + v, F.lit(1_000_000_007)),
    )
    return F.when(n == 0, F.lit(0).cast("long")).otherwise(agg)


_FP_POWS = np.array([31**k for k in range(8)], dtype=np.int64)
_FP_MOD = 1_000_000_007


def _fp_one(t: str | None) -> int | None:
    """Exact twin of rolling_fingerprint for one value. Code points via
    UTF-32 decode (== Spark ascii(): 'é'→233, '€'→8364); per-64-term chunk
    sums stay < 2^62 (term < 2^56: codepoint ≤ 0x10FFFF × 31^7), chunk
    totals are summed as Python ints, so the pre-mod sum is exact even
    where the int64 Catalyst accumulator would overflow."""
    if t is None:
        return None
    if not t:
        return 0
    cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    terms = cp * np.resize(_FP_POWS, cp.size)
    pad = (-terms.size) % 64
    if pad:
        terms = np.concatenate([terms, np.zeros(pad, dtype=np.int64)])
    return int(sum(int(c) for c in terms.reshape(-1, 64).sum(axis=1)) % _FP_MOD)


# DataType object, not a "long" DDL string: parsing the string needs an
# active SparkContext, which doesn't exist at import time
@F.pandas_udf(LongType())
def rolling_fingerprint_vec(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized rolling_fingerprint (see module docstring: the
    Catalyst form is quadratic + interpreted; this is the hot path)."""
    return texts.map(_fp_one, na_action="ignore").astype("Int64")


def with_text_features(docs: DataFrame, col: str = "text") -> DataFrame:
    from osmcoastline_spark.util import ensure_min_parallelism

    # single-file inputs: spread the regex/HOF feature projection and the
    # Arrow fingerprint stage across cores (no-op on multi-split input)
    docs = ensure_min_parallelism(docs)
    c = F.col(col)
    return (
        docs.withColumn("tokens", token_count(c))
        .withColumn("word_units", word_like_count(c))
        .withColumn("punct_ratio", F.round(punct_ratio(c), 6))
        .withColumn("stopword_ratio", F.round(stopword_ratio(c), 6))
        .withColumn("quality", quality_score(c))
        .withColumn("lang_guess", lang_guess(c))
        .withColumn("fingerprint", rolling_fingerprint_vec(c))
    )


def vocab_counts(
    docs: DataFrame,
    top_n: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary table — the tokenizer-training prep stage
    (word frequency + document frequency + deterministic rank).

    Output: word, n_occ (total occurrences), n_docs (documents
    containing the word), rank (row_number over count desc, then word
    asc — a deterministic total order, so top_n cuts are reproducible
    across engines and partitionings). top_n=None returns the full
    vocabulary.

    Shape at 100 TB: word explode → one two-level aggregate keyed by
    word (map-side partial for n_occ; n_docs expands to the standard
    two-phase distinct — keyed by (word, doc_id) then word, both
    skew-free). The rank window is a single-task sort, but over the
    VOCABULARY — bounded by the language, not the corpus (the same
    bounded-output argument as curate.lm_familiarity's trigram model).
    """
    t = F.col(text_col)
    words = docs.select(
        id_col, F.explode(F.split(F.trim(t), r"\s+")).alias("word")
    ).filter(F.length("word") > 0)
    agg = words.groupBy("word").agg(
        F.count("*").alias("n_occ"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    from pyspark.sql.window import Window

    rank = F.row_number().over(
        Window.orderBy(F.col("n_occ").desc(), F.col("word").asc())
    )
    out = agg.select("word", "n_occ", "n_docs", rank.cast("long").alias("rank"))
    if top_n is not None:
        out = out.filter(F.col("rank") <= top_n)
    return out
