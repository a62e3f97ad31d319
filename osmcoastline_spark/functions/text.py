"""Text analysis for large-scale training-data pipelines.

All of these are pure Catalyst column expressions (JVM-side, whole-stage
codegen) — no Python in the hot path. Each has an ANSI-SQL twin in
__spark_entry__.oracle_sql() so DuckDB can verify results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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


def word_like_count(text: Column) -> Column:
    """BPE-ish unit count: alphanumeric runs + standalone punctuation."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9]+|[^\sA-Za-z0-9]", "\x01")
    return F.length(F.regexp_replace(stripped, "[^\x01]", ""))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    p = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
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
    code units with an 8-cycle exponent (no overflow in int64; identical
    arithmetic expressible in DuckDB SQL).

        fp = sum( ascii(s[i]) * 31^(i mod 8) ) mod 1_000_000_007
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
    agg = F.pmod(F.aggregate(terms, F.lit(0).cast("long"), lambda a, v: a + v), F.lit(1_000_000_007))
    return F.when(n == 0, F.lit(0).cast("long")).otherwise(agg)


def with_text_features(docs: DataFrame, col: str = "text") -> DataFrame:
    c = F.col(col)
    return (
        docs.withColumn("tokens", token_count(c))
        .withColumn("word_units", word_like_count(c))
        .withColumn("punct_ratio", F.round(punct_ratio(c), 6))
        .withColumn("stopword_ratio", F.round(stopword_ratio(c), 6))
        .withColumn("quality", quality_score(c))
        .withColumn("lang_guess", lang_guess(c))
        .withColumn("fingerprint", rolling_fingerprint(c))
    )
