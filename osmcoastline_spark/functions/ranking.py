"""BM25 / TF-IDF relevance ranking over the documents corpus.

A training-data pipeline needs query-relevance scoring for targeted
decontamination (find the corpus docs most similar to an eval prompt),
quality-weighted sampling, and retrieval-style corpus audits. This module
implements BM25 (Robertson/Sparck Jones, public BM25 formula as shipped by
Lucene/Elasticsearch) the Spark-first way:

  1. per-document term frequency is a PURE COLUMN EXPRESSION — the document
     text is normalized once ([^a-z0-9]+ -> space), internal spaces doubled
     so every token owns private delimiters, and tf(term) falls out of a
     length-difference after replace(' term ', ''). No explode, no split
     array, no shuffle of corpus rows, whole-stage codegen end to end.
  2. corpus statistics (N, avg doclen, per-term document frequency) are ONE
     single-row aggregate over those same tf columns — one pass, one tiny
     result — broadcast-joined back to every row.
  3. top-k is orderBy(...).limit(k): Spark plans TakeOrdered (per-partition
     heap + driver merge of k rows), never a global sort.

At 100 TB the corpus never shuffles at all: stage 1+2 is a scan with a
map-side partial aggregate, stage 3 moves k rows per partition. The number
of query terms is the column fan-out — fine for the tens-of-terms queries
this is for; a thousands-of-terms workload should pivot to the vocab_counts
explode path instead.

Oracle determinism: the `rational` idf variant ((N - df + 0.5)/(df + 0.5)
+ 1, the log's argument in the BM25+ form) keeps the whole score inside
+-*/ on doubles, which are IEEE-bit-identical across Spark and DuckDB when
the expression trees match; `ln()` differs by 1 ULP between the engines
(measured: ln(3.0)), so the classic `lucene` log-idf form is offered too
but verified in pytest against python math.log rather than in the DuckDB
oracle. Per-document score is a FIXED-ORDER sum of the per-term weight
columns (w_t1 + w_t2 + ...), not an agg over an exploded frame, so there
is no float-reassociation across engines.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TERM_RE = re.compile(r"^[a-z0-9]+$")


def _normalized(text: Column) -> Column:
    """Lowercased, [^a-z0-9]+ collapsed to single spaces, trimmed.

    NULL text normalizes to '' (coalesce) so a NULL-text doc behaves
    exactly like an empty one: dl=0, tf=0, score=0 — instead of NULL
    propagating into dl/tf/score (which would drop the doc from top-k
    while it still counted in n_docs and deflated avgdl for everyone
    else)."""
    return F.trim(
        F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))), "[^a-z0-9]+", " ")
    )


def _doclen(norm: Column) -> Column:
    """Whitespace token count of the normalized text (empty -> 0)."""
    return F.when(F.length(norm) == 0, F.lit(0).cast("long")).otherwise(
        (F.length(norm) - F.length(F.replace(norm, F.lit(" "), F.lit(""))) + 1).cast(
            "long"
        )
    )


def _tf(norm: Column, term: str) -> Column:
    """Exact tf via length-difference on the space-doubled padded text.

    Doubling internal spaces gives every token a private delimiter pair, so
    non-overlapping replace of ' term ' removes exactly one occurrence per
    true token match (adjacent identical tokens included). The length drop
    divided by len(' term ') is the count — integer-exact.
    """
    padded = F.concat(F.lit(" "), F.replace(norm, F.lit(" "), F.lit("  ")), F.lit(" "))
    pat = f" {term} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(pat), F.lit(""))))
        / F.lit(len(pat))
    ).cast("long")


def bm25(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    idf: str = "rational",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document against `terms` with BM25.

    Returns (id_col, dl, tf_<term>..., score) with score =
    sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)),
    summed in the fixed order of `terms`.

    idf='rational': (N - df + 0.5) / (df + 0.5) + 1   (oracle-exact, no ln)
    idf='lucene':   ln(1 + (N - df + 0.5) / (df + 0.5))  (classic; pytest)
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    if len(set(terms)) != len(terms):
        raise ValueError(f"duplicate query terms: {terms}")
    for t in terms:
        if not _TERM_RE.match(t):
            raise ValueError(
                f"term {t!r} is not normalized (lowercase [a-z0-9]+ only)"
            )
    if idf not in ("rational", "lucene"):
        raise ValueError(f"unknown idf variant {idf!r}")

    norm = _normalized(F.col(text_col))
    per_doc = docs.select(
        F.col(id_col),
        _doclen(norm).alias("dl"),
        *[_tf(norm, t).alias(f"tf_{t}") for t in terms],
    )

    # ONE single-row corpus aggregate; broadcast back to every row.
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in terms
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))

    n = F.col("n_docs").cast("double")
    # a corpus of only empty/whitespace docs has avgdl = 0; without the
    # guard dl/avgdl is 0/0 = NaN and bm25_topk would rank the NaN
    # scores FIRST. Every tf is 0 there, so the score is 0 either way —
    # the guard just keeps the arithmetic finite.
    avgdl = F.when(F.col("sum_dl") > 0, F.col("sum_dl").cast("double") / n).otherwise(
        F.lit(1.0)
    )

    def weight(t: str) -> Column:
        tf = F.col(f"tf_{t}").cast("double")
        df = F.col(f"df_{t}").cast("double")
        ratio = (n - df + F.lit(0.5)) / (df + F.lit(0.5))
        idf_c = ratio + F.lit(1.0) if idf == "rational" else F.ln(F.lit(1.0) + ratio)
        dl_norm = F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
        # tf=0 with b=1.0 (dl=0 ⇒ dl_norm=0) or k1=0 zeroes the whole
        # denominator: 0/0 crashes under ANSI, and a non-ANSI NaN would
        # rank empty docs into the top-k. The numerator is 0 whenever the
        # denominator is (tf=0 in both factors), so the term's
        # contribution is exactly 0 — guard, don't divide.
        denom = tf + F.lit(k1) * dl_norm
        return F.when(denom > 0, idf_c * (tf * F.lit(k1 + 1.0)) / denom).otherwise(
            F.lit(0.0)
        )

    score = weight(terms[0])
    for t in terms[1:]:
        score = score + weight(t)

    return scored.select(
        F.col(id_col),
        F.col("dl"),
        *[F.col(f"tf_{t}") for t in terms],
        score.alias("score"),
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
    idf: str = "rational",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 score, ties broken by id (deterministic).

    orderBy + limit plans as TakeOrdered — per-partition k-heap, k rows to
    the driver — never a single-partition global sort.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    scored = bm25(docs, terms, k1=k1, b=b, idf=idf, text_col=text_col, id_col=id_col)
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
