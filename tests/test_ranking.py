"""BM25 / TF-IDF ranking (functions/ranking.py).

The rational-idf form is oracle-verified against DuckDB in q_bm25_topk;
here we verify the pieces against a definitional pure-Python BM25 (explicit
tokenizer + math.log), including the lucene log-idf variant the oracle
can't carry (ln() differs by 1 ULP across engines).
"""

import math
import re

import pytest

from osmcoastline_spark.functions.ranking import bm25, bm25_topk

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "fox fox fox"),  # adjacent duplicates — the space-doubling case
    (2, "a quick, QUICK brown-fox!"),  # punctuation + case normalization
    (3, ""),  # empty doc: dl = 0, tf = 0
    (4, "dog dog quick dog"),
    (5, "unrelated words entirely here"),
]
TERMS = ["fox", "quick", "dog"]


def _py_bm25(rows, terms, k1=1.2, b=0.75, idf="rational"):
    """Definitional reference: explicit token lists, classic formulas."""
    toks = {i: re.sub(r"[^a-z0-9]+", " ", t.lower()).split() for i, t in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            ratio = (n - df[t] + 0.5) / (df[t] + 0.5)
            w_idf = ratio + 1.0 if idf == "rational" else math.log(1.0 + ratio)
            s += w_idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        out[i] = (s, {t: v.count(t) for t in terms}, len(v))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_tf_and_dl_exact(spark, docs_df):
    rows = {r.doc_id: r for r in bm25(docs_df, TERMS).collect()}
    ref = _py_bm25(DOCS, TERMS)
    for i, (_, tfs, dl) in ref.items():
        assert rows[i].dl == dl, i
        for t in TERMS:
            assert rows[i][f"tf_{t}"] == tfs[t], (i, t)
    # the space-doubling trick must count ADJACENT duplicates exactly
    assert rows[1].tf_fox == 3
    # punctuation/case normalization: "quick, QUICK" and "brown-fox"
    assert rows[2].tf_quick == 2 and rows[2].tf_fox == 1
    assert rows[3].dl == 0 and rows[3].score == 0.0


@pytest.mark.parametrize("variant", ["rational", "lucene"])
def test_scores_match_definitional(spark, docs_df, variant):
    rows = {r.doc_id: r.score for r in bm25(docs_df, TERMS, idf=variant).collect()}
    ref = _py_bm25(DOCS, TERMS, idf=variant)
    for i, (s, _, _) in ref.items():
        assert rows[i] == pytest.approx(s, rel=1e-12), (variant, i)


def test_topk_order_and_tiebreak(spark, docs_df):
    got = bm25_topk(docs_df, TERMS, k=3).collect()
    ref = _py_bm25(DOCS, TERMS)
    want = sorted(ref, key=lambda i: (-ref[i][0], i))[:3]
    assert [r.doc_id for r in got] == want
    assert [r.score for r in got] == sorted((r.score for r in got), reverse=True)


def test_topk_plan_is_take_ordered_broadcast(spark, docs_df):
    plan = bm25_topk(docs_df, TERMS, k=3)._jdf.queryExecution().executedPlan().toString()
    # top-k must be the per-partition-heap operator, not a global sort
    assert "TakeOrderedAndProject" in plan
    # the 1-row stats side must come back as a broadcast, never SMJ/shuffle
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "Broadcast" in plan


def test_validation():
    import pyspark.sql

    df = None  # validation fires before any DataFrame use

    with pytest.raises(ValueError, match="non-empty"):
        bm25(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        bm25(df, ["fox", "fox"])
    with pytest.raises(ValueError, match="not normalized"):
        bm25(df, ["Fox"])
    with pytest.raises(ValueError, match="not normalized"):
        bm25(df, ["two words"])
    with pytest.raises(ValueError, match="idf variant"):
        bm25(df, ["fox"], idf="classic")
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk(df, ["fox"], k=0)
    assert pyspark.sql is not None


def test_degenerate_all_empty_corpus_scores_zero(spark):
    """avgdl = 0 (only empty/whitespace docs) must not produce NaN scores
    — orderBy(desc) ranks NaN above every real double, so a degenerate
    corpus would return confident-looking top-k rows."""
    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "\t")], "doc_id long, text string"
    )
    rows = bm25_topk(docs, ["fox"], k=3).collect()
    assert [r.score for r in rows] == [0.0, 0.0, 0.0]


def test_empty_doc_with_b_one_scores_zero(spark):
    """b=1.0 makes dl_norm=0 for an empty doc; with tf=0 the BM25 weight
    denominator is 0 — the guard must yield score 0 (the numerator is 0
    too), not an ANSI DIVIDE_BY_ZERO crash or a NaN that non-ANSI sorts
    into the top-k."""
    df = spark.createDataFrame(
        [(0, "coast coast line"), (1, ""), (2, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.score for r in bm25(df, ["coast"], b=1.0).collect()}
    assert got[0] > 0.0
    assert got[1] == 0.0
    assert got[2] == 0.0, "NULL text must behave exactly like empty text"
    top = bm25_topk(df, ["coast"], k=2, b=1.0).collect()
    assert top[0].doc_id == 0, "empty docs must not occupy the top-k"


def test_null_text_does_not_skew_avgdl(spark):
    """A NULL-text doc must produce the same scores as the identical
    corpus with '' in its place (NULL propagating into dl would deflate
    avgdl for every other doc)."""
    a = spark.createDataFrame(
        [(0, "coast line here"), (1, None)], "doc_id long, text string"
    )
    b_ = spark.createDataFrame(
        [(0, "coast line here"), (1, "")], "doc_id long, text string"
    )
    sa = {r.doc_id: r.score for r in bm25(a, ["coast"]).collect()}
    sb = {r.doc_id: r.score for r in bm25(b_, ["coast"]).collect()}
    assert sa == sb
