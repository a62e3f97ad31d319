"""fuzzy_pairs: exact all-pairs edit-distance join via Ed-Join-style
set-prefix filtering (dedup.py:fuzzy_pairs). The headline test is
definitional: the operator's output must equal a pure-Python DP
levenshtein over ALL pairs, on a corpus built to stress every tier
boundary (repetitive strings, sub-q strings, empty strings, exact
clones, planted single-edit mutations, and pairs at exactly d and d+1).
"""

import random

import pytest
from pyspark.sql import functions as F

from osmcoastline_spark.functions.dedup import fuzzy_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, d):
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ia, sa), (ib, sb) = rows[i], rows[j]
            if abs(len(sa) - len(sb)) <= d:
                dist = _lev(sa, sb)
                if dist <= d:
                    out.add((min(ia, ib), max(ia, ib), dist))
    return out


def _adversarial_corpus():
    rng = random.Random(42)
    words = ["spark", "hash", "merge", "scan", "row", "agg", "key", "batch"]
    rows = []
    nid = 0

    def add(s):
        nonlocal nid
        rows.append((nid, s))
        nid += 1

    # normal strings + planted single-char mutations (ed == 1)
    for _ in range(30):
        s = " ".join(rng.choice(words) for _ in range(4))
        add(s)
        if rng.random() < 0.5:
            p = rng.randrange(len(s))
            add(s[:p] + "Z" + s[p + 1 :])
    # exact clones (ed == 0)
    add("spark hash merge scan")
    add("spark hash merge scan")
    # pairs at exactly d=2 and d+1=3
    add("abcdefghijkl")
    add("abXdefghijkZ")  # ed 2
    add("abXdYfghijkZ")  # ed 3 from the base
    # repetitive strings: tiny distinct-gram sets despite long length
    add("a" * 40)
    add("a" * 39 + "b")  # ed 1, |set| = 2
    add("ab" * 20)
    # sub-q and empty strings (zero grams -> small tier)
    add("")
    add("x")
    add("xy")
    add("xz")
    add("ab")
    return rows


def test_fuzzy_pairs_matches_bruteforce(spark):
    rows = _adversarial_corpus()
    for d, q in [(1, 3), (2, 3), (2, 4), (3, 2), (3, 3)]:
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in fuzzy_pairs(df, d=d, q=q).collect()
        }
        want = _brute(rows, d)
        assert got == want, (
            f"d={d} q={q}: missing={sorted(want - got)[:5]} "
            f"extra={sorted(got - want)[:5]}"
        )


def test_fuzzy_pairs_no_quadratic_plan(spark):
    rows = [(i, f"doc number {i} padded with stable text") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    plan = fuzzy_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Python" not in plan  # pure Catalyst: levenshtein is a JVM expr


def test_fuzzy_pairs_small_tier_loud_cap(spark):
    # >cap degenerate same-length strings: the band explode must fail
    # loudly rather than plan a quadratic band
    rows = [(i, "ab") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    with pytest.raises(Exception, match="length band exceeds"):
        fuzzy_pairs(df, d=1, q=3, max_band_rows=10).collect()


def test_fuzzy_pairs_guards(spark):
    df = spark.range(1).select(F.col("id").alias("doc_id"), F.lit("x").alias("text"))
    with pytest.raises(ValueError, match="d must be"):
        fuzzy_pairs(df, d=0)
    with pytest.raises(ValueError, match="q must be"):
        fuzzy_pairs(df, q=1)


# hypothesis property: operator == brute force on arbitrary small corpora
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _corpus = st.lists(
        st.text(alphabet="abcZ ", min_size=0, max_size=14),
        min_size=0,
        max_size=12,
    )

    @settings(max_examples=12, deadline=None)
    @given(_corpus, st.integers(min_value=1, max_value=2))
    def test_fuzzy_pairs_property(texts, d):
        # session fixture unavailable inside @given: reuse the live session
        from osmcoastline_spark.session import get_spark

        spark = get_spark("osmcoastline-tests", master="local[4]", shuffle_partitions=8)
        rows = list(enumerate(texts))
        if not rows:
            return
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in fuzzy_pairs(df, d=d, q=3, checkpoint=False).collect()
        }
        assert got == _brute(rows, d)
except ImportError:  # pragma: no cover - hypothesis is baked into the env
    pass


def test_fuzzy_pairs_lazy_optout_runs_no_job(spark):
    # checkpoint=False is the lazy composition path: building the
    # DataFrame must not trigger any job (the default checkpoint=True
    # documents its construction-time job; under AQE there is no
    # lazy checkpoint to offer — eager=False materializes stages too)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    fuzzy_pairs(df, checkpoint=False)  # no action
    after = tracker.getJobIdsForGroup(None)
    assert before == after
