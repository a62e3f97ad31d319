"""Unit tests for corpus-curation operators (LM familiarity, stratified
mixing sampler, Gopher-style rule gates)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from osmcoastline_spark.functions import curate as C


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat and the dog barked near the barn door", "en"),
        (1, "the cat sat on the mat and the dog barked near the barn door", "en"),
        (2, "zq", "en"),  # shorter than a trigram
        (3, "xqzkj vwpqg zzzzz qqqqq kkkkk jjjjj wwwww", "zz"),  # garbled
        (4, "der hund und die katze und der vogel singen gern", "de"),
        (5, "", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# --------------------------------------------------------------- n-grams


def test_char_ngrams_basic_and_short(spark):
    df = spark.createDataFrame([("abcd",), ("ab",), ("",)], "t string")
    out = [r.g for r in df.select(C.char_ngrams(F.col("t")).alias("g")).collect()]
    assert out == [["abc", "bcd"], [], []]


# --------------------------------------------------- LM familiarity score


def test_lm_familiarity_hand_computed(spark):
    # corpus: "aaab" -> grams aaa, aab ; "aaaa" -> aaa, aaa
    # model: aaa:3, aab:1 ; T=4, V=2 ; denominator per gram slot = T+V = 6
    df = spark.createDataFrame([(1, "aaab"), (2, "aaaa"), (3, "x")], "doc_id long, text string")
    out = {r.doc_id: r for r in C.lm_familiarity(df).collect()}
    assert set(out) == {1, 2}  # doc 3 has no trigrams -> omitted
    # doc 1: ((3+1) + (1+1)) / (2*6) = 0.5 ; doc 2: ((3+1)*2) / (2*6) = 2/3
    assert out[1].n_grams == 2 and out[2].n_grams == 2
    assert math.isclose(out[1].mean_p_ppm, 0.5e6)
    assert math.isclose(out[2].mean_p_ppm, round(2e6 / 3, 9))


def test_lm_familiarity_orders_fluent_above_garbled(spark, docs):
    out = {r.doc_id: r.mean_p_ppm for r in C.lm_familiarity(docs).collect()}
    # the duplicated fluent doc shares all trigrams with its twin; the
    # garbled doc's grams are mostly singletons
    assert out[0] == out[1] > out[3]
    assert 2 not in out and 5 not in out  # too short for trigrams


# ----------------------------------------------------- stratified sampler


def _keeps(doc_id: int, rate: float, salt: str = "mix") -> bool:
    u = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:8]
    return u < (format(int(rate * (1 << 32)), "08x") if rate < 1.0 else "g")


def test_stratified_sample_matches_md5_reference(spark):
    rows = [(i, "t", ["en", "de", "zh"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    rates = {"en": 0.5, "de": 1.0, "zh": 0.125}
    got = {r.doc_id for r in C.stratified_sample(df, rates).collect()}
    want = {i for i, _, lang in rows if _keeps(i, rates[lang])}
    assert got == want
    # de kept wholesale; en/zh thinned
    assert all(i in got for i in range(300) if i % 3 == 1)
    n_en = sum(1 for i in got if i % 3 == 0)
    assert 0 < n_en < 100


def test_stratified_sample_drops_unknown_strata(spark, docs):
    out = C.stratified_sample(docs, {"en": 1.0}).collect()
    assert {r.doc_id for r in out} == {0, 1, 2}  # de/fr/zz strata dropped


def test_stratified_sample_deterministic(spark, docs):
    a = sorted(r.doc_id for r in C.stratified_sample(docs).collect())
    b = sorted(r.doc_id for r in C.stratified_sample(docs.repartition(7)).collect())
    assert a == b


# --------------------------------------------------------- gopher rules


def test_gopher_rules_gates(spark):
    fluent = (
        "the quick brown fox jumps over the lazy dog and the cat naps in "
        "the warm sun while the birds sing of the morning light above the "
        "green field and the old barn"
    )
    rows = [
        (1, fluent),  # passes everything
        (2, "short text"),  # fails r_len
        (3, "zz qq kk " * 30),  # fails r_mwl (mean word len 2) + r_stop + r_lang
        (4, ""),  # fails all
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in C.gopher_rules(df).collect()}
    assert out[1].pass_all == 1
    assert (out[1].r_len, out[1].r_mwl, out[1].r_stop, out[1].r_lang) == (1, 1, 1, 1)
    assert out[2].r_len == 0 and out[2].pass_all == 0
    assert out[3].r_mwl == 0 and out[3].r_stop == 0 and out[3].r_lang == 0
    assert out[3].r_len == 1  # long enough, still rejected
    assert out[4].pass_all == 0 and out[4].mean_word_len == 0.0


def test_gopher_rules_pass_all_is_conjunction(spark, docs):
    for r in C.gopher_rules(docs).collect():
        assert r.pass_all == r.r_len * r.r_mwl * r.r_stop * r.r_lang

# ----------------------------------------------------- repetition stats


def test_word_ngrams_basic_and_short(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("a",), ("",)], "t string")
    out = [r.g for r in df.select(C.word_ngrams(F.col("t"), 3).alias("g")).collect()]
    assert out == [["a b c", "b c d"], [], [], []]


def test_repetition_stats_hand_computed(spark):
    rows = [
        (1, "spam spam spam spam"),   # 1 distinct / 4, top bigram 3/3
        (2, "a b c d e"),             # all distinct, every bigram unique
        (3, "x"),                     # one token, no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in C.repetition_stats(df).collect()}
    assert out[1].tokens == 4 and out[1].distinct_tokens == 1
    assert math.isclose(out[1].dup_word_frac, 0.75)
    assert math.isclose(out[1].top_bigram_frac, 1.0)
    assert out[1].pass_repetition == 0
    assert out[2].dup_word_frac == 0.0
    assert math.isclose(out[2].top_bigram_frac, 0.25)  # 4 bigrams, each once
    assert out[2].r_dup_word == 1
    assert out[3].tokens == 1 and out[3].top_bigram_frac == 0.0
    assert out[3].r_top_bigram == 1  # vacuously clean, not a null


def test_repetition_pass_is_conjunction(spark, docs):
    for r in C.repetition_stats(docs).collect():
        assert r.pass_repetition == r.r_dup_word * r.r_top_bigram


def test_repetition_stats_plan_shape(spark, docs):
    """Pins the measured-winning hybrid shape (BENCH/run_repgates_ab.py):
    the word-side signals come from per-row array functions — exactly ONE
    Generate (the bigram explode) may appear, never a token explode — and
    the exchanges are only the bigram partial-agg chain + the doc_id join
    (≤4). A second Generate or a fifth Exchange reintroduces the old
    4-exchange double-explode form; zero Exchange would mean the fully
    narrow F.aggregate form, which measured 1.4–1.7× slower."""
    plan = C.repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") == 1
    assert 1 <= plan.count("Exchange") <= 4


# ------------------------------------------------------- decontamination


def test_decontaminate_flags_shared_ngrams(spark):
    bench_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, bench_text),                               # benchmark (0 % 17 == 0)
        (1, "alpha beta gamma delta something else"),  # shares a 4-gram
        (2, "one two three four five six"),            # disjoint
        (3, "x y z"),                                  # < 4 words: omitted
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in C.decontaminate(df).collect()}
    assert set(out) == {1, 2}  # bench doc and short doc excluded
    assert out[1].contaminated == 1 and out[1].hit_grams == 1
    assert out[2].contaminated == 0 and out[2].hit_grams == 0
    assert out[1].n_grams == 3 and out[2].n_grams == 3


def test_decontaminate_deterministic_under_repartition(spark):
    rows = [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted((r.doc_id, r.contaminated) for r in C.decontaminate(df).collect())
    b = sorted(
        (r.doc_id, r.contaminated)
        for r in C.decontaminate(df.repartition(7)).collect()
    )
    assert a == b
    # overlapping sliding windows: doc i shares grams with doc i±1, so every
    # candidate adjacent to a benchmark doc (0, 17, 34, 51) is flagged
    flagged = {d for d, c in a if c == 1}
    assert {1, 16, 18, 33, 35, 50, 52} <= flagged


# ------------------------------------------------------- mixture_sample


def _mix_replica(rows, weights, budget, salt="mix"):
    tot = {}
    for i, s, t in rows:
        tot[s] = tot.get(s, 0) + t
    want = []
    for i, s, t in rows:
        rate = float(budget) * weights.get(s, 0.0) / float(tot[s])
        u32 = int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)
        n = math.floor(rate) + (
            1 if u32 < math.floor((rate - math.floor(rate)) * 4294967296.0) else 0
        )
        want.extend((i, e) for e in range(1, int(n) + 1))
    return sorted(want)


def test_mixture_sample_matches_replica(spark):
    rows = [(i, f"s{i % 3}", 50 + i % 40) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    weights = {"s0": 0.6, "s1": 0.1}  # s2 unlisted -> dropped
    got = sorted(
        (r.doc_id, r.epoch)
        for r in C.mixture_sample(df, weights, 30000).collect()
    )
    want = _mix_replica(rows, weights, 30000)
    assert got == want
    # non-vacuous on both sides of rate 1: upsampled epochs AND drops
    assert any(e > 1 for _, e in got)
    assert len({i for i, _ in got}) < len(rows)


def test_mixture_sample_expected_tokens(spark):
    # achieved tokens per source ~ budget * w (law of large numbers check)
    rows = [(i, "a" if i % 2 else "b", 100) for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = (
        C.mixture_sample(df, {"a": 0.7, "b": 0.3}, 100000)
        .groupBy("source")
        .agg(F.sum("n_chars").alias("tok"))
        .collect()
    )
    tok = {r.source: r.tok for r in out}
    assert abs(tok["a"] - 70000) / 70000 < 0.1
    assert abs(tok["b"] - 30000) / 30000 < 0.1


def test_mixture_sample_plan_and_guards(spark):
    rows = [(i, "s0", 10) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    plan = (
        C.mixture_sample(df, {"s0": 1.0}, 100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one corpus-side agg exchange; totals come back via broadcast; no Python
    assert "BroadcastHashJoin" in plan and "Python" not in plan
    assert "SortMergeJoin" not in plan
    with pytest.raises(ValueError, match="token_budget"):
        C.mixture_sample(df, {"s0": 1.0}, 0)
    with pytest.raises(ValueError, match="non-negative"):
        C.mixture_sample(df, {"s0": -0.1}, 100)


# ---------------------------------------------- group_sample_k / shards


def test_group_sample_k_uniform_and_exact(spark):
    rows = [(i, f"g{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = C.group_sample_k(df, 10).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.source, []).append((r.sample_rank, r.doc_id))
    assert set(by_g) == {"g0", "g1", "g2", "g3"}
    # exactly k per group, ranks 1..k, and the sample is the md5-order prefix
    for g, lst in by_g.items():
        assert sorted(r for r, _ in lst) == list(range(1, 11))
        members = [i for i in range(200) if i % 4 == int(g[1])]
        want = sorted(
            members,
            key=lambda i: (hashlib.md5(f"gsk:{i}".encode()).hexdigest(), i),
        )[:10]
        assert sorted(i for _, i in lst) == sorted(want)
    # small group keeps everything
    tiny = spark.createDataFrame([(1, "g"), (2, "g")], ["doc_id", "source"])
    assert C.group_sample_k(tiny, 10).count() == 2
    with pytest.raises(ValueError, match="k must be"):
        C.group_sample_k(df, 0)


def test_assign_shards_matches_sequential_and_is_partition_invariant(spark):
    rows = [(i, 10 + (i * 7) % 90) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    got = {
        r.doc_id: r.shard
        for r in C.assign_shards(df, 1000, order_cols=["doc_id"]).collect()
    }
    acc, want = 0, {}
    for i, t in rows:  # sequential replica over the same order
        want[i] = (acc) // 1000
        acc += t
    assert got == want
    # budget property: every shard's tokens <= budget + max doc size
    sizes = {}
    for i, t in rows:
        sizes[got[i]] = sizes.get(got[i], 0) + t
    assert all(v <= 1000 + 100 for v in sizes.values())
    assert len(sizes) > 10  # non-vacuous: many shards
    # partition invariance: different input partitioning, same assignment
    got2 = {
        r.doc_id: r.shard
        for r in C.assign_shards(
            df.repartition(13), 1000, order_cols=["doc_id"]
        ).collect()
    }
    assert got2 == got
    with pytest.raises(ValueError, match="shard_budget"):
        C.assign_shards(df, 0)


def test_mixture_sample_drops_zero_token_source(spark):
    # an all-zero-token source must drop (not ANSI-divide-by-zero the job)
    rows = [(1, "z", 0), (2, "z", 0), (3, "a", 100)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = C.mixture_sample(df, {"z": 1.0, "a": 1.0}, 100).collect()
    assert {r.source for r in out} == {"a"}


def test_assign_shards_rejects_null_and_negative_tokens(spark):
    bad = spark.createDataFrame(
        [(1, None), (2, 5)], "doc_id long, n_chars long"
    )
    with pytest.raises(Exception, match="NULL or negative"):
        C.assign_shards(bad, 10, order_cols=["doc_id"]).collect()
    neg = spark.createDataFrame([(1, -3)], "doc_id long, n_chars long")
    with pytest.raises(Exception, match="NULL or negative"):
        C.assign_shards(neg, 10, order_cols=["doc_id"]).collect()
