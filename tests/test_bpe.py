"""Unit tests for distributed BPE tokenizer training (functions/bpe.py).

The semantics pin is a pure-Python classic Sennrich BPE (simultaneous
left-to-right merge via a boundary-aware regex) run over the same corpus;
the Spark trainer must reproduce its merge table and tokenizations
exactly, including the chain-adjacent cases ('ababab...') where the
bounded-replace formulation needs multiple passes per step.
"""

import collections
import re

import pytest
from pyspark.sql import functions as F

from osmcoastline_spark.functions import bpe as B


def _ref_bpe(texts, num_merges):
    """Classic BPE: word-freq table, argmax pair (count desc, pair asc),
    simultaneous LTR merge (lookaround regex does not consume boundaries,
    so adjacent occurrences all merge in one step)."""
    freq = collections.Counter()
    for t in texts:
        for w in re.findall("[a-z]+", (t or "").lower()):
            freq[w] += 1
    vocab = {" ".join(w): c for w, c in freq.items()}
    merges = []
    for step in range(1, num_merges + 1):
        pairs = collections.Counter()
        for w, c in vocab.items():
            syms = w.split(" ")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        top = max(pairs.values())
        a, b = min(p for p, c in pairs.items() if c == top)
        merges.append((step, a, b, a + b, top))
        pat = re.compile(
            r"(?<!\S)" + re.escape(a) + " " + re.escape(b) + r"(?!\S)"
        )
        vocab = {pat.sub(a + b, w): c for w, c in vocab.items()}
    return merges, vocab


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "low lower lowest low low newer newest new"),
        (1, "wider wide widest new newer low lower"),
        # chain-adjacent repeats: merging (a,b) inside 'ababab' and
        # (l,l) inside 'llll' exercises the multi-pass replace bound
        (2, "ababab ababababab llll lllll abab"),
        (3, ""),  # empty doc must keep a zero-count row
        (4, "Mixed CASE and punct!! still lower-cases to words"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_merges_match_reference(spark, docs):
    texts = [r.text for r in docs.collect()]
    ref, _ = _ref_bpe(texts, 10)
    got = [tuple(r) for r in B.bpe_train(docs, num_merges=10).collect()]
    assert got == ref


def test_tokenize_words_match_reference(spark, docs):
    texts = [r.text for r in docs.collect()]
    _, ref_vocab = _ref_bpe(texts, 10)
    got = {
        r.word: list(r.tokens)
        for r in B.bpe_tokenize_words(docs, num_merges=10).collect()
    }
    ref = {w.replace(" ", ""): w.split(" ") for w in ref_vocab}
    assert got == ref
    # tokens always reassemble the word
    for w, toks in got.items():
        assert "".join(toks) == w


def test_token_counts(spark, docs):
    texts = {r.doc_id: r.text for r in docs.collect()}
    _, ref_vocab = _ref_bpe(list(texts.values()), 10)
    tok_len = {w.replace(" ", ""): len(w.split(" ")) for w in ref_vocab}
    out = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in B.bpe_token_counts(docs, num_merges=10).collect()
    }
    assert set(out) == set(texts)  # every doc keeps a row
    for did, text in texts.items():
        words = re.findall("[a-z]+", text.lower())
        assert out[did] == (
            len(words),
            sum(tok_len[w] for w in words),
        ), did
    assert out[3] == (0, 0)


def test_early_stop_no_pairs(spark):
    # single-char words only: zero adjacent pairs, zero merges, and the
    # token count degrades to the word count
    docs = spark.createDataFrame([(0, "a b c a b")], "doc_id long, text string")
    assert B.bpe_train(docs, num_merges=4).count() == 0
    row = B.bpe_token_counts(docs, num_merges=4).collect()[0]
    assert (row.n_words, row.n_tokens) == (5, 5)


def test_tokenize_join_is_broadcast(spark, docs):
    """The 100-TB shape: tokenization joins corpus word instances against
    the vocabulary-bounded word table as a BROADCAST join, and the merge
    apply is pure Catalyst (no Python eval in the final plan)."""
    plan = B.bpe_token_counts(docs, num_merges=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
