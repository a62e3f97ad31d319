"""Document-cleaning operators: corpus line dedup, C4 line filters, PII."""

import pytest

from osmcoastline_spark.functions import clean as CL


@pytest.fixture(scope="module")
def spark():
    from osmcoastline_spark import get_spark

    s = get_spark("test-clean", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


# ----------------------------------------------------------- line_dedup


def test_line_dedup_keeps_global_first(spark):
    boiler = "accept all cookies"
    rows = [
        (1, f"unique alpha\n{boiler}\nunique beta"),
        (2, f"{boiler}\nunique gamma"),
        (3, f"unique delta\n{boiler}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in CL.line_dedup(df).collect()}
    # doc 1 holds the globally first occurrence (min doc_id, then pos)
    assert out[1].text_dedup == f"unique alpha\n{boiler}\nunique beta"
    assert out[2].text_dedup == "unique gamma"
    assert out[3].text_dedup == "unique delta"
    assert (out[2].n_lines, out[2].n_kept) == (2, 1)


def test_line_dedup_in_doc_repeats_and_empties(spark):
    # repeats INSIDE one doc collapse to the first; empty lines always kept
    rows = [(7, "same line\n\nsame line\nother line")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = CL.line_dedup(df).collect()[0]
    assert r.text_dedup == "same line\n\nother line"
    assert (r.n_lines, r.n_kept) == (4, 3)


def test_line_dedup_doc_fully_deduped(spark):
    rows = [(1, "only content"), (2, "only content")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in CL.line_dedup(df).collect()}
    assert out[1].text_dedup == "only content"
    assert out[2].text_dedup == "" and out[2].n_kept == 0


def test_line_dedup_deterministic_under_repartition(spark):
    rows = [(i, f"shared line\ndoc {i} line") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted((r.doc_id, r.text_dedup) for r in CL.line_dedup(df).collect())
    b = sorted(
        (r.doc_id, r.text_dedup)
        for r in CL.line_dedup(df.repartition(7, "text")).collect()
    )
    assert a == b
    assert dict(a)[0] == "shared line\ndoc 0 line"
    assert dict(a)[13] == "doc 13 line"


# ------------------------------------------------------ c4_line_filters


def test_c4_line_filters_each_rule(spark):
    lines = [
        "This first sentence has enough words here.",  # keep
        "no terminal punctuation so this line drops",  # no [.!?"]$
        "Too short.",  # < 5 words
        "A curly { brace drops this whole line.",  # {
        "Lorem ipsum dolor sit amet padding text.",  # lorem ipsum
        "Please enable JavaScript to view the comments.",  # javascript
        'He said "this quoted line has enough words."',  # keep (quote end)
    ]
    df = spark.createDataFrame([(1, "\n".join(lines))], "doc_id long, text string")
    r = CL.c4_line_filters(df).collect()[0]
    assert r.text_clean == lines[0] + "\n" + lines[6]
    assert (r.n_lines, r.n_kept) == (7, 2)


def test_c4_line_filters_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "x.")], "doc_id long, text string")
    plan = (
        CL.c4_line_filters(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 0 and plan.count("Generate") == 0


# ----------------------------------------------------------- pii_redact


def test_pii_redact_categories_and_order(spark):
    text = (
        "mail bob.smith+x@sub.example.co.uk then ip 192.168.0.1 and "
        "phone +44 207 946 0958 done"
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = CL.pii_redact(df).collect()[0]
    assert r.text_redacted == "mail <EMAIL> then ip <IP> and phone <PHONE> done"
    assert (r.n_emails, r.n_ips, r.n_phones, r.has_pii) == (1, 1, 1, 1)


def test_pii_redact_clean_text_untouched(spark):
    df = spark.createDataFrame(
        [(1, "no pii here, just words and 12 numbers")], "doc_id long, text string"
    )
    r = CL.pii_redact(df).collect()[0]
    assert r.text_redacted == "no pii here, just words and 12 numbers"
    assert (r.n_emails, r.n_ips, r.n_phones, r.has_pii) == (0, 0, 0, 0)


def test_pii_redact_multiple_and_idempotent(spark):
    df = spark.createDataFrame(
        [(1, "a@b.io c@d.io 10.0.0.1 10.0.0.2")], "doc_id long, text string"
    )
    out = CL.pii_redact(df)
    r = out.collect()[0]
    assert r.text_redacted == "<EMAIL> <EMAIL> <IP> <IP>"
    assert (r.n_emails, r.n_ips) == (2, 2)
    # a second pass over already-redacted text finds nothing
    again = CL.pii_redact(
        out.select("doc_id", out.text_redacted.alias("text"))
    ).collect()[0]
    assert again.has_pii == 0 and again.text_redacted == r.text_redacted


# ------------------------------------------------------ chunk_documents


def test_chunk_documents_overlap_and_tail(spark):
    words = " ".join(f"w{i}" for i in range(1, 21))  # 20 tokens
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    out = sorted(
        (r.chunk_id, r.chunk_text, r.n_tokens, r.doc_tokens)
        for r in CL.chunk_documents(df, chunk_tokens=8, overlap=2).collect()
    )
    # step 6: starts 1,7,13; start 19 contributes only overlap -> dropped
    assert [c[0] for c in out] == [1, 2, 3]
    assert out[0][1] == " ".join(f"w{i}" for i in range(1, 9))
    assert out[1][1] == " ".join(f"w{i}" for i in range(7, 15))
    assert out[2][1] == " ".join(f"w{i}" for i in range(13, 21))
    assert [c[2] for c in out] == [8, 8, 8] and out[0][3] == 20


def test_chunk_documents_short_tail_and_short_doc(spark):
    words21 = " ".join(f"w{i}" for i in range(1, 22))  # 21 tokens
    df = spark.createDataFrame(
        [(1, words21), (2, "a b c"), (3, "  ")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in CL.chunk_documents(df, 8, 2).collect()
           if r.chunk_id == 4 or r.doc_id != 1}
    rows1 = [r for r in CL.chunk_documents(df, 8, 2).collect() if r.doc_id == 1]
    assert max(r.chunk_id for r in rows1) == 4
    tail = [r for r in rows1 if r.chunk_id == 4][0]
    assert tail.chunk_text == "w19 w20 w21" and tail.n_tokens == 3
    assert out[2].chunk_text == "a b c" and out[2].n_tokens == 3
    assert 3 not in out  # empty doc yields no rows


def test_chunk_documents_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        CL.chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 0


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        CL.chunk_documents(df, chunk_tokens=8, overlap=8)


# ----------------------------------------------------- curation_pipeline


def test_curation_pipeline_composition(spark):
    boiler = "Subscribe to our newsletter for the latest updates and offers today."
    good = "\n".join([
        "The quick brown fox jumps over the lazy dog near the river bank today.",
        "Many people walk along the shore and watch boats of every size pass slowly.",
        "Fresh bread and warm soup taste good after a long cold morning of work.",
        boiler,
    ])
    loser = "\n".join([
        "no punctuation here so c4 drops it",
        boiler,  # dedup-stolen by doc 1
    ])
    hopeless = "just words\nwithout any terminal punctuation at all"
    df = spark.createDataFrame(
        [(1, good), (2, loser), (3, hopeless)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in CL.curation_pipeline(df).collect()}

    # doc 1: keeps all four lines (c4 passes, it owns the boilerplate),
    # clears every gate -> keep=1
    assert out[1].n_kept == 4 and out[1].keep == 1 and out[1].pass_all == 1
    assert boiler in out[1].text_final

    # doc 2: c4 drops the unpunctuated line, dedup steals the boilerplate
    # -> empty text -> r_len fails, repetition row coalesces to 0, keep=0
    assert out[2].text_final == "" and out[2].n_kept == 0
    assert out[2].pass_all == 0 and out[2].pass_repetition == 0
    assert out[2].keep == 0

    # doc 3: every line fails c4 -> empty text, keep=0 (and no crash)
    assert out[3].text_final == "" and out[3].keep == 0


def test_curation_pipeline_single_line_gate_interaction(spark):
    # a doc whose cleaned text is ONE short line still flows through the
    # gates: repetition's top-bigram fraction is 1/(n-1) = 0.2 > 0.08 on
    # six words (the gate is calibrated for documents, not fragments)
    df = spark.createDataFrame(
        [(5, "Short but valid sentence with words.")], "doc_id long, text string"
    )
    r = CL.curation_pipeline(df).collect()[0]
    assert r.n_kept == 1 and r.pass_repetition == 0
    assert r.r_len == 0 and r.keep == 0  # < 150 chars


def test_pack_sequences_lattice_and_straddle(spark):
    """Hand lattice: bucket-local running sums, 0-based pack ids, exact
    offsets, straddle flag at the boundary, and bucket independence."""
    from osmcoastline_spark.functions.clean import pack_sequences

    chunks = spark.createDataFrame(
        [
            # group 0: doc 0 (3 chunks of 40) + doc 8 (1 chunk of 30)
            (0, 1, 40), (0, 2, 40), (0, 3, 40), (8, 1, 30),
            # group 1: doc 1 (one chunk exactly seq_len)
            (1, 1, 64),
            (1, 2, 10),
        ],
        "doc_id long, chunk_id long, n_tokens long",
    )
    out = {
        (r["doc_id"], r["chunk_id"]): (
            r["pack_group"], r["pack_id"], r["pack_offset"], r["straddles"]
        )
        for r in pack_sequences(chunks, seq_len=64, buckets=8).collect()
    }
    assert out[(0, 1)] == (0, 0, 0, False)
    assert out[(0, 2)] == (0, 0, 40, True)    # 40+40 crosses 64
    assert out[(0, 3)] == (0, 1, 16, False)   # cum 80 -> pack 1 offset 16
    assert out[(8, 1)] == (0, 1, 56, True)    # cum 120; 56+30 crosses
    assert out[(1, 1)] == (1, 0, 0, False)    # exactly seq_len: no straddle
    assert out[(1, 2)] == (1, 1, 0, False)    # next chunk starts pack 1 clean


def test_pack_sequences_deterministic_under_repartition(spark):
    from osmcoastline_spark.functions.clean import chunk_documents, pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    chunks = chunk_documents(docs, chunk_tokens=16, overlap=4)
    a = sorted(
        map(tuple, pack_sequences(chunks, seq_len=64, buckets=8).collect())
    )
    b = sorted(
        map(
            tuple,
            pack_sequences(chunks.repartition(17), seq_len=64, buckets=8).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_pack_sequences_rejects_bad_seq_len(spark):
    import pytest as _pytest

    from osmcoastline_spark.functions.clean import pack_sequences

    chunks = spark.createDataFrame([(0, 1, 5)], "doc_id long, chunk_id long, n_tokens long")
    with _pytest.raises(ValueError, match="seq_len"):
        pack_sequences(chunks, seq_len=0)


def test_pack_sequences_rejects_bad_buckets(spark):
    """buckets=0 would make pmod return NULL and silently collapse every
    row into one NULL pack_group (a single global sort) — fail loudly."""
    import pytest as _pytest

    from osmcoastline_spark.functions.clean import pack_sequences

    chunks = spark.createDataFrame([(0, 1, 5)], "doc_id long, chunk_id long, n_tokens long")
    with _pytest.raises(ValueError, match="buckets"):
        pack_sequences(chunks, buckets=0)


def test_curation_pipeline_custom_id_col(spark):
    """id_col must actually thread through the composed stages (the gates
    hardcoded doc_id and crashed on any other id column)."""
    from osmcoastline_spark.functions.clean import curation_pipeline

    docs = spark.createDataFrame(
        [
            (7, "This is a reasonably long natural language document that should "
                "pass the basic length gate because it keeps going with plain "
                "words and the usual little stopwords in it for a while longer."),
            (9, "x"),
        ],
        "my_id long, text string",
    )
    out = curation_pipeline(docs, id_col="my_id")
    rows = {r.my_id: r.keep for r in out.collect()}
    assert set(rows) <= {7, 9} and len(rows) >= 1
    # and the default path still works unchanged
    out2 = curation_pipeline(docs.withColumnRenamed("my_id", "doc_id"))
    assert {r.doc_id for r in out2.collect()} == set(rows)


def test_corpus_diff(spark):
    import hashlib

    from osmcoastline_spark.functions.clean import corpus_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (5, "e")], ["doc_id", "text"]
    )
    got = {r.doc_id: (r.status, r.old_hash, r.new_hash) for r in corpus_diff(old, new).collect()}
    h = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert got == {
        2: ("changed", h("b"), h("B2")),
        3: ("removed", h("c"), None),
        4: ("removed", h("d"), None),
        5: ("added", None, h("e")),
    }  # unchanged doc 1 excluded
    plan = corpus_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "CartesianProduct" not in plan


def test_corpus_diff_null_text(spark):
    from osmcoastline_spark.functions.clean import corpus_diff

    old = spark.createDataFrame([(1, None), (2, "x")], "doc_id long, text string")
    new = spark.createDataFrame([(1, None), (2, None)], "doc_id long, text string")
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    # NULL==NULL text is unchanged (excluded); text->NULL is changed, not removed
    assert got == {2: "changed"}
