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
