"""URL curation family (functions/urls.py): canonicalization rules,
keep-first URL dedup, and the skew-safe per-domain top-N cap (which must
be bit-identical to the naive single-window formulation)."""

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from osmcoastline_spark.functions.urls import (
    canonicalize_urls,
    domain_topn,
    url_keep_first,
)


CASES = [
    # (url, canonical, domain)
    ("HTTP://WWW.Example.COM:80/Path/?utm_source=x&id=5#frag",
     "http://www.example.com/Path?id=5", "example.com"),
    ("http://example.com/Path?id=5",
     "http://example.com/Path?id=5", "example.com"),
    ("https://Sub.Example.com:443/a/", "https://sub.example.com/a", "example.com"),
    ("https://sub.example.com/a", "https://sub.example.com/a", "example.com"),
    ("http://host.io:8080/x", "http://host.io:8080/x", "host.io"),  # non-default port kept
    ("plain-no-scheme/path/", "plain-no-scheme/path", "plain-no-scheme"),
    ("http://single", "http://single", "single"),
    ("https://www.a.b.co.uk/q?ref=z&fbclid=1&keep=2",
     "https://www.a.b.co.uk/q?keep=2", "co.uk"),  # documented PSL approximation
    ("https://e.com/", "https://e.com", "e.com"),
    ("https://e.com/?utm_campaign=x", "https://e.com", "e.com"),
]


def test_canonicalize_hand_cases(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(CASES)], ["doc_id", "url"]
    )
    got = {r.doc_id: (r.canonical_url, r.domain) for r in canonicalize_urls(df).collect()}
    for i, (_, canon, dom) in enumerate(CASES):
        assert got[i] == (canon, dom), f"case {i}: {got[i]}"


def test_canonicalize_is_projection_only(spark):
    df = spark.createDataFrame([(1, "http://a.b/c")], ["doc_id", "url"])
    plan = canonicalize_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_url_keep_first(spark):
    rows = [(3, "u1"), (1, "u1"), (2, "u2"), (7, "u1")]
    df = spark.createDataFrame(rows, ["doc_id", "canonical_url"])
    got = {(r.doc_id, r.canonical_url, r.dup_count) for r in url_keep_first(df).collect()}
    assert got == {(1, "u1", 3), (2, "u2", 1)}


def test_domain_topn_matches_naive_window(spark):
    rng = random.Random(7)
    rows = []
    for i in range(400):
        dom = "hot.com" if rng.random() < 0.6 else f"d{rng.randrange(8)}.org"
        rows.append((i, dom, rng.randrange(100)))
    df = spark.createDataFrame(rows, ["doc_id", "domain", "quality"])
    order = [F.col("quality").desc(), F.col("doc_id")]
    got = {
        (r.doc_id, r.domain_rank)
        for r in domain_topn(df, 5, order_cols=order, salt_buckets=16).collect()
    }
    w = Window.partitionBy("domain").orderBy(*order)
    want = {
        (r.doc_id, r.rnk)
        for r in df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .collect()
    }
    assert got == want


def test_domain_topn_guard(spark):
    df = spark.createDataFrame([(1, "d", 1)], ["doc_id", "domain", "q"])
    with pytest.raises(ValueError, match="n must be"):
        domain_topn(df, 0)
    # domain-only frame: no deterministic order exists -> loud error
    only = spark.createDataFrame([("a",), ("a",), ("b",)], ["domain"])
    with pytest.raises(ValueError, match="no deterministic order"):
        domain_topn(only, 1)


def test_url_keep_first_duplicate_input_rows(spark):
    # a crawl log ingested twice: winner emitted ONCE, dup_count counts all
    rows = [(1, "u"), (1, "u"), (3, "u"), (2, "v")]
    df = spark.createDataFrame(rows, ["doc_id", "canonical_url"])
    got = sorted((r.doc_id, r.canonical_url, r.dup_count) for r in url_keep_first(df).collect())
    assert got == [(1, "u", 3), (2, "v", 1)]


def _mirror(url):
    # independent python re-implementation of the documented rules
    from osmcoastline_spark.functions.urls import TRACKING_PREFIXES

    u = url.split("#", 1)[0]
    base = u.split("?", 1)[0]
    qs = u.split("?", 1)[1] if "?" in u else ""
    if "://" in base:
        scheme = base.split("://", 1)[0].lower()
        rest = base.split("://", 1)[1]
        pre = scheme + "://"
    else:
        scheme, rest, pre = "", base, ""
    hostport_raw = rest.split("/", 1)[0]
    path = rest[len(hostport_raw):]
    hostport = hostport_raw.lower()
    if scheme == "http" and hostport.endswith(":80"):
        hostport = hostport[:-3]
    elif scheme == "https" and hostport.endswith(":443"):
        hostport = hostport[:-4]
    if path.endswith("/"):
        path = path[:-1]
    toks = [
        t for t in qs.split("&")
        if t and not any(t.startswith(p) for p in TRACKING_PREFIXES)
    ]
    q2 = "&".join(toks)
    canonical = pre + hostport + path + (("?" + q2) if q2 else "")
    host = hostport.split(":", 1)[0]
    if host.startswith("www."):
        host = host[4:]
    parts = host.split(".")
    domain = parts[-2] + "." + parts[-1] if len(parts) >= 2 else host
    return canonical, domain


def test_canonicalize_matches_python_mirror(spark):
    # adversarial generator: double '?', '#' inside fragments, bare
    # 'www.', ports on default/non-default schemes, empty hosts, and
    # random ascii soup — the Spark expressions must match an
    # independently written python mirror byte-for-byte (a 500-string
    # offline fuzz of the same shape ran 0 failures)
    import random

    rng = random.Random(11)
    schemes = ["http", "https", "HTTP", "HtTpS", "ftp", ""]
    hosts = ["WWW.Ex.COM", "a.b.c.co.uk", "single", "www.x", "X.io:8080",
             "h.com:80", "h.com:443", "", "www."]
    paths = ["", "/", "/A/b/", "/p", "//double//", "/x/"]
    queries = ["", "?", "?utm_source=1", "?a=1&utm_x=2&b=3", "?&&",
               "?ref=z&keep=1", "?a=1?b=2", "?utm_"]
    frags = ["", "#f", "#a#b", "#"]
    urls = []
    for i in range(90):
        s = rng.choice(schemes)
        u = ((s + "://") if s else "") + rng.choice(hosts) + \
            rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        urls.append((i, u))
    for i in range(90, 120):
        urls.append((i, "".join(rng.choice("abXZ:/?#&=.w")
                                for _ in range(rng.randrange(0, 25)))))
    df = spark.createDataFrame(urls, ["doc_id", "url"])
    got = {r.doc_id: (r.canonical_url, r.domain)
           for r in canonicalize_urls(df).collect()}
    for i, u in urls:
        assert got[i] == _mirror(u), (u, got[i], _mirror(u))
