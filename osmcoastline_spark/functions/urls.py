"""URL-keyed curation operators for web-crawl training corpora.

The Common Crawl preprocessing stages every large text pipeline runs
before anything touches document text: canonicalize the URL, drop exact
URL duplicates keep-first, and cap the number of pages any one
registrable domain contributes (C4 / RefinedWeb "limit pages per
domain"). The reference engine has no web stage — this family is part
of the training-data extension surface, same as dedup.py.

Scale shapes:

* canonicalize_urls — PURE projection (string builtins only, zero
  shuffles, whole-stage codegen): at 100 TB the canonical key is minted
  map-side and every later stage shuffles the ~100-byte key, never the
  document.
* url_keep_first   — agg + co-partitioned join back (the line_dedup
  idiom, NOT a window: map-side partial agg absorbs a hot canonical URL
  — a billion-fold duplicate collapses per task before the exchange).
* domain_topn      — per-domain top-N without a per-domain global sort:
  phase 1 ranks within (domain, salt) buckets and keeps each bucket's
  top N (any row in the domain's true top N is in its bucket's top N —
  the rows ahead of it in the bucket are a subset of the rows ahead of
  it in the domain), phase 2 re-ranks the ≤ 64·N survivors per domain.
  A crawl's hottest domain (hundreds of millions of pages) never lands
  in one task; the result is bit-identical to the naive single window
  (pinned by test).

Canonicalization rules (engine-portable string builtins — each has an
exact DuckDB twin in the q_url_dedup oracle):
  1. strip the #fragment
  2. lowercase the scheme and host (never the path/query)
  3. drop the default port (:80 for http, :443 for https); keep others
  4. strip ONE trailing '/' from the path ('/a/' == '/a', '' == '/')
  5. drop tracking query params (utm_*, fbclid=, gclid=, ref=) and any
     empty tokens; surviving params keep their order (sorting params
     changes semantics for some sites — same policy as C4)
  6. registrable domain = host without port and leading 'www.', last
     two labels (documented approximation of the Public Suffix List —
     exact PSL handling needs the Mozilla table, out of scope)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=", "ref=")


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url",
    domain_col: str = "domain",
) -> DataFrame:
    """Append canonical-URL and registrable-domain columns (projection
    only — zero exchanges; malformed URLs without '://' canonicalize to
    scheme '' + the raw string as host+path, never an error)."""
    big = F.lit(2147483647)  # "to end of string" length for substring
    u = F.substring_index(F.col(url_col), "#", 1)          # 1. fragment
    base = F.substring_index(u, "?", 1)
    qs = F.when(F.locate("?", u) > 0, F.substring(u, F.locate("?", u) + 1, big)).otherwise(F.lit(""))
    has_scheme = F.locate("://", base) > 0
    scheme = F.when(has_scheme, F.lower(F.substring_index(base, "://", 1))).otherwise(F.lit(""))
    rest = F.when(has_scheme, F.substring(base, F.locate("://", base) + 3, big)).otherwise(base)
    # path offset must come from the RAW host prefix: lower() can change
    # string length for some Unicode hosts (e.g. 'İ' lowercases to 2 cps)
    raw_hp = F.substring_index(rest, "/", 1)
    path = F.substring(rest, F.length(raw_hp) + 1, big)
    hostport = F.lower(raw_hp)
    # 3. default ports
    hostport = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, 1, F.length(hostport) - 3),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, 1, F.length(hostport) - 4),
    ).otherwise(hostport)
    # 4. one trailing slash
    path = F.when(path.endswith("/"), F.substring(path, 1, F.length(path) - 1)).otherwise(path)
    # 5. tracking params, preserving order of survivors
    def keep_tok(t):
        bad = t == ""
        for p in TRACKING_PREFIXES:
            bad = bad | t.startswith(p)
        return ~bad
    q2 = F.array_join(F.filter(F.split(qs, "&"), keep_tok), "&")
    canonical = F.concat(
        F.when(has_scheme, F.concat(scheme, F.lit("://"))).otherwise(F.lit("")),
        hostport,
        path,
        F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit("")),
    )
    # 6. registrable domain
    host = F.substring_index(hostport, ":", 1)
    host = F.when(host.startswith("www."), F.substring(host, 5, big)).otherwise(host)
    parts = F.split(host, "[.]")
    domain = F.when(
        F.size(parts) >= 2,
        F.concat(F.element_at(parts, -2), F.lit("."), F.element_at(parts, -1)),
    ).otherwise(host)
    return df.withColumn(out_col, canonical).withColumn(domain_col, domain)


def url_keep_first(
    df: DataFrame, id_col: str = "doc_id", url_col: str = "canonical_url"
) -> DataFrame:
    """Keep the min-id row per canonical URL; append dup_count (total
    rows that shared the URL). Agg + join back on (url, id) — the hot-
    URL-safe shape (map-side partial agg), never a window."""
    winners = df.groupBy(url_col).agg(
        F.min(id_col).alias(id_col),
        F.count("*").cast("long").alias("dup_count"),
    )
    # join on BOTH (url, id): with the id in the equi-key, a billion-fold
    # hot URL spreads across reducers instead of landing in one task.
    # dropDuplicates guards the keep-ONE contract when the input itself
    # carries duplicate (id, url) rows (e.g. a crawl log ingested twice);
    # dup_count still counts every input row
    return df.join(winners, on=[url_col, id_col]).dropDuplicates(
        [url_col, id_col]
    )


def domain_topn(
    df: DataFrame,
    n: int,
    domain_col: str = "domain",
    order_cols=None,
    rank_col: str = "domain_rank",
    salt_buckets: int = 64,
) -> DataFrame:
    """Per-domain top-N cap, skew-safe and bit-identical to the naive
    single window. order_cols defaults to the frame's columns minus the
    domain — pass an explicit deterministic total order in production
    (e.g. quality desc, id asc).

    Phase 1 ranks inside (domain, salt) and keeps each bucket's top N:
    for any row in the domain's true top N, the bucket rows ordered
    ahead of it are a subset of the domain rows ordered ahead of it
    (< N), so it survives — losslessness is a two-line pigeonhole.
    Phase 2 ranks the ≤ salt_buckets·N survivors per domain; ranks of
    true top-N rows are unchanged because every row ordered ahead of
    them also survived phase 1.
    """
    if n < 1:
        raise ValueError("domain_topn: n must be >= 1")
    if order_cols is None:
        order_cols = [c for c in df.columns if c != domain_col]
    if not order_cols:
        raise ValueError(
            "domain_topn: no deterministic order — the frame has no "
            "non-domain column; pass order_cols explicitly"
        )
    order_exprs = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    salt_cols = [F.col(c) for c in df.columns if c != domain_col] or [F.col(domain_col)]
    salt = F.pmod(F.xxhash64(*salt_cols), F.lit(salt_buckets))
    w1 = Window.partitionBy(domain_col, "__salt").orderBy(*order_exprs)
    w2 = Window.partitionBy(domain_col).orderBy(*order_exprs)
    return (
        df.withColumn("__salt", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= n)
        .withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= n)
        .drop("__salt", "__r1")
    )
