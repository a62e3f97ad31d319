"""Document-cleaning operators for training-data pipelines.

The cleaning stages a large text-corpus pipeline runs before training,
re-expressed Spark-first with ANSI-SQL twins in
__spark_entry__.oracle_sql() so DuckDB verifies every value:

* line_dedup       — corpus-level exact line/paragraph deduplication,
                     keep-first (the CCNet paragraph-dedup stage: strip
                     boilerplate lines — nav bars, cookie banners,
                     license headers — that repeat across millions of
                     pages, keeping the globally first occurrence);
* c4_line_filters  — the C4 per-line heuristics (Raffel et al. 2020,
                     public): keep a line only if it ends in terminal
                     punctuation, has >= min_words words, and contains
                     no '{', no "lorem ipsum", no "javascript";
* pii_redact       — regex redaction of emails / IPv4s / phone numbers
                     with per-category match counts;
* chunk_documents  — fixed-size context-window chunks with overlap,
                     the sequence-prep stage before tokenization.

Scale shapes (the part that matters at 100 TB):

* line_dedup is inherently corpus-level, so it pays exactly three
  shuffles and nothing else: (1) the per-line first-occurrence
  aggregate — min over a packed (doc_id, pos) BIGINT with map-side
  partial HASH aggregation, so a boilerplate line occurring a billion
  times combines to one row per map task before the exchange (no
  hot-key blowup — this is why it is an agg+join, NOT a row_number
  window, which would move every instance of a hot line into one
  task); (2) the join of lines back to the survivors keyed by the
  line text (co-partitioned with (1)'s output; residual skew on the
  probe side is AQE skew-join territory); (3) the per-doc reassembly
  groupBy, which carries only integer positions — text is rebuilt
  narrowly from the original document row.
* c4_line_filters is per-document: ZERO shuffles, one narrow
  projection using array HOFs. Per the repgates A/B lesson
  (BENCH/KERNELS.md) HOF lambdas pay interpretation overhead, but the
  per-line work here (a regex + substring scans) is heavy enough to
  amortize it, and the alternative explode+reassemble shape pays a
  full shuffle of the corpus text for no semantic gain.
* pii_redact is pure Catalyst regexp_replace / regexp_extract_all —
  zero shuffles, whole-stage codegen.

Engine-parity notes: every regex used is in the common Java-regex /
RE2 subset (no lookaround, no backreferences, \\b and \\d mean the
same); redaction order (email, then IP, then phone) is fixed so both
engines see the same intermediate strings; counts are exact integers;
split separators are literal strings that are also regex-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import ws_tokens

# Shared regexes — the common Java/RE2 dialect subset (oracle twins use
# the identical strings; keep in sync with __spark_entry__).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,3}[- ]\d{3}[- ]\d{3,4}[- ]\d{3,4}"
TERMINAL_PUNCT_RE = r'[.!?"]$'

# line_dedup packs (doc_id, pos) into one BIGINT so the first-occurrence
# aggregate is a HashAggregate (min over a struct is not a mutable agg
# buffer type and forces a SortAggregate that sorts every line instance
# by line text — measured 1.4× slower at 2 cores, BENCH/run_linededup_ab.py).
# Lexicographic (doc_id, pos) order == packed order while pos <= 2^20 and
# 0 <= doc_id < 2^42; out-of-range rows raise loudly rather than corrupt.
_POS_BITS = 20
_MAX_POS = 1 << _POS_BITS
_MAX_DOC = 1 << (62 - _POS_BITS)


def line_dedup(
    docs: DataFrame,
    sep: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level exact line dedup, keep-first.

    A non-empty line instance survives iff its (doc_id, pos) equals the
    corpus-wide minimum for that exact line text — so the globally first
    occurrence (ordering by document id, then position within the
    document) is kept and every later repetition, including repetitions
    inside the same document, is dropped. Empty lines are structure, not
    content: they are always kept. Output per document:

      doc_id, text_dedup (surviving lines joined by `sep`, '' if none
      survive), n_lines (total lines incl. empties), n_kept (surviving
      lines incl. empties).

    `sep` must be a literal string that is also a regex-safe pattern
    (it is used as the split pattern and the join separator; '\\n' and
    ' ' both qualify). See the module docstring for the three-shuffle
    scale argument and why this is agg+join rather than a window.

    Formulation (3-way A/B, BENCH/run_linededup_ab.py, checksum-
    identical outputs): first-occurrence keys are the packed BIGINT
    (HashAggregate, not the struct-min SortAggregate — 1.4× at 2
    cores), and reassembly ships only (doc_id, pos) INTEGERS through
    the exchange, rebuilding text narrowly from the original document
    row (element_at over the re-split array). Line text therefore
    crosses the wire exactly once (the explode feeding the count agg
    and flag join) — at real paragraph sizes (100-1000 bytes/line) the
    reassembly exchange shrinks by that factor.
    """
    t = F.col(text_col)
    arr = F.split(t, sep, -1)
    lines = docs.select(
        id_col, F.posexplode(arr).alias("pos0", "line")
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "line")
    ok = (
        (F.col("pos") <= F.lit(_MAX_POS))
        & (F.col(id_col) < F.lit(_MAX_DOC))
        & (F.col(id_col) >= 0)
    )
    packed = F.when(
        # cast BEFORE the multiply: an IntegerType doc_id inside the
        # guarded range still overflows int32 under int*int arithmetic
        # (ANSI: ARITHMETIC_OVERFLOW; non-ANSI: wrapped key corrupts
        # keep-first order) — the guard only bounds the VALUE, the cast
        # bounds the arithmetic width
        ok, F.col(id_col).cast("long") * F.lit(_MAX_POS) + (F.col("pos") - 1)
    ).otherwise(
        F.raise_error(
            F.lit("line_dedup packed-key overflow: pos or doc_id out of range")
        ).cast("long")
    )
    keyed = lines.withColumn("pk", packed)
    firsts = (
        keyed.filter(F.length("line") > 0)
        .groupBy("line")
        .agg(F.min("pk").alias("fo"))
    )
    kept_pos = (
        keyed.join(firsts, "line", "left")
        .filter((F.length("line") == 0) | (F.col("pk") == F.col("fo")))
        .select(id_col, "pos")
    )
    kagg = kept_pos.groupBy(id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("keep_pos"),
        F.count("*").cast("long").alias("n_kept"),
    )
    return docs.join(kagg, id_col, "left").select(
        id_col,
        F.coalesce(
            F.array_join(
                F.transform(F.col("keep_pos"), lambda p: F.element_at(arr, p)),
                sep,
            ),
            F.lit(""),
        ).alias("text_dedup"),
        F.size(arr).cast("long").alias("n_lines"),
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
    )


def _c4_keep(line: Column, min_words: int) -> Column:
    words = ws_tokens(line)
    return (
        line.rlike(TERMINAL_PUNCT_RE)
        & (F.size(words) >= min_words)
        & ~line.contains("{")
        & ~F.lower(line).contains("lorem ipsum")
        & ~F.lower(line).contains("javascript")
    )


def c4_line_filters(
    docs: DataFrame,
    sep: str = "\n",
    min_words: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style per-line quality filters (keep a line iff it ends in
    terminal punctuation [.!?"], has >= min_words whitespace words, and
    contains no '{', no "lorem ipsum", no "javascript", the latter two
    case-insensitive). Output per document: doc_id, text_clean (kept
    lines joined by `sep`), n_lines, n_kept. Per-document and
    shuffle-free — one narrow projection over the line array.
    """
    t = F.col(text_col)
    lines = F.split(t, sep, -1)
    kept = F.filter(lines, lambda l: _c4_keep(l, min_words))
    return docs.select(
        id_col,
        F.array_join(kept, sep).alias("text_clean"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
    )


def pii_redact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails, IPv4 addresses and international phone numbers,
    in that fixed order, and count matches per category. Output:
    doc_id, text_redacted, n_emails, n_ips, n_phones, has_pii (0/1).
    Counts use regexp_extract_all (leftmost non-overlapping, identical
    semantics in Spark and DuckDB); replacement is global in both
    engines (DuckDB twin passes the 'g' flag). Pure Catalyst — zero
    shuffles, whole-stage codegen.
    """
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).cast("long")
    t1 = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(t1, F.lit(IPV4_RE), 0)).cast("long")
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    n_phones = F.size(F.regexp_extract_all(t2, F.lit(PHONE_RE), 0)).cast("long")
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    return docs.select(
        id_col,
        t3.alias("text_redacted"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
        ((n_emails + n_ips + n_phones) > 0).cast("int").alias("has_pii"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size training chunks with overlap —
    the context-window sequence-prep stage between cleaning and
    tokenization. Chunk i starts at token 1 + i*(chunk_tokens-overlap);
    a chunk after the first is emitted only if it contributes at least
    one NEW token (start + overlap <= doc_tokens), so the final chunk
    may be short but is never pure overlap, and a document shorter than
    chunk_tokens yields exactly one chunk. Documents with zero tokens
    yield no rows.

    Output: doc_id, chunk_id (1-based), chunk_text, n_tokens (tokens in
    this chunk), doc_tokens. Per-document and shuffle-free — one narrow
    projection (explode only amplifies by ~1/(chunk_tokens-overlap) of
    token count, and the chunk text is built map-side).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    t = F.col(text_col)
    toks = ws_tokens(t)
    n = F.size(toks)
    starts = F.when(n > 0, F.sequence(F.lit(1), n, F.lit(step))).otherwise(
        F.array().cast("array<int>")
    )
    starts = F.filter(starts, lambda s: (s == 1) | ((s + overlap) <= n))
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            (i + 1).cast("long").alias("chunk_id"),
            F.array_join(F.slice(toks, s, chunk_tokens), " ").alias("chunk_text"),
            F.least(F.lit(chunk_tokens), n - s + 1).cast("long").alias("n_tokens"),
        ),
    )
    return docs.select(
        id_col, n.cast("long").alias("doc_tokens"), F.explode(chunks).alias("c")
    ).select(
        id_col, "c.chunk_id", "c.chunk_text", "c.n_tokens", "doc_tokens"
    )


def curation_pipeline(
    docs: DataFrame,
    sep: str = "\n",
    min_words: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The composed cleaning+curation chain a corpus actually runs:
    C4 line filters → corpus keep-first line dedup → Gopher rule gates
    + repetition gates on the CLEANED text → one final keep flag.

    Each stage exists (and is independently oracled) on its own; this
    operator pins the composition — stage outputs feeding stage inputs,
    including the interactions that only appear when chained (a doc
    whose every line is C4-dropped or dedup-stolen reaches the gates as
    empty text and must fail r_len, not crash; a doc whose repetition
    row vanishes because the cleaned text has zero tokens must coalesce
    to pass_repetition=0).

    Output: doc_id, text_final, n_lines, n_kept (line-dedup stats over
    the C4-cleaned text), the four Gopher 0/1 rules + pass_all,
    pass_repetition (0 when the cleaned text has no tokens), keep =
    pass_all · pass_repetition · (n_kept > 0). Only integer flags and
    the final text — the float features stay in their per-stage
    operators where they are already value-hash verified.

    Scale shape: the composition adds NO shuffles beyond its stages —
    c4 is narrow, line_dedup pays its three exchanges, the gates are
    narrow/self-joined on doc_id, and Catalyst pipelines the narrow
    stages into the dedup explode map-side.
    """
    from .curate import gopher_rules, repetition_stats

    c4 = c4_line_filters(
        docs, sep=sep, min_words=min_words, text_col=text_col, id_col=id_col
    )
    ld = line_dedup(
        c4.select(F.col(id_col), F.col("text_clean").alias("text")),
        sep=sep,
        id_col=id_col,
    )
    cleaned = ld.select(
        F.col(id_col), F.col("text_dedup").alias("text"), "n_lines", "n_kept"
    )
    g = gopher_rules(cleaned, id_col=id_col).select(
        id_col, "r_len", "r_mwl", "r_stop", "r_lang", "pass_all"
    )
    r = repetition_stats(cleaned, id_col=id_col).select(id_col, "pass_repetition")
    out = cleaned.join(g, id_col).join(r, id_col, "left")
    passrep = F.coalesce(F.col("pass_repetition"), F.lit(0))
    keep = F.col("pass_all") * passrep * (F.col("n_kept") > 0).cast("int")
    return out.select(
        id_col,
        F.col("text").alias("text_final"),
        "n_lines",
        "n_kept",
        "r_len",
        "r_mwl",
        "r_stop",
        "r_lang",
        "pass_all",
        passrep.alias("pass_repetition"),
        keep.alias("keep"),
    )


def pack_sequences(
    chunks: DataFrame,
    seq_len: int = 512,
    buckets: int = 16,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Sequence packing — the pretraining step after chunking: concatenate
    chunks back-to-back in a deterministic order and slice the
    concatenation every `seq_len` tokens (GPT-style pack-and-slice; a
    chunk straddling a pack boundary is flagged `straddles` so the
    caller can split it across the two packs or drop the tail).

    A single global concatenation order would funnel the corpus through
    one sort — packing instead runs independently per
    ``pack_group = doc_id % buckets``: one packed stream per group, the
    window sort is per-group, and `buckets` is the parallelism knob (a
    100 TB run sets it to O(total_tokens / tokens_per_output_shard)).
    Exact integer arithmetic throughout ⇒ full SQL oracle.

    Output: pack_group, doc_id, chunk_id, n_tokens, pack_id (0-based
    within group), pack_offset (token offset inside the pack where this
    chunk starts), straddles.
    """
    from pyspark.sql.window import Window

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if buckets <= 0:
        # pmod(id, 0) is NULL, which would silently collapse every row
        # into one NULL pack_group — one global sort, the exact funnel
        # the bucketing exists to avoid
        raise ValueError("buckets must be positive")
    g = F.pmod(F.col(id_col), F.lit(buckets)).cast("int")
    base = chunks.select(
        g.alias("pack_group"),
        F.col(id_col),
        F.col(chunk_col),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy(id_col, chunk_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return (
        base.withColumn("_cum", cum)
        .select(
            "pack_group",
            id_col,
            chunk_col,
            "n_tokens",
            F.expr(f"_cum div {seq_len}").alias("pack_id"),
            F.pmod(F.col("_cum"), F.lit(seq_len)).cast("long").alias("pack_offset"),
            (
                F.pmod(F.col("_cum"), F.lit(seq_len)) + F.col("n_tokens")
                > F.lit(seq_len)
            ).alias("straddles"),
        )
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two corpus versions — the incremental-ingest
    work list (which docs must re-enter the pipeline after a crawl
    refresh): `added` (id only in new), `removed` (id only in old),
    `changed` (both present, content hash differs). Unchanged docs are
    EXCLUDED — at 100 TB the whole point is that the output is the
    (small) delta, not the corpus.

    Shape: both sides project to (id, md5) MAP-SIDE, so the full-outer
    equi-join shuffles 8-byte ids + 32-hex hashes, never document text —
    the text-shaped analog of segments_diff's J13 EXCEPT (reference
    osmcoastline_segments changes layer, src/osmcoastline_segments.cpp),
    generalized to keyed three-way status.

    Output: doc_id, status, old_hash, new_hash (NULL on the absent side).
    """
    # md5(NULL) is NULL, which would misread a present-but-NULL-text doc
    # as absent ('removed'/'added' flapping) — give NULL text a sentinel
    # hash distinct from every md5 hex digest
    h = lambda c: F.coalesce(F.md5(F.col(c)), F.lit("<null-text>"))  # noqa: E731
    o = old.select(F.col(id_col).alias("doc_id"), h(text_col).alias("old_hash"))
    n = new.select(F.col(id_col).alias("doc_id"), h(text_col).alias("new_hash"))
    j = o.join(n, "doc_id", "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select("doc_id", "status", "old_hash", "new_hash")
    )
