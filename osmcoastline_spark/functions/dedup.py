"""Deduplication operators for training-data pipelines.

Every variant is designed around one constraint: the pairwise work must be
bounded by bucketing BEFORE any quadratic step — the same cell-binning
discipline as the spatial joins.

* exact           — hash groupBy, keep min doc_id (one shuffle)
* minhash + LSH   — per-row (ZERO-shuffle) per-band min(md5(shingle||salt))
                    signature via one F.aggregate pass over the shingle
                    array → band-bucket equi-join → candidate pairs
                    (optionally Jaccard-verified); the equi-join is the only
                    exchange in the operator. Hashes are md5 hex strings:
                    portable to DuckDB for the oracle (min() over strings).
* simhash         — 64-bit sign-sum sketch over token md5 bits; near-dup =
                    equal band keys (hamming-adjacent pairs surface via
                    4×16-bit band equality)
* n-gram Jaccard  — exact shingle-set Jaccard via explode + groupBy
* embedding       — cosine near-dup via LSH sign-buckets (see similarity.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import ws_tokens

# ------------------------------------------------------------------ exact


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per exact text hash."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


# --------------------------------------------------------------- shingles


def _shingle_array(text_col: str, k: int):
    """Distinct character k-shingles of one document as an array column
    (JVM-side sequence+transform; at least one element even for short/empty
    text, mirroring the reference-oracle `greatest(length-k+1, 1)`)."""
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)), "
        f"i -> substring({text_col}, i, {k})))"
    )


def shingles(docs: DataFrame, k: int = 5, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Character k-shingles via sequence+transform (JVM-side) + explode."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_shingle_array(text_col, k)).alias("shingle"),
    )


# ------------------------------------------------------------ minhash LSH


def _minhash_sig_struct(
    docs: DataFrame, n_hashes: int, k: int, text_col: str, id_col: str,
) -> DataFrame:
    """(doc_id, _m:struct<c0..c{n-1}>) — the per-band minhash minima,
    computed NARROWLY: a document's shingles all live in its own input row,
    so the signature needs no explode, no groupBy, no exchange.  One
    F.aggregate pass over the shingle array carries a struct of n_hashes
    running minima (md5 per band inside the lambda).

    'g' sorts after every lowercase-hex md5 digest, so it is the identity
    element for string-min; the shingle array is never empty (sequence
    floor 1), so 'g' can never survive into a signature.

    Measured vs the round-1..5 explode+groupBy formulation
    (BENCH/run_minhash_ab.py, 80k docs, interleaved best-of-3): 1.7x faster
    at both local[8] and local[32], identical value-hash — and the shuffle
    count drops to ZERO, the shape that matters at 100 TB (signatures
    become embarrassingly parallel; only LSH's candidate join shuffles).
    An under-parallel input (single unsplittable file) is repartitioned
    first so the md5-heavy signature pass uses every core (round 6,
    util.ensure_min_parallelism; no-op on healthy multi-split inputs).
    """
    from osmcoastline_spark.util import ensure_min_parallelism

    docs = ensure_min_parallelism(docs)
    sh = docs.select(F.col(id_col).alias("doc_id"), _shingle_array(text_col, k).alias("_sh"))
    init = F.struct(*[F.lit("g").alias(f"c{b}") for b in range(n_hashes)])

    def merge(acc, s):
        return F.struct(*[
            F.least(acc[f"c{b}"], F.md5(F.concat(s, F.lit(f"#{b}")))).alias(f"c{b}")
            for b in range(n_hashes)
        ])

    return sh.select("doc_id", F.aggregate("_sh", init, merge).alias("_m"))


def minhash_signatures(
    docs: DataFrame, n_hashes: int = 8, k: int = 5,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, band, sig): per band, min over md5(shingle || band-salt).

    Zero-shuffle narrow plan (see _minhash_sig_struct); the posexplode of
    the n_hashes-element signature array is a narrow 8x fan-out of tiny
    rows, not an aggregation.  Signature strings are portable across
    engines (md5 hex compares lexicographically everywhere).
    """
    m = _minhash_sig_struct(docs, n_hashes, k, text_col, id_col)
    out = m.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"_m.c{b}") for b in range(n_hashes)])),
    )
    return out.withColumnRenamed("pos", "band").withColumnRenamed("col", "sig")


def minhash_lsh_pairs(
    docs: DataFrame, n_hashes: int = 8, bands: int = 4, k: int = 5,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-duplicate pairs: equal concatenated-signature in ANY
    LSH band (rows_per_band = n_hashes // bands).

    The band keys are built narrowly from the per-row signature struct —
    string-sorted "band:sig" terms, exactly the old collect_list+sort_array
    key — so the ONLY shuffle in the whole operator is the irreducible
    candidate equi-join on (lsh_band, key).  The previous formulation paid
    two extra exchanges (signature groupBy + key groupBy) for the same
    output."""
    rows_per_band = max(n_hashes // bands, 1)
    m = _minhash_sig_struct(docs, n_hashes, k, text_col, id_col)
    groups: dict[int, list[int]] = {}
    for bb in range(n_hashes):
        groups.setdefault(bb // rows_per_band, []).append(bb)
    key_cols = [
        F.concat_ws("|", F.sort_array(F.array(*[
            F.concat_ws(":", F.lit(str(bb)), F.col(f"_m.c{bb}")) for bb in groups[g]
        ])))
        for g in sorted(groups)  # consecutive 0..n_groups-1: posexplode pos == lsh_band
    ]
    keys = (
        m.select("doc_id", F.posexplode(F.array(*key_cols)))
        .withColumnRenamed("pos", "lsh_band")
        .withColumnRenamed("col", "key")
    )
    # materialize the band keys ONCE: both sides of the self-join below
    # otherwise recompute the full signature aggregate (every md5) in
    # their own map stages — the checkpoint holds bands×docs tiny rows
    # (doc_id + one concat key), far smaller than the join shuffle itself,
    # and halves the dominant signature cost (round 6: 1.12 s -> 0.49 s
    # at sf0.1 together with the input repartition)
    keys = keys.localCheckpoint(eager=True)
    a = keys.select(F.col("doc_id").alias("a"), "lsh_band", "key")
    b = keys.select(F.col("doc_id").alias("b"), "lsh_band", "key")
    return (
        a.join(b, ["lsh_band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, k: int = 5, threshold: float = 0.8,
    text_col: str = "text", id_col: str = "doc_id",
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """Exact Jaccard over distinct k-shingle sets, restricted to pairs that
    share at least one shingle (the equi-join bounds the candidates).

    `max_doc_freq` drops shingles appearing in more than that many docs
    BEFORE the self-join — a boilerplate 8-gram shared by k docs otherwise
    contributes k² join rows (the 100 TB hot-key risk). The cap is ON by
    default (1000): at web scale the hot-shingle blow-up is the expected
    failure mode, so uncapped is the opt-in (`max_doc_freq=None`). The
    Jaccard is then computed consistently over the capped shingle sets
    (both intersection and sizes), so the metric stays well-defined;
    mirror the cap in any SQL oracle.

    The jaccard column is the raw IEEE division inter/(na+nb-inter) of
    exact integers — bit-identical on any engine, no rounding step."""
    sh = shingles(docs, k, text_col, id_col)
    if max_doc_freq is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("nsh"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("nsh").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("nsh").alias("nb")), "b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------- simhash


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens.

    Bit b of the sketch = sign of Σ_tokens (±1 depending on bit b of
    md5(token)). Bits come from the first 16 hex chars; each hex char
    contributes 4 bits via its value — portable arithmetic (strpos over
    '0123456789abcdef').

    Construction is SQL-string based (selectExpr / F.expr), not Column-
    object based: the 64-aggregate plan built through per-Column py4j
    calls costs ~1.2 s of driver time PER BUILD (measured round 6, ~700
    py4j round-trips), while the identical plan parsed from expression
    strings builds in ~0.25 s. Same analyzed plan, same results. An
    under-parallel input is repartitioned so the md5/token pass uses
    every core (util.ensure_min_parallelism; no-op on multi-split input).
    """
    from osmcoastline_spark.util import ensure_min_parallelism

    docs = ensure_min_parallelism(docs)
    toks = docs.selectExpr(
        f"{id_col} AS doc_id",
        f"explode(split(lower(trim({text_col})), '\\\\s+')) AS tok",
    ).filter("length(tok) > 0")
    hexes = toks.selectExpr("doc_id", "substring(md5(tok), 1, 16) AS h")
    # ONE shuffle, 64 partial-aggregating sum columns per doc — no row
    # amplification (the round-1 plan exploded 64 rows per token, a 64×
    # shuffle blow-up). The 16 nibble values are projected ONCE per row so
    # each aggregate is a trivial shift/mask — inlining the string ops into
    # all 64 aggregates blows the codegen method size and falls back to
    # interpreted evaluation (measured 4× slower).
    nibs = hexes.selectExpr(
        "doc_id",
        *[
            f"(instr('0123456789abcdef', substring(h, {k + 1}, 1)) - 1) AS n{k}"
            for k in range(16)
        ],
    )
    sums = nibs.groupBy("doc_id").agg(
        *[
            F.expr(f"sum((shiftright(n{b // 4}, {3 - b % 4}) & 1) * 2 - 1) AS s{b}")
            for b in range(64)
        ]
    )
    terms = " + ".join(
        (
            "(CASE WHEN s63 > 0 THEN CAST(-9223372036854775808 AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END)"
            if b == 63
            else f"(CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END)"
        )
        for b in range(64)
    )
    return sums.selectExpr("doc_id", f"CAST(0 AS BIGINT) + {terms} AS simhash")


# ------------------------------------------------- connected components


def dedup_clusters(
    edges: DataFrame, nodes: DataFrame, max_rounds: int = 32
) -> DataFrame:
    """Connected components over near-duplicate candidate edges via
    alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14).

    This is the canonical web-scale fuzzy-dedup step: LSH emits candidate
    PAIRS, but keeping one representative per near-dup GROUP needs the
    transitive closure (a~b, b~c => one cluster {a,b,c}).  Naive label
    propagation needs O(diameter) joins; large-star/small-star converges
    in O(log^2 n) rounds regardless of diameter, each round a groupBy +
    a projection — no all-pairs step anywhere, so the shape survives
    100 TB (per-round cost is O(|E|), and |E| only shrinks).

    * large-star: every node u connects each STRICTLY LARGER neighbour to
      m(u) = min(neighbours(u) + {u}).
    * small-star: orient edges (hi, lo); every hi connects its smaller
      neighbours and itself to the overall minimum.

    Fixpoint = the edge set is a star forest (both steps are identity);
    detected by an order-independent count+xxhash64 checksum aggregate —
    one tiny job per round, no extra shuffle.  Every round
    localCheckpoints to truncate lineage (same discipline as ring
    assembly, rings.py:193).

    `edges`: columns (a, b), undirected candidate pairs, any orientation.
    `nodes`: one column `doc_id` — the full id universe, so isolated docs
    come out as singleton clusters.
    Returns (doc_id, cluster_id) with cluster_id = min doc_id of the
    component — deterministic, engine-independent.
    """
    e = (
        edges.select(F.col("a").cast("long").alias("a"), F.col("b").cast("long").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _checksum(df: DataFrame) -> tuple[int, int]:
        # bit_xor, not sum: summing 64-bit hashes overflows under ANSI mode
        row = df.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(a, b))"), F.lit(0)).alias("h"),
        ).first()
        return int(row["n"]), int(row["h"])

    prev = _checksum(e)
    for _ in range(max_rounds):
        # Both stars are written as agg-then-self-join on the grouping key
        # rather than collect_set: a hub node (one giant LSH bucket clique)
        # would materialize its whole neighbourhood in one executor's
        # memory under collect_set, while the join form streams it and AQE
        # skew-split can break the hot key.  The join is co-partitioned
        # with the groupBy that feeds it (same key), so it costs no extra
        # exchange of the big side.
        #
        # large-star: each u connects every neighbour w > u to
        # m(u) = min(neighbours + {u}).
        sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("m").alias("a"), F.col("v").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star over edges oriented (lo=a, hi=b): hi links itself and
        # every smaller neighbour to the overall minimum.
        mins2 = ls.groupBy("b").agg(F.min("a").alias("m"))
        ss = (
            ls.join(mins2, "b")
            .filter(F.col("a") != F.col("m"))
            .select(F.col("m").alias("a"), F.col("a").alias("b"))
            .unionByName(mins2.select(F.col("m").alias("a"), F.col("b").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur = _checksum(ss)
        e = ss
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"dedup_clusters: no fixpoint after {max_rounds} large/small-star rounds"
        )
    # star forest: edge (root, w).  Singletons map to themselves.
    roots = e.select(F.col("b").alias("doc_id"), F.col("a").alias("root"))
    return nodes.select(F.col("doc_id").cast("long").alias("doc_id")).join(
        roots, "doc_id", "left"
    ).select(
        "doc_id", F.coalesce("root", "doc_id").alias("cluster_id")
    )


def hash_band_structs(hash_col: str, band_bits: int):
    """The shared 64-bit-fingerprint band index: an array of (band, key)
    structs where key = band_bits-wide slice `band` of the hash, extracted
    with an UNSIGNED shift (bit 63 must not sign-extend into high bands).
    One definition serves simhash, batch phash and streaming phash — the
    three band joins must agree or a streaming emit and its batch oracle
    silently diverge."""
    return F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned(F.col(hash_col), i * band_bits)
            .bitwiseAND(F.lit((1 << band_bits) - 1))
            .alias("key"),
        )
        for i in range(64 // band_bits)
    ])


def simhash_band_pairs(sims: DataFrame, band_bits: int = 16) -> DataFrame:
    """Hamming-near candidates: docs sharing any 16-bit band of the sketch."""
    bands = sims.select(
        "doc_id", F.explode(hash_band_structs("simhash", band_bits)).alias("bk")
    ).select("doc_id", "bk.band", "bk.key")
    a = bands.select(F.col("doc_id").alias("a"), "band", "key")
    b = bands.select(F.col("doc_id").alias("b"), "band", "key")
    return a.join(b, ["band", "key"]).filter(F.col("a") < F.col("b")).select("a", "b").distinct()


def duplicated_spans(
    docs: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicated-substring detection: maximal token spans covered
    by at least one word k-gram that occurs more than once in the corpus
    (counting all occurrences, including within the same document).

    This is the Spark-native equivalent of the suffix-array
    substring-dedup stage (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better" — public): a suffix array finds
    arbitrary-length repeated substrings but does not distribute; fixed-k
    window hashing finds every repeated run of length >= k EXACTLY (a
    duplicated run of L >= k tokens flags all its L-k+1 windows, whose
    union reconstructs the maximal span; runs shorter than k are below
    the detection threshold by design, matching the paper's min-length).

    Output: one row per maximal span — doc_id, span_start, span_end
    (1-based token indices, inclusive), span_tokens, n_dup_windows.
    Overlapping or adjacent flagged windows (gap <= k between starts)
    merge, so spans are the union of duplicated regions.

    Shape at 100 TB: one row per token position leaves each map task as
    a (doc_id, pos, h1, h2) quad — the k-token window string is
    materialized transiently and hashed to a 128-bit pair (two
    independent xxhash64 inputs) BEFORE any exchange, so the shuffles
    move 8-byte hashes, never window text. The occurrence count is a
    map-side-combined partial agg (a billion-fold hot window collapses
    per task); the flag join is co-partitioned on the hash pair with a
    count side of one row per distinct window. The island/merge step
    windows over (doc_id, pos) — but only over FLAGGED rows, a small
    fraction of the corpus. 128-bit keys make hash-collision spans
    vanishingly unlikely (~2^-128 per pair); the oracle twin groups by
    the window string itself, so a collision would surface as a
    correctness diff.
    """
    t = F.col(text_col)
    toks = ws_tokens(t)
    n = F.size(toks)
    # sequence(1, 0) would generate a DESCENDING range — guard short docs
    starts = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)).otherwise(
        F.array().cast("array<int>")
    )
    # build the k-token window string ONCE per position: HOF lambda
    # bodies get no common-subexpression elimination, so hashing win(i)
    # twice inside the transform would materialize the string twice —
    # doubling the dominant string-build cost of the corpus-wide scan.
    # Emit (pos, w) structs, then hash the already-built string twice in
    # the outer projection (plain column refs into the exploded struct).
    win = lambda i: F.array_join(F.slice(toks, i, k), " ")  # noqa: E731
    wh = (
        docs.select(
            id_col,
            F.explode(
                F.transform(
                    starts,
                    lambda i: F.struct(
                        i.cast("long").alias("pos"), win(i).alias("w")
                    ),
                )
            ).alias("w"),
        )
        .select(
            id_col,
            F.col("w.pos").alias("pos"),
            F.xxhash64(F.col("w.w")).alias("h1"),
            F.xxhash64(F.col("w.w"), F.lit("dup2")).alias("h2"),
        )
    )
    dup_keys = (
        wh.groupBy("h1", "h2").agg(F.count("*").alias("cnt")).filter(F.col("cnt") > 1)
    )
    flagged = wh.join(dup_keys.select("h1", "h2"), ["h1", "h2"]).select(id_col, "pos")

    from pyspark.sql.window import Window

    ww = Window.partitionBy(id_col).orderBy("pos")
    isl = flagged.withColumn(
        "brk",
        F.when((F.col("pos") - F.lag("pos").over(ww)) > k, F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn(
        "island",
        F.sum("brk").over(ww.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        isl.groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
            F.count("*").cast("long").alias("n_dup_windows"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).cast("long").alias(
                "span_tokens"
            ),
            "n_dup_windows",
        )
    )


# --------------------------------------------------- fuzzy (edit-distance)


def fuzzy_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    d: int = 2,
    q: int = 3,
    max_band_rows: int = 20000,
    checkpoint: bool = True,
) -> DataFrame:
    """ALL unordered pairs within Levenshtein distance ``d`` — exactly,
    never approximately — via q-gram set-prefix filtering (the Ed-Join
    design, Xiao/Wang/Lin VLDB'08, adapted to distinct-gram SETS so the
    prefix bound survives repetitive strings).

    Output: one row per pair (id_a < id_b): id_a, id_b, dist (int,
    the exact edit distance, <= d).

    Losslessness argument (distinct-gram sets, not positional multisets):
    one edit touches at most q positional q-grams, hence removes at most
    q values from the distinct-gram set, so
        |set(a) ∩ set(b)| >= max(|set(a)|, |set(b)|) - d*q   (*)
    for any pair with ed <= d. With every string's distinct grams sorted
    by ONE global order (ascending document frequency, gram value as the
    tiebreak — rarest first, which simultaneously kills hot-gram join
    skew), the classic prefix-filter pigeonhole says two sets with
    overlap >= t intersect within their (|set| - t + 1)-prefixes; with
    t = max(|set(a)|,|set(b)|) - d*q from (*), both prefixes are at most
    d*q + 1 long. So indexing ONLY the d*q+1 rarest grams per string is
    lossless whenever (*) gives t >= 1, i.e. whenever at least one side
    has more than d*q distinct grams. Strings with |set| <= d*q (short
    strings, len < q included, and degenerate repetitive ones like
    'aaaa…') can only pair with strings whose set is within d*q of
    theirs — handled exhaustively by a separate small tier.

    Plan shape at 100 TB:
      * gram df agg + df join + per-id prefix window: exchanges over the
        (id, gram) frame — strings do NOT ride these shuffles (8-byte ids
        + q-byte grams only).
      * prefix self-join on gram: fan-in per gram is bounded by the
        rarest-first prefix selection; candidates dedup to (id_a, id_b)
        ints BEFORE the strings are fetched.
      * two id-equi-joins fetch the strings for the final exact
        levenshtein verify — the only step that moves text, and it moves
        each candidate's text once.
      * small tier: length-band equi-join (each pair produced exactly
        once: the left side emits bands len±d, the right its own length)
        with an in-plan per-band loud cap (`raise_error`, same idiom as
        temporal.range_join) so a degenerate corpus fails loudly instead
        of planning a quadratic band.
      * the prefix frame is localCheckpointed before its self-join
        (checkpoint=False to opt out): a self-join of a lazy frame plans
        the gram-explode → df-join → rarest-window chain TWICE (two
        subtree copies — verified via the plan audit: 24 exchanges
        uncheckpointed); the checkpoint halves the dominant gram-side
        work at the price of materializing (id, nset, gram) rows.

    Reference analog: the reference dedups segments by exact equality
    (src/coastline_polygons.cpp duplicate-segment detect); fuzzy text
    identity is the training-data generalization.
    """
    if d < 1:
        raise ValueError("fuzzy_pairs: d must be >= 1 (use dedup_exact for d=0)")
    if q < 2:
        raise ValueError("fuzzy_pairs: q must be >= 2")
    from pyspark.sql.window import Window

    prefix_len = d * q + 1
    sid, s = F.col(id_col), F.col(text_col)
    # sequence(1, len-q+1) would run DESCENDING for len < q — guard, like
    # duplicated_spans; expr form because the lambda start index feeds
    # substring's pos argument
    gram_set = F.when(
        F.length(s) >= q,
        F.expr(
            f"array_distinct(transform(sequence(1, length({text_col}) - {q - 1}), "
            f"i -> substring({text_col}, i, {q})))"
        ),
    ).otherwise(F.array().cast("array<string>"))

    base = docs.select(
        sid.alias("fid"),
        s.alias("fs"),
        F.length(s).alias("flen"),
        gram_set.alias("fgrams"),
    ).withColumn("nset", F.size("fgrams"))

    # ---- small tier: |set| <= d*q — exhaustive within the tier --------
    small = base.filter(F.col("nset") <= d * q).select("fid", "fs", "flen")
    band_w = Window.partitionBy("flen")
    small_cap = small.withColumn("band_n", F.count("*").over(band_w)).withColumn(
        "fs",
        F.when(
            F.col("band_n") > max_band_rows,
            F.raise_error(
                F.concat(
                    F.lit(
                        "fuzzy_pairs: small-tier length band exceeds "
                        f"{max_band_rows} rows (len="
                    ),
                    F.col("flen").cast("string"),
                    F.lit("); corpus is degenerate for q-gram filtering"),
                )
            ),
        ).otherwise(F.col("fs")),
    )
    left = small_cap.select(
        "fid",
        "fs",
        F.explode(
            F.sequence(F.col("flen") - d, F.col("flen") + d)
        ).alias("band"),
    )
    small_pairs = (
        left.alias("a")
        .join(
            small_cap.alias("b"),
            (F.col("a.band") == F.col("b.flen")) & (F.col("a.fid") < F.col("b.fid")),
        )
        .select(
            F.col("a.fid").alias("id_a"),
            F.col("b.fid").alias("id_b"),
            F.levenshtein(F.col("a.fs"), F.col("b.fs")).alias("dist"),
        )
        .filter(F.col("dist") <= d)
    )

    # ---- prefix tier ---------------------------------------------------
    grams = base.select("fid", "nset", F.explode("fgrams").alias("gram"))
    gram_df = grams.groupBy("gram").agg(F.count("*").alias("gdf"))
    pw = Window.partitionBy("fid").orderBy("gdf", "gram")
    prefix = (
        grams.join(gram_df, "gram")
        .withColumn("rn", F.row_number().over(pw))
        .filter(F.col("rn") <= prefix_len)
        .select("fid", "nset", "gram")
    )
    if checkpoint:
        # EAGER by necessity: under AQE even localCheckpoint(eager=False)
        # materializes the shuffle stages at call time (measured — 4 jobs
        # either way), so there is no lazy variant to offer. The
        # construction-time job is the documented price of computing the
        # gram->df->window chain ONCE instead of once per self-join branch
        # (the dedup_clusters / ivfpq checkpoint posture); callers
        # composing plans lazily pass checkpoint=False and pay the double
        # plan instead.
        prefix = prefix.localCheckpoint()
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.gram") == F.col("b.gram")) & (F.col("a.fid") < F.col("b.fid")),
        )
        # pairs where BOTH sets are small belong to (and are complete in)
        # the small tier; keeping them here would double-count
        .filter(F.greatest(F.col("a.nset"), F.col("b.nset")) > d * q)
        .select(F.col("a.fid").alias("id_a"), F.col("b.fid").alias("id_b"))
        .distinct()
    )
    strings = base.select("fid", "fs")
    big_pairs = (
        cand.join(strings.withColumnRenamed("fid", "id_a").withColumnRenamed("fs", "s_a"), "id_a")
        .join(strings.withColumnRenamed("fid", "id_b").withColumnRenamed("fs", "s_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein(F.col("s_a"), F.col("s_b")).alias("dist"),
        )
        .filter(F.col("dist") <= d)
    )
    return small_pairs.unionByName(big_pairs).select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("dist").cast("int"),
    )
