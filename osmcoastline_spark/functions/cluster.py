"""Distributed k-means + SemDeDup-style semantic deduplication.

The 100-TB shapes:

* ``kmeans_quantized`` — Lloyd's algorithm with the classic broadcast-model
  structure (MLlib's k-means does the same): the model (k × dim centroids)
  lives on the driver and ships to executors inside a pandas_udf closure;
  the DATA never leaves the cluster.  Per iteration the plan is

    - assignment: one narrow Arrow-batched projection (a single numpy
      ``(batch × k × dim)`` distance computation per batch) — ZERO shuffle;
    - re-centering: posexplode to (cluster, dim, q) and a groupBy sum —
      partial aggregation combines each map task down to k·dim rows, so the
      shuffle moves O(k·dim·tasks) bytes regardless of data size.

  The only ``collect()`` is the k × dim integer centroid table — model
  size, not data size (the same bounded-collect rule as rings.py's
  driver-finish).

* every arithmetic step is EXACT so the whole iterative algorithm is
  value-hash oracle-able (the DuckDB oracle unrolls the iterations):
  embeddings are quantized to int64 (floor(x·scale + 0.5) — one
  correctly-rounded multiply + floor, identical on Spark / DuckDB /
  driver python), distances are pure int64 sums of squares, and the
  re-centered mean is re-quantized onto the SAME integer grid via
  floor(S/n + 0.5) computed in doubles (S ≤ ~1e6 is exactly
  representable, the division is one correctly-rounded IEEE op, so all
  three engines agree bit-for-bit).  DuckDB's ``//`` truncates toward
  zero on negatives (Python floors) — that is why the double-floor form
  is used instead of integer division.

* ``semantic_dedup`` — SemDeDup (Abbas et al. 2023): cluster the
  embedding space, then search for near-duplicates ONLY within a cluster
  (the cluster id plays the role the LSH band key plays in minhash — a
  bucketed equi-join, never all-pairs).  Pairs with cosine ≥ threshold
  drop the higher id; cosine uses the exact integer dot/norms with the
  single fixed double expression shape dot/(sqrt(na)·sqrt(nb)), the same
  cross-engine-exact idiom as similarity.lsh_topk_exact.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "kmeans_train",
    "kmeans_quantized",
    "semantic_dedup",
    "ivf_topk_trained",
    "pq_train",
    "ivfpq_topk",
]


def quantize_expr(vec_col: str, scale: float) -> Column:
    """int64 grid quantization; float32 → double is exact, then one
    correctly-rounded multiply and a floor — bit-identical across engines.

    Overflow bound the code can't show: downstream squared-distance sums
    need dim·(2·scale·max|x|)² < 2⁶³, i.e. scale ≤ ~1e7 for unit-range
    64-dim embeddings — numpy int64 WRAPS silently past that while the
    DuckDB oracle errors, so an over-scaled run diverges from its own
    oracle rather than crashing. The defaults (scale=1e3) sit 8 orders
    inside the bound."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(scale) + F.lit(0.5)).cast("long"),
    )


def _assign_udf(centroids: np.ndarray):
    """Narrow per-batch assignment against the broadcast centroid model.

    Exact int64 distances; np.argmin returns the FIRST minimum, i.e. ties
    break to the lowest cluster id — the same order the oracle's
    min(struct(d2, j)) produces."""
    from pyspark.sql.functions import pandas_udf

    cents = centroids.astype(np.int64)  # (k, dim)

    @pandas_udf("struct<cluster: int, d2: long>")
    def assign(qs):  # type: ignore[no-untyped-def]
        import pandas as pd

        if not len(qs):
            return pd.DataFrame({"cluster": [], "d2": []})
        v = np.stack([np.asarray(x, dtype=np.int64) for x in qs])  # (n, dim)
        # (n, k) exact integer squared distances; |q| ≤ ~600 ⇒ far from overflow
        d2 = ((v[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        idx = d2.argmin(axis=1)
        return pd.DataFrame(
            {"cluster": idx.astype(np.int32), "d2": d2[np.arange(len(v)), idx]}
        )

    return assign


def kmeans_train(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    scale: float = 1000.0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, np.ndarray]:
    """Run the Lloyd iterations; return (quantized base DF, centroids).

    Init: centroids = quantized vectors of the k lowest ids (deterministic,
    data-derived — no RNG).  Empty clusters keep their previous centroid
    (the oracle's COALESCE does the same)."""
    base = vectors.select(
        F.col(id_col).alias("vid"), quantize_expr(vec_col, scale).alias("q")
    )
    # model init: the k lowest-id vectors. Bounded collect — k × dim ints.
    init = base.filter(F.col("vid") < k).orderBy("vid").collect()
    if [r["vid"] for r in init] != list(range(k)):
        # a bare len() check would let a duplicated id below k pass (and
        # produce >k centroid rows) or a missing id shift every later row
        raise ValueError(f"need ids 0..{k - 1} present exactly once for init")
    cents = np.array([r["q"] for r in init], dtype=np.int64)  # (k, dim)

    for _ in range(iters):
        assigned = base.withColumn("a", _assign_udf(cents)(F.col("q")))
        # re-center: explode dims; partial agg collapses each map task to
        # ≤ k·dim rows before the shuffle, so shuffle bytes are O(k·dim·tasks).
        # A fused mapInPandas rewrite (assignment + np.add.at partial sums in
        # one Arrow pass, ≤ k·dim rows per batch) was A/B'd at 512k×64 and
        # did NOT pay: 16.9 vs 17.9 s at 8 cores (noise), 66-71 vs 61-63 s
        # at 2 cores (a loss) — the explode's per-element rows are long/int
        # pairs through codegen hash-agg, already cheap enough that Arrow
        # serialization of the batch eats the win (the repgates boundary
        # again, from the other side).
        sums = (
            assigned.select(
                F.col("a.cluster").alias("j"), F.posexplode("q").alias("i", "x")
            )
            .groupBy("j", "i")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: k × dim rows — model size, not data size
        )
        new = cents.copy()  # empty cluster ⇒ keep previous centroid
        by_j: dict[int, list[tuple[int, int, int]]] = {}
        for r in sums:
            by_j.setdefault(r["j"], []).append((r["i"], r["s"], r["n"]))
        for j, items in by_j.items():
            for i, s, n in items:
                # floor(S/n + 0.5) in doubles — matches Spark/DuckDB floor
                new[j, i] = int(math.floor(s / n + 0.5))
        cents = new
    return base, cents


def kmeans_quantized(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    scale: float = 1000.0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact-integer Lloyd k-means over an embedding column: (id, cluster,
    d2) for the assignment AFTER `iters` re-centering rounds."""
    base, cents = kmeans_train(
        vectors, k=k, iters=iters, scale=scale, vec_col=vec_col, id_col=id_col
    )
    final = base.withColumn("a", _assign_udf(cents)(F.col("q")))
    return final.select(
        F.col("vid").alias(id_col),
        F.col("a.cluster").alias("cluster"),
        F.col("a.d2").alias("d2"),
    )


def semantic_dedup(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.92,
    scale: float = 1000.0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup: k-means buckets the space, near-dup search stays within a
    cluster.  A row is dropped iff some LOWER id in the SAME cluster has
    cosine ≥ threshold with it (keep-first, like dedup_exact / line_dedup).

    Returns (id, cluster, keep) for every input row — a curation gate
    column, composable with the other keep-flag families.
    """
    base, cents = kmeans_train(
        vectors, k=k, iters=iters, scale=scale, vec_col=vec_col, id_col=id_col
    )
    nq = F.aggregate(
        F.transform("q", lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    # one narrow pass assigns clusters onto the quantized base directly —
    # no rescan/re-quantize + shuffle join back (review finding; measured
    # executed plan 4 → 3 Exchanges, and the duplicate corpus scan +
    # quantization disappear inside the checkpoint).
    # localCheckpoint is load-bearing: pts feeds BOTH sides of the
    # self-join AND the final keep join — without it each branch re-runs
    # the full iterative k-means DAG (measured: 10 MapInPandas instances
    # in the executed plan vs 1 after; the assignment UDF is the
    # operator's hot path).
    pts = (
        base.withColumn("a", _assign_udf(cents)(F.col("q")))
        .select("vid", "q", F.col("a.cluster").alias("cluster"), nq.alias("nq"))
        .localCheckpoint(eager=True)
    )
    a = pts.select(
        F.col("vid").alias("va"), F.col("q").alias("qa"),
        F.col("nq").alias("na"), "cluster",
    )
    b = pts.select(
        F.col("vid").alias("vb"), F.col("q").alias("qb"),
        F.col("nq").alias("nb"), "cluster",
    )
    dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    # fixed double expression shape — single-rounded identically everywhere.
    # Zero-norm guard: an embedding whose every component quantizes to 0
    # (|x| < 0.5/scale) has nq=0, and the raw division is 0/0 — a
    # DIVIDE_BY_ZERO job crash under ANSI (the session default), or a NaN
    # that non-ANSI comparisons mis-rank. Cosine to a zero vector is
    # undefined; define it as 0 (not similar to anything).
    _norm_prod = F.sqrt(F.col("na").cast("double")) * F.sqrt(
        F.col("nb").cast("double")
    )
    cos = F.when(_norm_prod > 0, dot.cast("double") / _norm_prod).otherwise(
        F.lit(0.0)
    )
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("va") < F.col("vb"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= F.lit(threshold))
        .select(F.col("vb").alias("vid"))
        .distinct()
    )
    return (
        pts.join(dropped.withColumn("_drop", F.lit(True)), "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            "cluster",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"),
        )
    )


def _probe_udf(centroids: np.ndarray, nprobe: int):
    """Top-`nprobe` nearest centroid ids per vector, ordered by (d2, j) —
    numpy lexsort reproduces the oracle's row_number ORDER BY d, j."""
    from pyspark.sql.functions import pandas_udf

    cents = centroids.astype(np.int64)

    @pandas_udf("array<int>")
    def probes(qs):  # type: ignore[no-untyped-def]
        import pandas as pd

        if not len(qs):
            return pd.Series([], dtype=object)
        v = np.stack([np.asarray(x, dtype=np.int64) for x in qs])
        d2 = ((v[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)  # (n, k)
        order = np.lexsort((np.broadcast_to(np.arange(len(cents)), d2.shape), d2), axis=1)
        return pd.Series(list(order[:, :nprobe].astype(np.int32)))

    return probes


def ivf_topk_trained(
    vectors: DataFrame,
    k: int = 3,
    k_cells: int = 8,
    iters: int = 3,
    nprobe: int = 2,
    scale: float = 1000.0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN with a TRAINED coarse quantizer — the production IVF shape
    (FAISS IVFFlat, public): k-means centroids learned from the data
    itself replace similarity.ivf_topk's dominant-dimension heuristic.
    Every vector is indexed under its nearest centroid (the inverted
    list); each query probes its `nprobe` nearest cells; exact cosine
    only within the probed lists.

    All-exact like kmeans_quantized, so fully SQL-oracle-able: the probe
    ranking is (int64 d2, cell id) and the cosine is the fixed
    dot/(sqrt·sqrt) double shape over the same quantized integers.  A
    (query, nbr) pair can match through at most one cell (the nbr's
    single list cell), so no pair dedup is needed — the candidate join
    IS the candidate set."""
    from pyspark.sql.window import Window

    base, cents = kmeans_train(
        vectors, k=k_cells, iters=iters, scale=scale, vec_col=vec_col, id_col=id_col
    )
    nq = F.aggregate(
        F.transform("q", lambda x: x * x), F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    # one narrow pass computes probe cells for both roles; checkpoint so
    # the a/b branches don't re-run the assignment UDF (same trap as
    # semantic_dedup, measured there)
    cells = (
        base.withColumn("nq", nq)
        .withColumn("cells", _probe_udf(cents, nprobe)(F.col("q")))
        .localCheckpoint(eager=True)
    )
    lists = cells.select(
        F.col("vid").alias("nbr_id"), F.col("q").alias("qb"),
        F.col("nq").alias("nb"), F.element_at("cells", 1).alias("cell"),
    )
    probes = cells.select(
        F.col("vid").alias("query_id"), F.col("q").alias("qa"),
        F.col("nq").alias("na"), F.explode("cells").alias("cell"),
    )
    dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    # zero-norm guard, same as semantic_dedup above: 0/0 crashes under
    # ANSI; under non-ANSI the NaN sorts FIRST under F.desc and a zero
    # vector's arbitrary cluster-mates would displace all real neighbors
    _norm_prod = F.sqrt(F.col("na").cast("double")) * F.sqrt(
        F.col("nb").cast("double")
    )
    cos = F.when(_norm_prod > 0, dot.cast("double") / _norm_prod).otherwise(
        F.lit(0.0)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        probes.join(lists, "cell")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cos", "rank")
    )


def _pq_assign_udf(codebooks: np.ndarray):
    """Per-subspace code assignment against the broadcast PQ codebooks.

    ``codebooks`` is (m, k_sub, subdim) int64.  Exact int64 distances per
    subspace; argmin's first-minimum tie-break matches the oracle's
    min(struct(d, j))."""
    from pyspark.sql.functions import pandas_udf

    cbs = codebooks.astype(np.int64)  # (m, ks, sd)
    m, ks, sd = cbs.shape

    @pandas_udf("array<int>")
    def codes(qs):  # type: ignore[no-untyped-def]
        import pandas as pd

        if not len(qs):
            return pd.Series([], dtype=object)
        v = np.stack([np.asarray(x, dtype=np.int64) for x in qs])  # (n, dim)
        sub = v.reshape(len(v), m, 1, sd)  # (n, m, 1, sd)
        d2 = ((sub - cbs[None, :, :, :]) ** 2).sum(axis=3)  # (n, m, ks)
        return pd.Series(list(d2.argmin(axis=2).astype(np.int32)))

    return codes


def _resid_udf(centroids: np.ndarray):
    """Nearest coarse cell + exact int64 residual (q − centroid) in one
    narrow Arrow pass — the IVFPQ database-side encode input.  Residual
    encoding is the FAISS IVFPQ default (by_residual): residual magnitudes
    are smaller than raw coordinates, so the same code budget spends its
    precision where the within-list distances actually live."""
    from pyspark.sql.functions import pandas_udf

    cents = centroids.astype(np.int64)

    @pandas_udf("struct<cell: int, r: array<long>>")
    def resid(qs):  # type: ignore[no-untyped-def]
        import pandas as pd

        if not len(qs):
            return pd.DataFrame({"cell": [], "r": []})
        v = np.stack([np.asarray(x, dtype=np.int64) for x in qs])
        d2 = ((v[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        idx = d2.argmin(axis=1)  # first min ⇒ lowest cell id, oracle-tied
        return pd.DataFrame(
            {"cell": idx.astype(np.int32), "r": list(v - cents[idx])}
        )

    return resid


def _probe_lut_udf(centroids: np.ndarray, codebooks: np.ndarray, nprobe: int):
    """Per-query probe cells WITH their ADC lookup tables, one narrow pass.

    Returns array<struct<cell, lut>> ordered by (coarse d2, cell id); the
    lut for probe cell c is flattened m·k_sub longs —
    lut[s·k_sub + j] = exact ∑ᵢ (resid_sub[i] − C[s,j,i])² where
    resid = q − coarse_centroid_c (the query's residual IN THAT CELL,
    matching the residual the database side was encoded against).  The
    candidate join downstream therefore never touches a vector: ADC is
    element_at over this array, pure Catalyst."""
    from pyspark.sql.functions import pandas_udf

    cents = centroids.astype(np.int64)
    cbs = codebooks.astype(np.int64)
    m, ks, sd = cbs.shape

    @pandas_udf("array<struct<cell: int, lut: array<long>>>")
    def probe_lut(qs):  # type: ignore[no-untyped-def]
        import pandas as pd

        if not len(qs):
            return pd.Series([], dtype=object)
        v = np.stack([np.asarray(x, dtype=np.int64) for x in qs])
        d2 = ((v[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)  # (n, k)
        order = np.lexsort(
            (np.broadcast_to(np.arange(len(cents)), d2.shape), d2), axis=1
        )[:, :nprobe]
        out = []
        for row, cells in zip(v, order):
            entries = []
            for c in cells:
                rq = (row - cents[c]).reshape(m, 1, sd)
                lut = ((rq - cbs) ** 2).sum(axis=2)  # (m, ks)
                entries.append(
                    {"cell": int(c), "lut": lut.reshape(m * ks).tolist()}
                )
            out.append(entries)
        return pd.Series(out)

    return probe_lut


def pq_train(
    base: DataFrame,
    m: int = 4,
    k_sub: int = 16,
    iters: int = 2,
    dim: int = 64,
) -> np.ndarray:
    """Train per-subspace PQ codebooks with the same exact-integer Lloyd
    loop as kmeans_train (public algorithm: Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"; FAISS's IndexPQ trains the
    same way).  ``base`` must carry (vid, q) — the quantized output of
    kmeans_train.

    Broadcast-model structure: the codebooks (m × k_sub × subdim int64 —
    ~8 KB at the defaults) live on the driver; per iteration the plan is a
    narrow Arrow assignment (zero shuffle) plus ONE posexplode/groupBy
    whose partial aggregation collapses each map task to ≤ m·k_sub·subdim
    rows before the shuffle — model-sized shuffle bytes regardless of
    corpus size, the identical shape as kmeans_train's re-center.

    Init: codebook s starts from the sub-vectors of the k_sub lowest ids
    (deterministic, data-derived).  Empty codes keep their previous
    centroid.  Every step is int64/IEEE exact, so the DuckDB oracle can
    unroll the iterations and agree bit-for-bit."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sd = dim // m
    init = base.filter(F.col("vid") < k_sub).orderBy("vid").collect()
    if [r["vid"] for r in init] != list(range(k_sub)):
        raise ValueError(f"need ids 0..{k_sub - 1} present exactly once for PQ init")
    arr = np.array([r["q"] for r in init], dtype=np.int64)  # (k_sub, dim)
    # codebook s, entry j ← sub-vector s of init vector j
    cbs = np.ascontiguousarray(arr.reshape(k_sub, m, sd).transpose(1, 0, 2))

    for _ in range(iters):
        assigned = base.withColumn("codes", _pq_assign_udf(cbs)(F.col("q")))
        # one explode covers every (subspace, dim) cell: global position
        # gi → (s = gi div sd, i = gi mod sd), code = codes[s].
        sums = (
            assigned.select(F.col("codes"), F.posexplode("q").alias("gi", "x"))
            .select(
                (F.col("gi") / sd).cast("int").alias("s"),
                (F.col("gi") % sd).alias("i"),
                F.element_at("codes", (F.col("gi") / sd).cast("int") + 1).alias("j"),
                "x",
            )
            .groupBy("s", "j", "i")
            .agg(F.sum("x").alias("ssum"), F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: m·k_sub·subdim rows — model, not data
        )
        new = cbs.copy()  # empty code ⇒ keep previous centroid
        for r in sums:
            # floor(S/n + 0.5) in doubles — the kmeans_train idiom
            new[r["s"], r["j"], r["i"]] = int(math.floor(r["ssum"] / r["n"] + 0.5))
        cbs = new
    return cbs


def ivfpq_topk(
    vectors: DataFrame,
    k: int = 3,
    k_cells: int = 8,
    iters: int = 3,
    nprobe: int = 2,
    m: int = 4,
    k_sub: int = 16,
    pq_iters: int = 2,
    scale: float = 1000.0,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_queries: int | None = None,
) -> DataFrame:
    """IVF-PQ ANN — the production 100-TB index shape (FAISS IVFPQ,
    public): a trained coarse quantizer buckets the space into inverted
    lists, and inside the lists the database side is a PQ CODE (m small
    ints ≈ m bytes — 64× smaller than a float32 vector at the defaults),
    never the vector itself.  Query-side distances are asymmetric ADC:
    each query precomputes an m·k_sub lookup table of exact int64
    subspace distances in the SAME narrow Arrow pass that picks its probe
    cells, and the candidate join then scores with pure Catalyst
    element_at arithmetic — the join's hot stage moves codes and LUTs
    only, touches no embedding, and runs zero Python.

    Residual encoding (the FAISS by_residual default): codes quantize
    q − coarse_centroid, not q — the code budget spends its precision on
    within-list offsets, where the distances that decide the ranking
    actually live.  The query side mirrors it: each probe cell gets its
    own LUT built from the query's residual IN THAT CELL, so a database
    code and the LUT it is scored against always share a coarse origin.

    Plan: one localCheckpoint'd narrow pass (coarse assign + residual),
    one Arrow encode pass for the lists, one Arrow probe+LUT pass for the
    queries, one equi-join on the cell key, and a per-query top-k window
    already partitioned by the join key's hash.  A (query, nbr) pair
    meets through at most one cell (the nbr's single list cell), so the
    candidate join needs no dedup.

    Exactness: quantization, both Lloyd trainings, residuals, probe
    ranking and ADC sums are all int64/IEEE exact ⇒ the DuckDB twin
    unrolls both trainings and matches bit-for-bit (full value-hash
    oracle, unlike random-rotation PQ variants).

    ``n_queries`` restricts the query side to ids < n_queries (the
    production posture: queries ≪ corpus, every corpus row stays in the
    lists).  The result is exactly the full self-join output filtered to
    those query ids — the filter sits BEFORE the probe/LUT pass, so
    probe work and candidate rows scale with the query count while
    training and encoding still see the whole corpus.  Default None
    keeps the all-pairs self-ANN used by the sf oracle."""
    from pyspark.sql.window import Window

    if dim % m:  # fail before the coarse training burns corpus-wide work
        raise ValueError(f"dim {dim} not divisible by m {m}")

    base, cents = kmeans_train(
        vectors, k=k_cells, iters=iters, scale=scale, vec_col=vec_col, id_col=id_col
    )
    # one narrow pass derives (cell, residual) for every row; checkpoint —
    # WITH the quantized vector, so pq_train's iterations, the lists branch
    # AND the query/probe branch all reuse it instead of re-scanning the
    # source and re-running quantization (the semantic_dedup lesson,
    # measured there)
    res = (
        base.withColumn("a", _resid_udf(cents)(F.col("q")))
        .select(
            "vid", "q", F.col("a.cell").alias("cell"), F.col("a.r").alias("r")
        )
        .localCheckpoint(eager=True)
    )
    cbs = pq_train(
        res.select("vid", F.col("r").alias("q")), m=m, k_sub=k_sub,
        iters=pq_iters, dim=dim,
    )
    lists = res.withColumn("codes", _pq_assign_udf(cbs)(F.col("r"))).select(
        F.col("vid").alias("nbr_id"), F.col("codes"), F.col("cell")
    )
    qside = res if n_queries is None else res.filter(F.col("vid") < n_queries)
    probes = qside.withColumn(
        "pl", F.explode(_probe_lut_udf(cents, cbs, nprobe)(F.col("q")))
    ).select(
        F.col("vid").alias("query_id"),
        F.col("pl.cell").alias("cell"),
        F.col("pl.lut").alias("lut"),
    )
    # ADC: ∑ₛ lut[s·k_sub + codes[s]] — pure Catalyst over the broadcast-free
    # join output; int64 sum is order-independent, so exact.
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.element_at("lut", s * k_sub + F.element_at("codes", s + 1) + 1),
    )
    # window partitioned by the join key's own hash distribution — no extra
    # exchange before the top-k (the knn_join lesson: ClusteredDistribution
    # on a superset-compatible key is satisfied by the join's partitioning)
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_d2"), F.asc("nbr_id"))
    return (
        probes.join(lists, "cell")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .withColumn("adc_d2", adc)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "adc_d2", "rank")
    )
