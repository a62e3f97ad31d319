"""k-means + SemDeDup (functions/cluster.py) vs an exact numpy replica.

Every step of kmeans_quantized is integer/IEEE-exact by construction, so
the Spark result must match the sequential numpy Lloyd loop bit-for-bit —
same quantization, same first-min tie-break, same floor(S/n + 0.5)
re-centering, same empty-cluster carry."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmcoastline_spark.functions import cluster as C

SF = "/root/testdata/sf0.001"


def _numpy_kmeans(V, k, iters):
    cents = V[:k].copy()
    for _ in range(iters):
        a = ((V[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        new = cents.copy()
        for j in range(k):
            sel = V[a == j]
            if len(sel):
                new[j] = np.array(
                    [int(math.floor(s / len(sel) + 0.5)) for s in sel.sum(axis=0)],
                    dtype=np.int64,
                )
        cents = new
    d2 = ((V[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)
    return a, d2[np.arange(len(V)), a]


@pytest.fixture(scope="module")
def emb_np(spark):
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    V = np.stack(
        [
            np.floor(np.asarray(r["embedding"], dtype=np.float64) * 1000 + 0.5).astype(
                np.int64
            )
            for r in rows
        ]
    )
    return ids, V


def test_kmeans_matches_numpy(spark, emb_np):
    ids, V = emb_np
    a_ref, d2_ref = _numpy_kmeans(V, k=8, iters=3)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = {
        r["vec_id"]: (r["cluster"], r["d2"])
        for r in C.kmeans_quantized(emb, k=8, iters=3).collect()
    }
    assert len(got) == len(ids)
    for n, i in enumerate(ids):
        assert got[int(i)] == (int(a_ref[n]), int(d2_ref[n])), f"vec {i}"
    # non-degenerate: every cluster is populated on this data
    assert len({c for c, _ in got.values()}) == 8


def test_kmeans_requires_init_ids(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(F.col("vec_id") >= 100)
    with pytest.raises(ValueError, match="exactly once"):
        C.kmeans_quantized(emb, k=8, iters=1)


def test_kmeans_rejects_duplicate_init_ids(spark):
    """A duplicated id below k must raise, not silently build >k centroids
    (review regression: a bare len() check passed 9 rows for k=8)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dup = emb.filter(F.col("vec_id") == 3)
    with pytest.raises(ValueError, match="exactly once"):
        C.kmeans_quantized(emb.unionByName(dup), k=8, iters=1)


def test_semantic_dedup_drops_scaled_copies(spark, emb_np):
    """Planted near-dups: a 0.9× scaled copy has cosine ≈ 1 with its
    original after quantization; distinct originals stay < 0.7. SemDeDup
    must drop exactly the copies (higher ids) and keep every original."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    copies = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(0.9).cast("float")).cast("float")
        ).alias("embedding"),
        "label",
    )
    both = emb.unionByName(copies)
    out = C.semantic_dedup(both, k=8, iters=2, threshold=0.95).collect()
    kept = {r["vec_id"] for r in out if r["keep"]}
    dropped = {r["vec_id"] for r in out if not r["keep"]}
    n = emb.count()
    assert len(out) == n + (n + 4) // 5
    assert dropped == {i + 100000 for i in range(0, n, 5)}
    assert kept == set(range(n))


def test_semantic_dedup_pairs_stay_within_cluster(spark, emb_np):
    """No near-dups planted ⇒ at a real-world threshold nothing drops
    (the join shape is cluster-bucketed, never all-pairs — asserted by
    the plan containing the cluster key join)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = C.semantic_dedup(emb, k=8, iters=2, threshold=0.95)
    assert out.filter(~F.col("keep")).count() == 0
    assert out.count() == emb.count()


def test_ivf_trained_recall_and_shape(spark):
    """Trained-IVF top-k: a planted near-duplicate lands in its original's
    inverted list (the trained quantizer puts near-identical vectors in
    the same cell), and recall@3 vs quantized brute force stays above a
    floor at nprobe=2 of 8 cells."""
    import numpy as np
    from osmcoastline_spark.functions.cluster import ivf_topk_trained

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    extra = [(9001, [v * 0.95 for v in dict((r["vec_id"], r["embedding"]) for r in rows)[3]], 0)]
    df = emb.unionByName(spark.createDataFrame(extra, emb.schema))
    top = ivf_topk_trained(df, k=3, k_cells=8, iters=2, nprobe=2)
    got = {(r["query_id"], r["rank"]): r["nbr_id"] for r in top.collect()}
    assert got[(3, 1)] == 9001 and got[(9001, 1)] == 3

    # recall@3 vs exact quantized-cosine brute force
    V = np.stack([np.floor(np.asarray(r["embedding"], np.float64) * 1000 + 0.5) for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    nrm = np.sqrt((V * V).sum(axis=1))
    cos = (V @ V.T) / (nrm[:, None] * nrm[None, :])
    np.fill_diagonal(cos, -2)
    hits = total = 0
    approx = {}
    for (qid, rank), nid in got.items():
        if qid != 9001 and nid != 9001:
            approx.setdefault(qid, set()).add(nid)
    for n, qid in enumerate(ids):
        truth = set(ids[np.argsort(-cos[n])[:3]])
        inter = truth & approx.get(int(qid), set())
        hits += len(inter)
        total += 3
    assert hits / total > 0.35, hits / total


def test_semantic_dedup_zero_norm_vector_survives(spark):
    """An embedding whose every component quantizes to 0 (|x| < 0.5/scale)
    has norm 0; the cosine guard must define cos=0 for it instead of
    dividing 0/0 — which crashed the job under ANSI (the session default)
    or NaN-marked the vector as a duplicate under non-ANSI."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0001, 0.0, 0.0, 0.0]),  # quantizes to the zero vector
        (2, [1.0, 0.0, 0.0, 0.0]),     # exact copy of 0 -> dropped
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: r.keep
        for r in C.semantic_dedup(
            df, k=1, iters=1, threshold=0.99, scale=1000.0
        ).collect()
    }
    assert got[0] is True
    assert got[1] is True, "zero-norm vector must not be NaN-dropped"
    assert got[2] is False


def test_ivf_trained_zero_norm_query_ranks_last(spark):
    """Same guard in ivf_topk_trained: a zero-quantized vector gets cos=0
    to every neighbor (ranked by the id tiebreak), never NaN (which sorts
    FIRST under desc and would displace all real neighbors)."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0001, 0.0, 0.0, 0.0]),  # zero-quantized
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = C.ivf_topk_trained(
        df, k=2, k_cells=1, iters=1, nprobe=1, scale=1000.0
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.rank, r.nbr_id, r.cos))
    # vec 0's neighbors: 1 (high cos) then 2 (cos exactly 0)
    n0 = sorted(by_q[0])
    assert n0[0][1] == 1 and n0[0][2] > 0.9
    assert n0[1][1] == 2 and n0[1][2] == 0.0
    # the zero vector's own neighbor cosines are all exactly 0
    assert all(c == 0.0 for _, _, c in by_q[2])


def _numpy_ivfpq(V, k=3, k_cells=8, iters=2, nprobe=2, m=4, k_sub=16, pq_iters=2):
    """Sequential replica of ivfpq_topk: coarse Lloyd, residuals, per-
    subspace Lloyd, probe cells by (d2, j), ADC over residual LUTs."""
    n, dim = V.shape
    sd = dim // m

    def lloyd(X, k_, it):
        cents = X[:k_].copy()
        for _ in range(it):
            a = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(2).argmin(1)
            new = cents.copy()
            for j in range(k_):
                sel = X[a == j]
                if len(sel):
                    new[j] = np.floor(sel.sum(0) / len(sel) + 0.5).astype(np.int64)
            cents = new
        return cents

    cents = lloyd(V, k_cells, iters)
    d2c = ((V[:, None, :] - cents[None, :, :]) ** 2).sum(2)
    cell = d2c.argmin(1)
    probes = np.lexsort(
        (np.broadcast_to(np.arange(k_cells), d2c.shape), d2c), axis=1
    )[:, :nprobe]
    R = (V - cents[cell]).reshape(n, m, sd)
    cbs = np.stack([lloyd(R[:, s, :], k_sub, pq_iters) for s in range(m)])
    codes = ((R[:, :, None, :] - cbs[None, :, :, :]) ** 2).sum(3).argmin(2)
    rows = []
    for q in range(n):
        cand = []
        for c in probes[q]:
            rq = (V[q] - cents[c]).reshape(m, 1, sd)
            lut = ((rq - cbs) ** 2).sum(2)
            for nb in np.where(cell == c)[0]:
                if nb != q:
                    cand.append((int(lut[np.arange(m), codes[nb]].sum()), nb))
        cand.sort()
        for r, (d, nb) in enumerate(cand[:k], 1):
            rows.append((q, nb, d, r))
    return rows


def test_ivfpq_matches_numpy_replica(spark, emb_np):
    """Residual IVF-PQ is exact end-to-end: coarse training, residuals,
    subspace training, probe ranking and ADC sums all reproduce the
    sequential numpy replica bit-for-bit (same guarantee the DuckDB
    oracle checks cross-engine)."""
    ids, V = emb_np
    assert (ids == np.arange(len(ids))).all()
    exp = sorted(_numpy_ivfpq(V))
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = sorted(
        (r["query_id"], r["nbr_id"], r["adc_d2"], r["rank"])
        for r in C.ivfpq_topk(
            emb, k=3, k_cells=8, iters=2, nprobe=2, m=4, k_sub=16, pq_iters=2
        ).collect()
    )
    assert got == exp


def test_ivfpq_planted_cluster_recall(spark):
    """On data with real cluster structure (8 well-separated centers +
    small deterministic jitter) the compressed index must still retrieve
    true neighbors: recall@3 vs exact quantized-L2 brute force above a
    floor.  The within-cluster variation is LOW-RANK (rank-3 coefficients
    on a shared basis) — the structure PQ's subspace codebooks exist to
    exploit.  Random iid jitter is the adversarial case for PQ (nothing
    to spend code precision on — measured ~0.29 recall on iid jitter and
    ~0.11 on fully iid embeddings); a compressed index is the wrong tool
    there and the docstring says so."""
    rng = np.random.RandomState(7)
    centers = rng.uniform(-1, 1, size=(8, 64)) * 10.0
    basis = rng.uniform(-1, 1, size=(3, 64))
    n = 320
    coef = rng.uniform(-0.5, 0.5, size=(n, 3))
    V = np.stack([centers[i % 8] + coef[i] @ basis for i in range(n)])
    df = spark.createDataFrame(
        [(i, [float(np.float32(x)) for x in V[i]], 0) for i in range(n)],
        "vec_id: long, embedding: array<float>, label: int",
    )
    top = C.ivfpq_topk(df, k=3, k_cells=8, iters=3, nprobe=2, m=4, k_sub=16)
    approx = {}
    for r in top.collect():
        approx.setdefault(r["query_id"], set()).add(r["nbr_id"])
    # truth grid from the float32-rounded values the operator actually
    # receives (the DataFrame stores float32), not the pre-rounding V —
    # near .5 grid boundaries the two can quantize one step apart
    Q = np.floor(V.astype(np.float32).astype(np.float64) * 1000 + 0.5).astype(np.int64)
    d2 = ((Q[:, None, :] - Q[None, :, :]) ** 2).sum(2)
    np.fill_diagonal(d2, 2**62)
    truth = np.argsort(d2, axis=1, kind="stable")[:, :3]
    hits = sum(len(set(truth[q]) & approx.get(q, set())) for q in range(n))
    assert hits / (3 * n) > 0.6, hits / (3 * n)


def test_ivfpq_plan_shape(spark):
    """The candidate stage is one equi-join on the cell key: no cartesian
    or nested-loop join anywhere, and the top-k window reuses the join's
    hash partitioning (no Exchange between join and window)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    top = C.ivfpq_topk(emb, k=3, k_cells=8, iters=2, nprobe=2)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # window directly above the join output: partitioning on query_id must
    # not add an Exchange beyond the two join-input shuffles (or one + a
    # broadcast, depending on AQE's choice for the small probes side)
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_ivfpq_n_queries_is_exact_subset(spark):
    """n_queries (the production queries ≪ corpus posture) returns exactly
    the full self-ANN output filtered to those query ids — training and
    lists are corpus-wide either way, so ranks and distances agree."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    full = {
        (r["query_id"], r["nbr_id"], r["adc_d2"], r["rank"])
        for r in C.ivfpq_topk(emb, k=3, k_cells=8, iters=2, nprobe=2).collect()
        if r["query_id"] < 40
    }
    sub = {
        (r["query_id"], r["nbr_id"], r["adc_d2"], r["rank"])
        for r in C.ivfpq_topk(
            emb, k=3, k_cells=8, iters=2, nprobe=2, n_queries=40
        ).collect()
    }
    assert sub == full and sub


def test_pq_train_rejects_bad_dim(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(ValueError, match="not divisible"):
        C.ivfpq_topk(emb, m=5)
