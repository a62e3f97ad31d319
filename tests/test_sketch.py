"""HyperLogLog sketch family: accuracy, exact mergeability, idempotence,
low-range correction, plan shape, NULL semantics."""

import hashlib

import pytest
from pyspark.sql import functions as F

from osmcoastline_spark.functions import sketch as SK

SF = "/root/testdata/sf0.01"


def _py_hll(values, p):
    """Sequential replica of the md5-digit HLL: returns {bucket: reg}."""
    regs = {}
    for v in values:
        hx = hashlib.md5(str(v).encode()).hexdigest()
        bucket = int(hx[:3], 16) >> (12 - p)
        tail = hx[3:15]
        t = tail.lstrip("0")
        if not t:
            rho = 49
        else:
            d = int(t[0], 16)
            in_digit = 0 if d >= 8 else 1 if d >= 4 else 2 if d >= 2 else 3
            rho = (12 - len(t)) * 4 + in_digit + 1
        rho = min(rho, SK.RHO_CAP)
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _py_estimate(regs, p):
    m = 1 << p
    zero = m - len(regs)
    s = sum(1 << (SK.RHO_CAP - r) for r in regs.values()) + zero * (1 << SK.RHO_CAP)
    return SK._numerator(m) / float(s)


def test_hll_matches_python_replica(spark):
    """Registers and the raw estimate reproduce the sequential replica
    bit-for-bit — the same guarantee the DuckDB oracle checks."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    sk = SK.hll_sketch(ev, ["event_type"], "user_id", p=5)
    got = {}
    for r in sk.collect():
        got.setdefault(r["event_type"], {})[r["bucket"]] = r["reg"]
    rows = ev.select("event_type", "user_id").collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["user_id"])
    exp = {t: _py_hll(vs, 5) for t, vs in by_type.items()}
    assert got == exp
    est = {
        r["event_type"]: (r["est_raw"], r["zero_regs"])
        for r in SK.hll_cardinality(sk, ["event_type"], p=5).collect()
    }
    for t, regs in exp.items():
        assert est[t][0] == _py_estimate(regs, 5)
        assert est[t][1] == (1 << 5) - len(regs)


def test_hll_accuracy_large(spark):
    """50k distinct ids at p=12: raw estimate within 5% (3 sigma)."""
    df = spark.range(50_000).select(F.lit("g").alias("g"), F.col("id"))
    sk = SK.hll_sketch(df, ["g"], "id", p=12)
    est = SK.hll_cardinality(sk, ["g"], p=12).collect()[0]["est_raw"]
    assert abs(est / 50_000 - 1) < 0.05, est


def test_hll_merge_equals_union_sketch(spark):
    """The mergeability contract is EXACT: merging per-part sketches gives
    the identical register set (and therefore the identical estimate) as
    sketching the union — across an arbitrary 3-way split with overlap."""
    a = spark.range(0, 4000).select(F.lit("g").alias("g"), F.col("id"))
    b = spark.range(3000, 8000).select(F.lit("g").alias("g"), F.col("id"))
    c = spark.range(7500, 9000).select(F.lit("g").alias("g"), F.col("id"))
    merged = SK.hll_merge(
        SK.hll_sketch(a, ["g"], "id", p=8),
        SK.hll_sketch(b, ["g"], "id", p=8),
        SK.hll_sketch(c, ["g"], "id", p=8),
    )
    union = SK.hll_sketch(
        a.unionByName(b).unionByName(c), ["g"], "id", p=8
    )
    as_set = lambda df: {(r["g"], r["bucket"], r["reg"]) for r in df.collect()}
    assert as_set(merged) == as_set(union)


def test_hll_duplicates_are_free(spark):
    """Sketching the same values 5x gives the identical register set —
    the idempotence COUNT DISTINCT semantics require."""
    one = spark.range(1000).select(F.lit("g").alias("g"), F.col("id"))
    five = one
    for _ in range(4):
        five = five.unionByName(one)
    as_set = lambda df: {(r["bucket"], r["reg"]) for r in df.collect()}
    assert as_set(SK.hll_sketch(five, ["g"], "id", p=8)) == as_set(
        SK.hll_sketch(one, ["g"], "id", p=8)
    )


def test_hll_corrected_low_range(spark):
    """At n=30, m=4096 the linear-counting switch engages and lands much
    closer than the raw estimate."""
    df = spark.range(30).select(F.lit("g").alias("g"), F.col("id"))
    sk = SK.hll_sketch(df, ["g"], "id", p=12)
    r = SK.hll_cardinality(sk, ["g"], p=12, corrected=True).collect()[0]
    assert r["zero_regs"] > 0
    assert abs(r["est"] - 30) < 3, r["est"]


def test_hll_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("g", 1), ("g", None), ("g", 2)], "g: string, v: long"
    )
    sk = SK.hll_sketch(df, ["g"], "v", p=8)
    assert sk.count() <= 2  # two non-null values, at most two buckets


def test_hll_plan_shape(spark):
    """Sketch is one exchange (group, bucket), estimate one more; zero
    Python stages anywhere."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    est = SK.hll_cardinality(
        SK.hll_sketch(ev, ["event_type"], "user_id", p=5), ["event_type"], p=5
    )
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_hll_rejects_bad_p(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    with pytest.raises(ValueError, match="p must be"):
        SK.hll_sketch(ev, ["event_type"], "user_id", p=13)


# --------------------------------------------------------------------------
# KMV bottom-k
# --------------------------------------------------------------------------


def _py_kmv(values, k):
    """Sequential replica: bottom-k distinct 60-bit md5 hashes with min
    string witnesses."""
    mins = {}
    for v in values:
        s = str(v)
        h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        if h not in mins or s < mins[h]:
            mins[h] = s
    return sorted(mins.items())[:k]


def test_kmv_matches_python_replica(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    sk = SK.kmv_sketch(ev, ["event_type"], "user_id", k=32)
    got = {}
    for r in sk.collect():
        got.setdefault(r["event_type"], []).append((r["h"], r["v"]))
    rows = ev.select("event_type", "user_id").collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["user_id"])
    exp = {t: _py_kmv(vs, 32) for t, vs in by_type.items()}
    assert {t: sorted(v) for t, v in got.items()} == exp
    # saturated estimator replica
    est = {
        r["event_type"]: (r["est"], r["sketch_size"])
        for r in SK.kmv_cardinality(sk, ["event_type"], k=32).collect()
    }
    for t, pairs in exp.items():
        hk = max(h for h, _ in pairs)
        assert est[t] == (float(31 * SK.KMV_SPACE) / float(hk), 32)


def test_kmv_accuracy_and_exact_small(spark):
    """Saturated: 50k distinct at k=256 within 20% (3 sigma ~ 19%).
    Unsaturated: 100 distinct at k=256 is EXACT."""
    big = spark.range(50_000).select(F.lit("g").alias("g"), F.col("id"))
    est = SK.kmv_cardinality(
        SK.kmv_sketch(big, ["g"], "id", k=256), ["g"], k=256
    ).collect()[0]
    assert est["sketch_size"] == 256
    assert abs(est["est"] / 50_000 - 1) < 0.20, est["est"]
    small = spark.range(100).select(F.lit("g").alias("g"), F.col("id"))
    r = SK.kmv_cardinality(
        SK.kmv_sketch(small, ["g"], "id", k=256), ["g"], k=256
    ).collect()[0]
    assert (r["est"], r["sketch_size"]) == (100.0, 100)


def test_kmv_merge_equals_union_sketch(spark):
    """Bottom-k of per-part bottom-k's equals bottom-k of the union —
    exact, any split, with overlap and duplicate values."""
    a = spark.range(0, 4000).select(F.lit("g").alias("g"), F.col("id"))
    b = spark.range(3000, 8000).select(F.lit("g").alias("g"), F.col("id"))
    merged = SK.kmv_merge(
        64,
        SK.kmv_sketch(a, ["g"], "id", k=64),
        SK.kmv_sketch(b, ["g"], "id", k=64),
    )
    union = SK.kmv_sketch(a.unionByName(b), ["g"], "id", k=64)
    as_set = lambda df: {(r["g"], r["h"], r["v"]) for r in df.collect()}
    assert as_set(merged) == as_set(union)


def test_kmv_sample_is_distinct_and_stable_under_duplication(spark):
    """The sketch is a sample of the DISTINCT set: replicating every row
    5x changes nothing, and witnesses are the values themselves."""
    one = spark.range(1000).select(F.lit("g").alias("g"), F.col("id"))
    five = one
    for _ in range(4):
        five = five.unionByName(one)
    as_set = lambda df: {(r["h"], r["v"]) for r in df.collect()}
    s1 = as_set(SK.kmv_sketch(one, ["g"], "id", k=64))
    assert s1 == as_set(SK.kmv_sketch(five, ["g"], "id", k=64))
    assert all(v.isdigit() and int(v) < 1000 for _, v in s1)


def test_kmv_plan_shape(spark):
    """One Arrow partial stage over the corpus; only candidate rows
    (tasks x k per group) reach the exchanges — never corpus rows."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    est = SK.kmv_cardinality(
        SK.kmv_sketch(ev, ["event_type"], "user_id", k=32), ["event_type"], k=32
    )
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_kmv_rejects_bad_k(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    with pytest.raises(ValueError, match="k must be"):
        SK.kmv_sketch(ev, ["event_type"], "user_id", k=1)


# --------------------------------------------------------------------------
# Count-min sketch
# --------------------------------------------------------------------------


def _py_cms_bucket(depth, value, w):
    return int(hashlib.md5(f"{depth}:{value}".encode()).hexdigest()[:15], 16) % w


def test_cms_matches_python_replica(spark):
    """Cells and per-key estimates reproduce the sequential replica
    bit-for-bit — the same guarantee the DuckDB oracle checks."""
    d, w = 3, 16
    ev = spark.read.parquet(f"{SF}/events.parquet")
    sk = SK.cms_sketch(ev, ["event_type"], "user_id", d=d, w=w)
    got = {
        (r["event_type"], r["depth"], r["bucket"]): r["cnt"]
        for r in sk.collect()
    }
    rows = ev.select("event_type", "user_id").collect()
    exp = {}
    for r in rows:
        if r["user_id"] is None:
            continue
        for i in range(d):
            key = (r["event_type"], i, _py_cms_bucket(i, r["user_id"], w))
            exp[key] = exp.get(key, 0) + 1
    assert got == exp
    keys = ev.select("event_type", "user_id").distinct()
    est = {
        (r["event_type"], r["user_id"]): r["est"]
        for r in SK.cms_estimate(
            sk, keys, ["event_type"], "user_id", d=d, w=w
        ).collect()
    }
    for (t, u), e in est.items():
        want = min(
            exp.get((t, i, _py_cms_bucket(i, u, w)), 0) for i in range(d)
        )
        assert e == want, (t, u, e, want)


def test_cms_one_sided_and_bounded(spark):
    """The CMS contract on a skewed stream: est >= true for EVERY key,
    and the heavy key's estimate is within the e*N/w additive bound."""
    import math

    d, w = 4, 128
    # zipf-ish: key 0 appears 5000x, keys 1..999 once each
    heavy = spark.range(5000).select(F.lit("g").alias("g"), F.lit(0).alias("v"))
    tail = spark.range(1, 1000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    df = heavy.unionByName(tail)
    n = 5999
    sk = SK.cms_sketch(df, ["g"], "v", d=d, w=w)
    keys = df.distinct()
    est = {
        r["v"]: r["est"]
        for r in SK.cms_estimate(sk, keys, ["g"], "v", d=d, w=w).collect()
    }
    true = {0: 5000, **{i: 1 for i in range(1, 1000)}}
    assert all(est[k] >= true[k] for k in true)
    bound = math.e * n / w  # per-row overflow bound, P[exceed] <= e^-d
    assert est[0] - true[0] <= bound, est[0]
    # the guarantee holds for ~all keys; allow the e^-d tail
    bad = sum(1 for k in true if est[k] - true[k] > bound)
    assert bad <= len(true) * 0.05, bad


def test_cms_merge_equals_union_sketch(spark):
    """Merging per-part sketches gives the identical cell counts as
    sketching the union — counts add exactly."""
    a = spark.range(0, 4000).select(F.lit("g").alias("g"), (F.col("id") % 37).alias("v"))
    b = spark.range(0, 3000).select(F.lit("g").alias("g"), (F.col("id") % 11).alias("v"))
    merged = SK.cms_merge(
        SK.cms_sketch(a, ["g"], "v", d=3, w=32),
        SK.cms_sketch(b, ["g"], "v", d=3, w=32),
    )
    union = SK.cms_sketch(a.unionByName(b), ["g"], "v", d=3, w=32)
    as_set = lambda df: {
        (r["g"], r["depth"], r["bucket"], r["cnt"]) for r in df.collect()
    }
    assert as_set(merged) == as_set(union)


def test_cms_plan_shape(spark):
    """Sketch is ONE exchange; the estimate side joins the model-sized
    sketch d times BROADCAST — zero exchange of the key side, zero
    Python stages anywhere."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    sk = SK.cms_sketch(ev, ["event_type"], "user_id", d=3, w=16)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    keys = ev.select("event_type", "user_id").distinct()
    est = SK.cms_estimate(sk, keys, ["event_type"], "user_id", d=3, w=16)
    eplan = est._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in eplan and "CartesianProduct" not in eplan
    assert eplan.count("BroadcastHashJoin") == 3, eplan


def test_cms_rejects_bad_params(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    with pytest.raises(ValueError, match="need d"):
        SK.cms_sketch(ev, ["event_type"], "user_id", d=0, w=16)
    with pytest.raises(ValueError, match="need d"):
        SK.cms_sketch(ev, ["event_type"], "user_id", d=2, w=1)


# --------------------------------------------------------------------------
# Bloom filter
# --------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_replica(spark):
    """Every true member passes (the Bloom contract), and the kept set
    reproduces the sequential hashlib replica exactly — the same
    guarantee the DuckDB oracle checks."""
    m, k = 1 << 10, 3
    build = spark.range(0, 300).select((F.col("id") * 7).alias("key"))
    probe = spark.range(0, 3000).select(F.col("id").alias("key"))
    bloom = SK.bloom_build(build, "key", m_bits=m, k=k)
    kept = {
        r["key"]
        for r in SK.bloom_prune(probe, bloom, "key", m_bits=m, k=k).collect()
    }
    bits = set()
    for v in range(0, 300):
        for i in range(k):
            bits.add(_py_cms_bucket(i, v * 7, m))
    exp = {
        v
        for v in range(3000)
        if all(_py_cms_bucket(i, v, m) in bits for i in range(k))
    }
    assert kept == exp
    true_members = {v * 7 for v in range(300) if v * 7 < 3000}
    assert true_members <= kept  # no false negatives


def test_bloom_false_positive_rate_bounded(spark):
    """Disjoint probe keys: measured FP rate within 3x of the classic
    (1-(1-1/m)^kn)^k bound."""
    m, k, n = 1 << 12, 3, 500
    build = spark.range(0, n).select(F.col("id").alias("key"))
    probe = spark.range(100_000, 110_000).select(F.col("id").alias("key"))
    bloom = SK.bloom_build(build, "key", m_bits=m, k=k)
    fp = SK.bloom_prune(probe, bloom, "key", m_bits=m, k=k).count()
    rate = fp / 10_000
    theory = (1 - (1 - 1 / m) ** (k * n)) ** k
    assert rate <= 3 * theory + 0.005, (rate, theory)


def test_bloom_merge_equals_union_build(spark):
    a = spark.range(0, 400).select(F.col("id").alias("key"))
    b = spark.range(300, 900).select(F.col("id").alias("key"))
    merged = SK.bloom_merge(
        SK.bloom_build(a, "key", m_bits=1 << 10, k=3),
        SK.bloom_build(b, "key", m_bits=1 << 10, k=3),
    )
    union = SK.bloom_build(a.unionByName(b), "key", m_bits=1 << 10, k=3)
    as_set = lambda df: {r["bit"] for r in df.collect()}
    assert as_set(merged) == as_set(union)


def test_bloom_plan_shape(spark):
    """Build is ONE distinct exchange; prune is k BROADCAST joins with
    the probe side never shuffled; zero Python stages."""
    build = spark.range(0, 500).select(F.col("id").alias("key"))
    probe = spark.range(0, 5000).select(F.col("id").alias("key"))
    bloom = SK.bloom_build(build, "key", m_bits=1 << 12, k=3)
    bplan = bloom._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in bplan
    assert bplan.count("Exchange hashpartitioning") <= 1, bplan
    pruned = SK.bloom_prune(probe, bloom, "key", m_bits=1 << 12, k=3)
    pplan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in pplan and "CartesianProduct" not in pplan
    assert pplan.count("BroadcastHashJoin") == 3, pplan


def test_bloom_rejects_bad_params(spark):
    df = spark.range(3).select(F.col("id").alias("key"))
    with pytest.raises(ValueError, match="need k"):
        SK.bloom_build(df, "key", m_bits=1 << 10, k=0)
    with pytest.raises(ValueError, match="at least one"):
        SK.bloom_merge()


# --------------------------------------------------------------------------
# Deterministic-sample quantile sketch
# --------------------------------------------------------------------------


def _py_sample(rows, rate_hex, salt="q"):
    keep = []
    for rid, group, value in rows:
        h = int(hashlib.md5(f"{salt}:{rid}".encode()).hexdigest()[:4], 16)
        if h < rate_hex:
            keep.append((group, value))
    return keep


def test_sample_quantiles_matches_python_replica(spark):
    """Sampled rows and every quantile readout reproduce the sequential
    replica exactly — est is COPIED from the sample, never computed."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    sk = SK.sample_sketch(ev, ["event_type"], "value", "event_id", rate_hex=16384)
    rows = [
        (r["event_id"], r["event_type"], r["value"])
        for r in ev.select("event_id", "event_type", "value").collect()
        if r["value"] is not None and r["event_id"] is not None
    ]
    exp_sample = _py_sample(rows, 16384)
    got_sample = [(r["event_type"], r["value"]) for r in sk.collect()]
    assert sorted(got_sample) == sorted(exp_sample)
    got = {
        (r["event_type"], r["q"]): r["est"]
        for r in SK.sample_quantiles(sk, ["event_type"]).collect()
    }
    by_g = {}
    for g, v in exp_sample:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        vs.sort()
        n = len(vs)
        for label, (num, den) in SK.QUANTILES.items():
            pos = max(1, -(-num * n // den))  # ceil
            assert got[(g, label)] == vs[pos - 1], (g, label)


def test_sample_quantiles_dkw_accuracy(spark):
    """Uniform 0..99999 values, ~12.5% sample: each quantile's RANK error
    is within the DKW 3-sigma band."""
    df = spark.range(100_000).select(
        F.lit("g").alias("g"), F.col("id").alias("rid"), F.col("id").cast("double").alias("v")
    )
    sk = SK.sample_sketch(df, ["g"], "v", "rid", rate_hex=8192)
    n = sk.count()
    eps = (2.0 / n) ** 0.5 * 1.5  # ~3 sigma of DKW
    got = {r["q"]: r["est"] for r in SK.sample_quantiles(sk, ["g"]).collect()}
    for label, (num, den) in SK.QUANTILES.items():
        q = num / den
        assert abs(got[label] / 100_000 - q) < eps, (label, got[label], eps)


def test_sample_sketch_merge_equals_union(spark):
    """Disjoint-id parts: union of part sketches equals the sketch of the
    union EXACTLY (per-row verdicts are id-determined)."""
    a = spark.range(0, 5000).select(F.lit("g").alias("g"), F.col("id").alias("rid"), (F.col("id") % 97).cast("double").alias("v"))
    b = spark.range(5000, 9000).select(F.lit("g").alias("g"), F.col("id").alias("rid"), (F.col("id") % 89).cast("double").alias("v"))
    merged = SK.sample_sketch(a, ["g"], "v", "rid", rate_hex=8192).unionByName(
        SK.sample_sketch(b, ["g"], "v", "rid", rate_hex=8192)
    )
    union = SK.sample_sketch(a.unionByName(b), ["g"], "v", "rid", rate_hex=8192)
    coll = lambda df: sorted((r["g"], r["value"]) for r in df.collect())
    assert coll(merged) == coll(union)


def test_sample_quantiles_plan_shape(spark):
    """Sketch is a NARROW filter (zero exchange); the readout's window +
    count share one exchange; zero Python stages."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    sk = SK.sample_sketch(ev, ["event_type"], "value", "event_id", rate_hex=16384)
    splan = sk._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in splan and "Python" not in splan, splan
    est = SK.sample_quantiles(sk, ["event_type"])
    eplan = est._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in eplan
    assert eplan.count("Exchange hashpartitioning") <= 1, eplan


def test_sample_sketch_rejects_bad_rate(spark):
    ev = spark.range(3).select(F.lit("g").alias("g"), F.col("id").alias("rid"), F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="rate_hex"):
        SK.sample_sketch(ev, ["g"], "v", "rid", rate_hex=0)


# --------------------------------------------------------------------------
# KMV pairwise overlap
# --------------------------------------------------------------------------


def test_kmv_overlap_exact_when_unsaturated(spark):
    """Both groups below k: the sketches ARE the distinct sets, so
    common/basis/jaccard/union/intersection are all exact."""
    a = spark.range(0, 30).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    b = spark.range(20, 50).select(F.lit("b").alias("g"), F.col("id").alias("v"))
    sk = SK.kmv_sketch(a.unionByName(b), ["g"], "v", k=256)
    r = SK.kmv_overlap(sk, "g", k=256).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["g1"], row["g2"]) == ("a", "b")
    assert row["common"] == 10 and row["basis"] == 50
    assert row["jaccard_est"] == 10 / 50
    assert row["union_est"] == 50.0
    assert row["inter_est"] == (10 / 50) * 50.0


def test_kmv_overlap_accuracy_saturated(spark):
    """Two 20k-element sets with true Jaccard 1/3 (10k shared): the k=512
    estimate lands within ~4 sigma of sqrt(J(1-J)/k)."""
    a = spark.range(0, 20_000).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    b = spark.range(10_000, 30_000).select(F.lit("b").alias("g"), F.col("id").alias("v"))
    sk = SK.kmv_sketch(a.unionByName(b), ["g"], "v", k=512)
    row = SK.kmv_overlap(sk, "g", k=512).collect()[0]
    true_j = 10_000 / 30_000
    sigma = (true_j * (1 - true_j) / 512) ** 0.5
    assert abs(row["jaccard_est"] - true_j) < 4 * sigma, row["jaccard_est"]
    assert abs(row["union_est"] / 30_000 - 1) < 0.2
    assert abs(row["inter_est"] / 10_000 - 1) < 0.35


def test_kmv_overlap_matches_python_replica(spark):
    """Pairwise readout over the events sketch reproduces a sequential
    replica bit-for-bit (the DuckDB-oracle guarantee)."""
    k = 32
    ev = spark.read.parquet(f"{SF}/events.parquet")
    sk = SK.kmv_sketch(ev, ["event_type"], "user_id", k=k)
    got = {
        (r["g1"], r["g2"]): (
            r["common"], r["basis"], r["jaccard_est"], r["union_est"], r["inter_est"]
        )
        for r in SK.kmv_overlap(sk, "event_type", k=k).collect()
    }
    bottoms = {}
    for r in sk.collect():
        bottoms.setdefault(r["event_type"], set()).add(r["h"])
    num = float((k - 1) * SK.KMV_SPACE)
    exp = {}
    for g1 in sorted(bottoms):
        for g2 in sorted(bottoms):
            if g1 >= g2:
                continue
            u = sorted(bottoms[g1] | bottoms[g2])[:k]
            basis = len(u)
            common = sum(1 for h in u if h in bottoms[g1] and h in bottoms[g2])
            union_est = float(basis) if basis < k else num / float(u[-1])
            jac = common / basis
            exp[(g1, g2)] = (common, basis, jac, union_est, jac * union_est)
    assert got == exp


def test_kmv_overlap_disjoint_sets(spark):
    a = spark.range(0, 5000).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    b = spark.range(10_000, 15_000).select(F.lit("b").alias("g"), F.col("id").alias("v"))
    sk = SK.kmv_sketch(a.unionByName(b), ["g"], "v", k=128)
    row = SK.kmv_overlap(sk, "g", k=128).collect()[0]
    assert row["common"] == 0 and row["jaccard_est"] == 0.0 and row["inter_est"] == 0.0
