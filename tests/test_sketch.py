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
