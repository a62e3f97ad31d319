"""phash multi-index Hamming near-dup (image.phash_near_dup_pairs)."""

import pytest
from pyspark.sql import functions as F

from osmcoastline_spark.functions.image import phash_near_dup_pairs


def _imgs(spark, rows):
    return spark.createDataFrame(rows, "image_id long, phash long")


def test_detects_flipped_bits_and_orders_pairs(spark):
    h = 0x123456789ABCD
    rows = [
        (1, h),
        (2, h ^ (1 << 3) ^ (1 << 40)),  # hamming 2
        (3, h ^ 0b111),                 # hamming 3
        (4, h ^ 0b11110000),            # hamming 4 — beyond max_distance
        (5, 0x7AAAAAAAAAAAAAA),         # far away
    ]
    out = {
        (r["a"], r["b"]): r["hamming"]
        for r in phash_near_dup_pairs(_imgs(spark, rows), max_distance=3).collect()
    }
    # (2,3) differ in bits {0,1,2,3,40} — hamming 5, correctly excluded
    assert out == {(1, 2): 2, (1, 3): 3}


def test_banding_is_lossless_vs_brute_force(spark):
    """Every pair within max_distance must survive the band index
    (pigeonhole: d < n_bands ⇒ one band is untouched)."""
    import itertools

    hashes = {}
    for i in range(40):
        ps = [(i * p + q) % 32768 for p, q in
              [(2654435761, 97), (2246822519, 193), (3266489917, 389), (668265263, 769)]]
        hashes[i] = ps[0] + (ps[1] << 15) + (ps[2] << 30) + (ps[3] << 45)
    for i in range(0, 40, 4):  # plant near-dups
        hashes[i + 1000] = hashes[i] ^ (1 << (i % 60)) ^ (1 << ((i * 7 + 3) % 60))
    brute = {
        (a, b, bin(hashes[a] ^ hashes[b]).count("1"))
        for a, b in itertools.combinations(sorted(hashes), 2)
        if bin(hashes[a] ^ hashes[b]).count("1") <= 3
    }
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in phash_near_dup_pairs(
            _imgs(spark, list(hashes.items())), max_distance=3, band_bits=15
        ).collect()
    }
    assert got == brute
    assert len(got) >= 10  # non-vacuous


def test_rejects_unsound_band_config(spark):
    df = _imgs(spark, [(1, 7)])
    with pytest.raises(ValueError, match="banding would miss pairs"):
        phash_near_dup_pairs(df, max_distance=4, band_bits=16)  # 4 bands, d=4


def test_plan_is_band_equi_join_not_cross(spark):
    df = _imgs(spark, [(i, i * 37) for i in range(20)])
    plan = phash_near_dup_pairs(df, max_distance=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
