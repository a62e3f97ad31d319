"""Hashed linear quality classifier (curate.quality_classifier)."""

import hashlib

from pyspark.sql import functions as F

from osmcoastline_spark.functions.curate import quality_classifier


def _w(feature: str) -> int:
    return int(hashlib.md5(feature.encode()).hexdigest()[0], 16) * 2 - 15


def test_hand_computed_score(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, ""), (3, "  solo  ")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in quality_classifier(docs).collect()}
    feats1 = ["the", "cat", "sat", "the cat", "cat sat"]
    num1 = sum(_w(f) for f in feats1)
    assert out[1]["n_features"] == 5
    assert out[1]["score_num"] == num1
    assert out[1]["score"] == num1 / 5
    assert out[1]["pass_quality"] == (num1 > 0)
    # empty doc: zero features, defined zero score, fails the gate
    assert (out[2]["n_features"], out[2]["score_num"], out[2]["score"]) == (0, 0, 0.0)
    assert out[2]["pass_quality"] is False
    # single token: no bigrams
    assert out[3]["n_features"] == 1
    assert out[3]["score_num"] == _w("solo")


def test_trained_weight_table_broadcast_path(spark):
    docs = spark.createDataFrame(
        [(1, "good good stuff"), (2, "bad noise")], "doc_id long, text string"
    )
    weights = spark.createDataFrame(
        [("good", 1000), ("bad", -2000), ("good good", 500)],
        "feature string, weight_x1000 long",
    )
    out = {
        r["doc_id"]: r for r in quality_classifier(docs, weights=weights).collect()
    }
    # doc 1: good(1000)*2 + stuff(miss) + "good good"(500) + "good stuff"(miss)
    assert out[1]["score_num"] == 2500
    assert out[1]["n_features"] == 5
    assert out[1]["pass_quality"] is True
    # doc 2: bad(-2000) + noise(miss) + "bad noise"(miss)
    assert out[2]["score_num"] == -2000
    assert out[2]["pass_quality"] is False


def test_default_path_is_narrow_zero_shuffle(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = quality_classifier(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_splits_real_corpus_non_vacuously(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    agg = quality_classifier(docs).agg(
        F.sum(F.col("pass_quality").cast("int")).alias("p"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert 0 < agg["p"] < agg["n"]
