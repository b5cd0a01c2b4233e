"""Deterministic sampling/splitting: identity-pure selection (never rand()),
partitioning-invariance, and md5 parity with the engine-independent oracle."""

from __future__ import annotations

import hashlib

import pytest

from chronon_spark.functions.sampling import (
    deterministic_sample,
    deterministic_split,
    hash_unit,
    mix_corpora,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "en" if i % 3 else "de", f"text {i}") for i in range(1000)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_hash_unit_matches_reference_md5(spark):
    df = spark.createDataFrame([("a1",), ("b2",)], "id string")
    got = {r["id"]: r["u"] for r in df.select("id", hash_unit("id", "s").alias("u")).collect()}
    for k, v in got.items():
        want = int(hashlib.md5(f"s{k}".encode()).hexdigest()[:15], 16) / float(1 << 60)
        assert v == pytest.approx(want, abs=0.0)


def test_split_partition_exactly_once_and_stable(docs):
    out = deterministic_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert sum(counts.values()) == 1000  # every row in exactly one split
    assert 700 < counts["train"] < 900 and counts["val"] > 50 and counts["test"] > 50
    # repartitioning must not move any row between splits
    again = deterministic_split(docs.repartition(17), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in again.collect()}
    assert a == b


def test_split_fractions_must_sum_to_one(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        deterministic_split(docs, "doc_id", {"train": 0.5, "test": 0.1})


def test_sample_is_subset_and_stable(docs):
    s1 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.3).collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(docs.repartition(9), "doc_id", 0.3).collect()}
    assert s1 == s2
    assert 200 < len(s1) < 400
    # different salt -> different (mostly independent) selection
    s3 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.3, salt="other").collect()}
    assert s3 != s1


def test_stratified_fractions_per_stratum(docs):
    out = stratified_sample(docs, "doc_id", "lang", {"de": 1.0}, default_fraction=0.1)
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    n_de = 1000 // 3 + (1 if 1000 % 3 else 0)  # i % 3 == 0
    assert got["de"] == 334  # keep-all stratum is exact
    assert 30 < got.get("en", 0) < 200  # ~10% of 666


def test_mix_corpora_tags_and_weights(docs):
    even = docs.where("doc_id % 2 = 0")
    odd = docs.where("doc_id % 2 = 1")
    out = mix_corpora({"ev": (even, 1.0), "od": (odd, 0.5)}, "doc_id")
    got = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert got["ev"] == 500  # weight 1.0 keeps everything
    assert 150 < got["od"] < 350
    # provenance is trustworthy
    assert out.where("source = 'ev' AND doc_id % 2 = 1").count() == 0
