"""Streaming exact dedup parity: once the stream drains, the kept set equals
the batch exact_dedup keepers (first arrival by event time per fingerprint),
and within-watermark re-arrivals are dropped."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chronon_spark.functions.dedup import exact_dedup
from chronon_spark.streaming import stream_exact_dedup


@pytest.fixture(scope="module")
def src_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dedup_src")
    rows = []
    texts = ["alpha beta gamma", "delta epsilon zeta", "Alpha  Beta GAMMA", "eta theta iota"]
    for i in range(200):
        # duplicates arrive interleaved across files (micro-batches)
        rows.append((i, texts[i % 4], f"2024-01-01 00:{i % 60:02d}:00"))
    df = spark.createDataFrame(rows, "doc_id long, text string, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    for i in range(4):
        df.where(F.col("doc_id") % 4 == i).write.mode("overwrite").parquet(f"{d}/part{i}")
    return str(d)


def test_stream_dedup_matches_batch_fingerprints(spark, src_dir):
    schema = spark.read.parquet(f"{src_dir}/part0").schema
    stream = spark.readStream.schema(schema).option("recursiveFileLookup", "true").parquet(src_dir)
    out = stream_exact_dedup(stream, "text", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("dedup_out").toPandas()
    # normalization makes 'Alpha  Beta GAMMA' a duplicate of 'alpha beta gamma'
    batch = spark.read.option("recursiveFileLookup", "true").parquet(src_dir)
    want_fps = {r["fp"] for r in exact_dedup(batch, "text", "doc_id").collect()}
    assert set(got["fp"]) == want_fps
    assert len(want_fps) == 3
    # exactly one survivor per fingerprint
    assert got["fp"].value_counts().max() == 1
