"""Chunking and token-stream packing: coverage, overlap, bin arithmetic,
shard-parallel form, determinism under repartitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chronon_spark.functions.packing import chunk_documents, pack_token_stream


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(100))),  # 100 tokens
        (2, "a b c"),  # 3 tokens (single partial chunk)
        (3, "solo"),  # 1 token
        (4, "   "),  # whitespace-only: dropped
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunks_cover_all_tokens_with_overlap(docs):
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=32, overlap=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 0,24,48,72,96 -> 5 chunks; last has 100-96=4 tokens
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["chunk_idx"] for r in c1] == [0, 1, 2, 3, 4]
    assert [r["n_tokens"] for r in c1] == [32, 32, 32, 28, 4]
    assert c1[0]["chunk_text"].split(" ")[0] == "w0"
    # overlap: chunk k starts at token 24k, so chunk1 begins at w24 (8 overlap)
    assert c1[1]["chunk_text"].split(" ")[0] == "w24"
    # short docs -> one chunk each; empty doc dropped
    assert by_doc[2][0]["n_tokens"] == 3 and by_doc[3][0]["n_tokens"] == 1
    assert 4 not in by_doc


def test_chunk_args_validated(docs):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, "doc_id", "text", chunk_tokens=16, overlap=16)


def test_pack_bin_arithmetic(spark):
    sized = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 10)], "doc_id long, n int"
    )
    out = {r["doc_id"]: r for r in pack_token_stream(sized, "doc_id", "n", budget=256).collect()}
    # stream offsets: 0, 100, 200, 300
    assert (out[1]["bin_idx"], out[1]["bin_offset"], out[1]["spans_bins"]) == (0, 0, False)
    assert (out[2]["bin_idx"], out[2]["bin_offset"], out[2]["spans_bins"]) == (0, 100, False)
    assert (out[3]["bin_idx"], out[3]["bin_offset"], out[3]["spans_bins"]) == (0, 200, True)
    assert (out[4]["bin_idx"], out[4]["bin_offset"], out[4]["spans_bins"]) == (1, 44, False)


def test_pack_sharded_restarts_bins(spark):
    sized = spark.createDataFrame(
        [(1, 200, "s0"), (2, 200, "s0"), (3, 200, "s1")], "doc_id long, n int, shard string"
    )
    out = {
        r["doc_id"]: r
        for r in pack_token_stream(sized, "doc_id", "n", budget=256, shard_col="shard").collect()
    }
    assert out[2]["bin_idx"] == 0 and out[2]["spans_bins"]  # 200..400 straddles in s0
    assert out[3]["bin_idx"] == 0 and out[3]["bin_offset"] == 0  # s1 restarts


def test_pack_deterministic_under_repartition(spark):
    sized = spark.createDataFrame([(i, 37) for i in range(200)], "doc_id long, n int")
    a = {r["doc_id"]: r["bin_idx"] for r in pack_token_stream(sized, "doc_id", "n", 256).collect()}
    b = {
        r["doc_id"]: r["bin_idx"]
        for r in pack_token_stream(sized.repartition(13), "doc_id", "n", 256).collect()
    }
    assert a == b
