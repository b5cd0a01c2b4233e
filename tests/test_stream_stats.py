"""Streaming stats parity: the streamed per-tile summaries / histogram tiles
must equal the batch builders' output once drained (availableNow), and the
merge path must reproduce whole-table stats — the update/merge/finalize
contract applied to observability (reference: StatsCompute + TileSummary
producers feeding TileDriftCalculator)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chronon_spark.sources.synth import synth_transcripts
from chronon_spark.streaming.stats_stream import (
    derive_means,
    hist_tile_drift,
    hist_tiles,
    merge_summary_tiles,
    stream_hist_tiles,
    stream_summary_tiles,
    summary_tiles,
)


@pytest.fixture(scope="module")
def stat_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_stats_src")
    pdf = synth_transcripts(n_rows=4000, n_convs=25)
    for i in range(4):
        spark.createDataFrame(pdf.iloc[i::4]).write.mode("overwrite").parquet(f"{d}/part{i}")
    return str(d)


def _read_stream(spark, d):
    schema = spark.read.parquet(f"{d}/part0").schema
    return spark.readStream.schema(schema).option("recursiveFileLookup", "true").parquet(d)


def _read_batch(spark, d):
    return spark.read.option("recursiveFileLookup", "true").parquet(d)


def _drain(sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return name


COLS = ["n_chars", "turn_idx", "role"]


def test_stream_summary_tiles_match_batch(spark, stat_dir):
    out = stream_summary_tiles(_read_stream(spark, stat_dir), columns=COLS)
    _drain(out, "t_sum_tiles")
    got = {tuple(r) for r in spark.table("t_sum_tiles").collect()}
    want_df = summary_tiles(_read_batch(spark, stat_dir), columns=COLS)
    assert got == {tuple(r) for r in want_df.collect()}
    assert spark.table("t_sum_tiles").columns == ["tile_start", "column", "metric", "value"]


def test_merge_tiles_reproduces_whole_table_stats(spark, stat_dir):
    batch = _read_batch(spark, stat_dir)
    tiles = summary_tiles(batch, columns=COLS)
    merged = derive_means(merge_summary_tiles(tiles))
    got = {(r["column"], r["metric"]): r["value"] for r in merged.collect()}
    n_rows = batch.count()
    n = batch.where(F.col("n_chars").isNotNull()).count()  # count = non-null count
    exp_sum = batch.agg(F.sum("n_chars")).first()[0]
    assert got[("n_chars", "count")] == float(n)
    assert got[("n_chars", "nulls")] == float(n_rows - n)
    assert got[("n_chars", "sum")] == float(exp_sum)
    assert got[("n_chars", "min")] == float(batch.agg(F.min("n_chars")).first()[0])
    assert got[("n_chars", "max")] == float(batch.agg(F.max("n_chars")).first()[0])
    assert got[("n_chars", "mean")] == pytest.approx(exp_sum / n, abs=1e-6)


def test_merge_is_source_agnostic(spark, stat_dir):
    """Backfill ∪ streamed tail: merging tiles built from two disjoint halves
    equals merging tiles built from the whole — associativity."""
    batch = _read_batch(spark, stat_dir)
    a = batch.where(F.col("turn_idx") % 2 == 0)
    b = batch.where(F.col("turn_idx") % 2 == 1)
    whole = merge_summary_tiles(summary_tiles(batch, columns=["n_chars"]))
    halves = merge_summary_tiles(
        summary_tiles(a, columns=["n_chars"]).unionByName(summary_tiles(b, columns=["n_chars"]))
    )
    key = lambda df: {(r["column"], r["metric"]): r["value"] for r in df.collect()}  # noqa: E731
    assert key(whole) == key(halves)


def test_stream_hist_tiles_and_drift(spark, stat_dir):
    out = stream_hist_tiles(_read_stream(spark, stat_dir), cat_col="role")
    _drain(out, "t_hist_tiles")
    got = {tuple(r) for r in spark.table("t_hist_tiles").collect()}
    want = hist_tiles(_read_batch(spark, stat_dir), cat_col="role")
    assert got == {tuple(r) for r in want.collect()}
    # drift over the drained stream == drift over the batch tiles
    d_stream = {tuple(r) for r in hist_tile_drift(spark.table("t_hist_tiles")).collect()}
    d_batch = {tuple(r) for r in hist_tile_drift(want).collect()}
    assert d_stream == d_batch and len(d_batch) > 0
