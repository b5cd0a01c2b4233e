"""Structured Streaming parity: the streaming GroupBy must produce exactly
what the equivalent batch aggregation produces once the stream is drained
(availableNow trigger). This mirrors the reference's online/offline
consistency suite (ConsistencyJob / FetcherGeneratedTest, SURVEY.md §5.4).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.sources.synth import synth_transcripts
from chronon_spark.streaming import stream_hop_tiles, stream_sessionize, stream_tumbling_agg


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_src")
    pdf = synth_transcripts(n_rows=4000, n_convs=30)
    # several files → several micro-batches worth of splits
    for i in range(4):
        spark.createDataFrame(pdf.iloc[i::4]).write.mode("overwrite").parquet(f"{d}/part{i}")
    return str(d)


def _read_stream(spark, d):
    schema = spark.read.parquet(f"{d}/part0").schema
    return spark.readStream.schema(schema).option("recursiveFileLookup", "true").parquet(d)


def _read_batch(spark, d):
    return spark.read.option("recursiveFileLookup", "true").parquet(d)


def _drain(sdf, name):
    q = sdf.writeStream.format("memory").queryName(name).outputMode("complete").trigger(
        availableNow=True
    ).start()
    q.awaitTermination(300)
    return name


def _rows(spark, name):
    return {tuple(r) for r in spark.table(name).collect()}


def test_stream_tumbling_matches_batch(spark, stream_dir):
    aggs = {"n": F.count(F.lit(1)), "total": F.round(F.sum("n_chars"), 3)}
    out = stream_tumbling_agg(_read_stream(spark, stream_dir), ["conv_id"], "1d", aggs)
    _drain(out, "t_tumbling")
    batch = (
        _read_batch(spark, stream_dir)
        .groupBy("conv_id", F.window("ts", "86400 seconds").alias("__w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("n_chars"), 3).alias("total"))
        .select("conv_id", F.col("__w.start").alias("window_start"), F.col("__w.end").alias("window_end"), "n", "total")
    )
    assert _rows(spark, "t_tumbling") == {tuple(r) for r in batch.collect()}


def test_stream_tiles_match_batch_tiles(spark, stream_dir):
    gb = GroupBy(
        keys=["conv_id"],
        aggregations=[
            Aggregation("n_chars", Op.SUM, windows=("13d",)),
            Aggregation("n_chars", Op.MIN, windows=("13d",)),
        ],
    )
    out = stream_hop_tiles(_read_stream(spark, stream_dir), gb)
    _drain(out, "t_tiles")
    got = spark.table("t_tiles")
    assert set(got.columns) == {"conv_id", "tile_start", "n_chars__cnt", "n_chars__sum", "n_chars__min"}
    batch = (
        _read_batch(spark, stream_dir)
        .groupBy("conv_id", F.window("ts", "86400 seconds").alias("__w"))
        .agg(
            F.count("n_chars").alias("n_chars__cnt"),
            F.sum("n_chars").alias("n_chars__sum"),
            F.min("n_chars").alias("n_chars__min"),
        )
        .select("conv_id", F.col("__w.start").alias("tile_start"), "n_chars__cnt", "n_chars__sum", "n_chars__min")
    )
    assert _rows(spark, "t_tiles") == {tuple(r) for r in batch.collect()}


def test_stream_tiles_full_ops_match_batch_builder(spark, stream_dir):
    """Streaming tiles for the collection-IR families (entry lists, k-extreme
    lists, distinct sets, histogram maps, power sums) must equal the batch
    tile builder's rows exactly — the update/merge contract that lets a
    fetcher combine batch IRs with streaming tiles."""
    from chronon_spark.operators.tiles import build_hop_tiles

    gb = GroupBy(
        keys=["conv_id"],
        aggregations=[
            Aggregation("text", Op.LAST_K, windows=("13d",), k=2),
            Aggregation("text", Op.FIRST_K, windows=("13d",), k=2),
            Aggregation("n_chars", Op.TOP_K, windows=("13d",), k=3),
            Aggregation("role", Op.UNIQUE_COUNT, windows=("13d",)),
            Aggregation("role", Op.HISTOGRAM, windows=("13d",)),
            Aggregation("n_chars", Op.VARIANCE, windows=("13d",)),
            Aggregation("n_chars", Op.SUM, windows=("13d",), buckets=("role",)),
            Aggregation("n_chars", Op.MIN, windows=("13d",), buckets=("role",)),
        ],
        tie_breakers=["turn_idx"],
        sawtooth=True,
    )
    out = stream_hop_tiles(_read_stream(spark, stream_dir), gb)
    _drain(out, "t_tiles_full")
    got = spark.table("t_tiles_full").toPandas()
    hop_us = 86_400 * 1_000_000
    batch = (
        build_hop_tiles(_read_batch(spark, stream_dir), gb)
        .withColumn("tile_start", F.timestamp_micros(F.col("__hop") * F.lit(hop_us)))
        .drop("__hop")
        .toPandas()
    )
    assert set(got.columns) == set(batch.columns)
    key = ["conv_id", "tile_start"]

    def canon(df):
        df = df.sort_values(key).reset_index(drop=True)
        for c in df.columns:
            if c.endswith("__set"):
                df[c] = df[c].map(lambda v: tuple(sorted(v)) if v is not None else None)
            elif c.endswith("__hist"):
                df[c] = df[c].map(
                    lambda v: tuple(sorted((e["__v"], e["__c"]) for e in v)) if v is not None else None
                )
            elif c.endswith(("__firstk", "__lastk")):
                df[c] = df[c].map(
                    lambda v: tuple((e["t"], e["b0"], e["v"]) for e in v) if v is not None else None
                )
            elif c.endswith(("__topk", "__bottomk", "__utopk")):
                df[c] = df[c].map(lambda v: tuple(v) if v is not None else None)
            elif "__bk__" in c:
                df[c] = df[c].map(
                    lambda v: tuple(
                        sorted(tuple(sorted(e.items())) for e in v)
                    )
                    if v is not None
                    else None
                )
        return df

    g, b = canon(got), canon(batch)
    assert len(g) == len(b)
    for c in g.columns:
        x, y = g[c], b[c]
        if x.dtype.kind == "f":
            ok = (x.isna() & y.isna()) | ((x - y).abs() < 1e-6)
        else:
            ok = x.isna() & y.isna() | (x == y)
        assert ok.all(), f"col {c}: {int((~ok).sum())} diffs"


def test_stream_sessionize_counts(spark, stream_dir):
    out = stream_sessionize(_read_stream(spark, stream_dir), ["conv_id"], gap="30m")
    _drain(out, "t_sessions")
    got = spark.table("t_sessions")
    n_rows = _read_batch(spark, stream_dir).count()
    assert got.agg(F.sum("n_turns")).first()[0] == n_rows  # every turn in exactly one session
    # session invariant: start <= end, and sessions of one conv don't overlap
    pdf = got.toPandas().sort_values(["conv_id", "session_start"])
    assert (pdf["session_start"] <= pdf["session_end"]).all()
    by_conv = pdf.groupby("conv_id")
    for _, g in by_conv:
        starts = g["session_start"].to_numpy()
        ends = g["session_end"].to_numpy()
        assert (starts[1:] >= ends[:-1]).all()


def test_stream_metrics_collector(spark, stream_dir, tmp_path):
    from chronon_spark.streaming.metrics import StreamMetricsCollector

    collector = StreamMetricsCollector(spark)
    try:
        sdf = stream_tumbling_agg(
            _read_stream(spark, stream_dir), ["conv_id"], "1d", {"n": F.count(F.lit(1))}
        )
        _drain(sdf, "metrics_probe")
        import time as _t

        for _ in range(40):  # listener delivery is async
            rows = [r for r in collector.rows() if r["num_input_rows"]]
            if rows:
                break
            _t.sleep(0.5)
        assert rows, "no progress events captured"
        assert sum(r["num_input_rows"] for r in rows) == 4000
        assert all(r["batch_id"] >= 0 and "triggerExecution" in r["duration_ms"] for r in rows)
        p = str(tmp_path / "metrics.jsonl")
        n = collector.to_json(p)
        assert n == len(collector.rows())
        import json as _json

        assert all(_json.loads(ln) for ln in open(p))
    finally:
        collector.stop()
