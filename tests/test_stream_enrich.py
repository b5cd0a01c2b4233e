"""Stream enrichment (JoinSource realtime, thrift/api.thrift:170-185 case #2):
a streaming left run through foreachBatch fetch must equal the offline
as-of backfill at every (key, ts) — the same ConsistencyJob contract the
batch fetcher is gated on."""

from __future__ import annotations

import pandas as pd
import pytest

from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.jobs.upload import build_batch_irs
from chronon_spark.operators.asof_join import asof_join
from chronon_spark.sources.synth import synth_queries, synth_transcripts
from chronon_spark.streaming.enrichment import enrich_stream
from tests.oracle import assert_frames_allclose

BATCH_END_US = pd.Timestamp("2024-01-20").value // 1000


def _gb():
    return GroupBy(
        keys=["conv_id"],
        aggregations=[
            Aggregation("turn_idx", Op.COUNT, windows=("13d",)),
            Aggregation("n_chars", Op.SUM, windows=("7d",)),
            Aggregation("n_chars", Op.MAX, windows=(None,)),
        ],
        tie_breakers=["turn_idx"],
        sawtooth=True,
    )


def test_stream_enrichment_matches_backfill(spark, tmp_path):
    ev = synth_transcripts(n_rows=2500, n_convs=25)
    q = synth_queries(ev, n_queries=2500)
    lo = pd.Timestamp(BATCH_END_US, unit="us")
    q = q[(q["ts"] >= lo) & (q["ts"] < lo + pd.Timedelta(days=2))].reset_index(drop=True)
    assert len(q) > 50

    src = str(tmp_path / "left_stream")
    spark.createDataFrame(q).write.parquet(src)
    left_stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)

    events = spark.createDataFrame(ev)
    gb = _gb()
    irs = build_batch_irs(events, gb, BATCH_END_US)

    out: list[pd.DataFrame] = []
    writer = enrich_stream(
        left_stream, gb, irs, events, BATCH_END_US, sink=lambda df, _e: out.append(df.toPandas())
    )
    query = writer.trigger(availableNow=True).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).start()
    query.awaitTermination(300)

    got = pd.concat(out, ignore_index=True)
    want = asof_join(spark.createDataFrame(q), events, gb).toPandas()
    assert len(got) == len(q)
    assert_frames_allclose(got, want, sort_by=["query_id"])


def test_enriched_stream_feeds_downstream_groupby(spark, tmp_path):
    """Features-over-features: the enriched micro-batches are a valid source
    for a second aggregation (the chained-join shape, GroupBy.scala:537-602)."""
    ev = synth_transcripts(n_rows=1500, n_convs=10)
    q = synth_queries(ev, n_queries=1500)
    lo = pd.Timestamp(BATCH_END_US, unit="us")
    q = q[(q["ts"] >= lo) & (q["ts"] < lo + pd.Timedelta(days=2))].reset_index(drop=True)
    assert len(q) > 20

    src = str(tmp_path / "left_stream")
    spark.createDataFrame(q).write.parquet(src)
    left_stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)

    events = spark.createDataFrame(ev)
    gb = _gb()
    irs = build_batch_irs(events, gb, BATCH_END_US)

    sums: list[pd.DataFrame] = []

    def downstream(df, _e):
        sums.append(df.groupBy("conv_id").sum("turn_idx_count_13d").toPandas())

    writer = enrich_stream(left_stream, gb, irs, events, BATCH_END_US, sink=downstream)
    writer.trigger(availableNow=True).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).start().awaitTermination(300)

    got = (
        pd.concat(sums, ignore_index=True)
        .groupby("conv_id", as_index=False)
        .sum()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    want_full = asof_join(spark.createDataFrame(q), events, gb).toPandas()
    want = (
        want_full.groupby("conv_id", as_index=False)["turn_idx_count_13d"]
        .sum()
        .rename(columns={"turn_idx_count_13d": "sum(turn_idx_count_13d)"})
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_enrichment_threads_tail_buffer(spark, tmp_path):
    """IRs built with a wider tail buffer stay fetchable past the default 2d
    valid range — enrich_stream must thread tail_buffer_ms through to the
    fetch's range check, or a long-running stream hard-fails at
    batchEnd + 2d even when the tail hops cover the query."""
    ev = synth_transcripts(n_rows=2000, n_convs=10)
    q = synth_queries(ev, n_queries=2000)
    lo = pd.Timestamp(BATCH_END_US, unit="us")
    # queries in day 3 past batchEnd: beyond the DEFAULT buffer, inside 4d
    q = q[(q["ts"] >= lo + pd.Timedelta(days=2, hours=1)) & (q["ts"] < lo + pd.Timedelta(days=4))]
    q = q.reset_index(drop=True)
    assert len(q) > 5

    src = str(tmp_path / "left_stream")
    spark.createDataFrame(q).write.parquet(src)
    left_stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)

    events = spark.createDataFrame(ev)
    gb = _gb()
    buf = 4 * 86_400_000
    irs = build_batch_irs(events, gb, BATCH_END_US, tail_buffer_ms=buf)

    out: list[pd.DataFrame] = []
    writer = enrich_stream(
        left_stream,
        gb,
        irs,
        events,
        BATCH_END_US,
        sink=lambda df, _e: out.append(df.toPandas()),
        tail_buffer_ms=buf,
    )
    writer.trigger(availableNow=True).option(
        "checkpointLocation", str(tmp_path / "ckpt")
    ).start().awaitTermination(300)

    got = pd.concat(out, ignore_index=True)
    want = asof_join(spark.createDataFrame(q), events, gb).toPandas()
    assert len(got) == len(q)
    assert_frames_allclose(got, want, sort_by=["query_id"])
