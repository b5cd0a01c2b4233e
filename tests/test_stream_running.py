"""Custom stateful streaming operator parity: per-event running lifetime
features via applyInPandasWithState must equal the batch as-of join's
unbounded-window features at every row — the fire-per-element contract
(reference flink/.../window/Trigger.scala AlwaysFireOnElementTrigger) under
the engine's strict ts' < ts semantics."""

from __future__ import annotations

import os

import pytest

from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.operators.asof_join import asof_join
from chronon_spark.sources.synth import synth_transcripts
from chronon_spark.streaming.groupby_stream import stream_running_features
from tests.oracle import assert_frames_allclose


def _gb():
    return GroupBy(
        keys=["conv_id"],
        aggregations=[
            Aggregation("turn_idx", Op.COUNT, windows=(None,)),
            Aggregation("n_chars", Op.SUM, windows=(None,)),
            Aggregation("n_chars", Op.AVERAGE, windows=(None,)),
            Aggregation("n_chars", Op.MIN, windows=(None,)),
            Aggregation("n_chars", Op.MAX, windows=(None,)),
        ],
        tie_breakers=["turn_idx"],
    )


@pytest.fixture(scope="module")
def data():
    return synth_transcripts(n_rows=2500, n_convs=25)


def _batch_expected(spark, ev):
    t = spark.createDataFrame(ev)
    return asof_join(t, t, _gb()).toPandas()


def _drain(sdf, name, timeout=300):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)


def _compare(spark, name, want):
    got = spark.table(name).toPandas()
    cols = [c for c in want.columns]
    assert_frames_allclose(got[cols], want, sort_by=["conv_id", "turn_idx"])


def test_single_batch_parity(spark, data, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("run_one"))
    spark.createDataFrame(data).write.parquet(f"{d}/all")
    schema = spark.read.parquet(f"{d}/all").schema
    stream = spark.readStream.schema(schema).option("recursiveFileLookup", "true").parquet(d)
    _drain(stream_running_features(stream, _gb()), "t_run_one")
    _compare(spark, "t_run_one", _batch_expected(spark, data))


def test_multi_batch_state_carries(spark, data, tmp_path_factory):
    """Time-split chunks arriving across separate stream runs (shared
    checkpoint): later batches must see earlier batches through the keyed
    state IR, never by rescanning old files."""
    d = str(tmp_path_factory.mktemp("run_many"))
    ckpt = str(tmp_path_factory.mktemp("run_many_ckpt"))
    days = data["ts"].dt.strftime("%Y-%m-%d")
    cuts = ["2024-01-11", "2024-01-21"]
    chunks = [
        data[days < cuts[0]],
        data[(days >= cuts[0]) & (days < cuts[1])],
        data[days >= cuts[1]],
    ]
    schema = spark.createDataFrame(data).schema
    sink = str(tmp_path_factory.mktemp("run_many_out"))
    for i, ch in enumerate(chunks):
        assert len(ch) > 0
        spark.createDataFrame(ch).write.parquet(f"{d}/f{i}")
        stream = (
            spark.readStream.schema(schema).option("recursiveFileLookup", "true").parquet(d)
        )
        q = (
            stream_running_features(stream, _gb())
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    got = spark.read.parquet(sink).toPandas()
    assert len(got) == len(data)
    want = _batch_expected(spark, data)
    from tests.oracle import assert_frames_allclose as afc

    afc(got[[c for c in want.columns]], want, sort_by=["conv_id", "turn_idx"])


def test_windowed_request_rejected(spark, data):
    gb = GroupBy(
        keys=["conv_id"],
        aggregations=[Aggregation("n_chars", Op.SUM, windows=("7d",))],
        tie_breakers=["turn_idx"],
    )
    df = spark.createDataFrame(data)
    with pytest.raises(ValueError, match="unbounded"):
        stream_running_features(df, gb)


def test_multi_chunk_arrow_batch_parity(spark, data, tmp_path_factory):
    """A micro-batch larger than arrow maxRecordsPerBatch reaches the state
    function as MULTIPLE non-time-ordered chunks; the operator must sort the
    whole batch before the prefix scan (chunk-local scans + state merge
    in between would leak later events into earlier rows)."""
    shuffled = data.sample(frac=1.0, random_state=7).reset_index(drop=True)
    d = str(tmp_path_factory.mktemp("run_chunks"))
    spark.createDataFrame(shuffled).coalesce(1).write.parquet(f"{d}/all")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "40")
    try:
        schema = spark.read.parquet(f"{d}/all").schema
        stream = spark.readStream.schema(schema).option("recursiveFileLookup", "true").parquet(d)
        _drain(stream_running_features(stream, _gb()), "t_run_chunks")
        _compare(spark, "t_run_chunks", _batch_expected(spark, data))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
