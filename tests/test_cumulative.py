"""Cumulative (snapshot-accumulating) event sources: the scan collapses to
the single latest partition (reference GroupBy.scala:758-765) and downstream
features are identical to running over the raw stream."""

from __future__ import annotations

import contextlib
import io

import pytest

from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.operators.asof_join import asof_join
from chronon_spark.sources.cumulative import build_cumulative, latest_partition, scan_cumulative_events
from chronon_spark.sources.synth import synth_queries, synth_transcripts
from tests.oracle import assert_frames_allclose


@pytest.fixture(scope="module")
def cumulative(spark, tmp_path_factory):
    ev = synth_transcripts(n_rows=2000, n_convs=20)
    raw = spark.createDataFrame(ev.drop(columns=["ds"]))
    path = str(tmp_path_factory.mktemp("cum") / "cumulative")
    build_cumulative(raw).write.mode("overwrite").partitionBy("ds").parquet(path)
    return ev, raw, spark.read.parquet(path)


def test_scan_picks_latest_partition_only(spark, cumulative):
    ev, raw, cum = cumulative
    sliced, chosen = scan_cumulative_events(cum)
    # partitionBy round-trip types ds as DATE; compare canonical strings
    assert str(chosen) == max(ev["ts"].dt.strftime("%Y-%m-%d"))
    # the latest partition IS the full raw history
    assert sliced.count() == raw.count()
    # and every other partition is pruned at the scan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sliced.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and str(chosen) in plan, plan


def test_end_partition_bound(spark, cumulative):
    ev, raw, cum = cumulative
    days = sorted(ev["ts"].dt.strftime("%Y-%m-%d").unique())
    mid = days[len(days) // 2]
    sliced, chosen = scan_cumulative_events(cum, end_partition=mid)
    assert str(chosen) == mid
    want = (ev["ts"].dt.strftime("%Y-%m-%d") <= mid).sum()
    assert sliced.count() == want
    assert latest_partition(cum, end_partition="1900-01-01") is None


def test_features_over_cumulative_match_raw(spark, cumulative):
    ev, raw, cum = cumulative
    q = synth_queries(ev, n_queries=120)
    left = spark.createDataFrame(q)
    gb = GroupBy(
        keys=["conv_id"],
        aggregations=[
            Aggregation("turn_idx", Op.COUNT, windows=("7d",)),
            Aggregation("n_chars", Op.SUM, windows=("2d",)),
        ],
        tie_breakers=["turn_idx"],
    )
    sliced, _ = scan_cumulative_events(cum)
    got = asof_join(left, sliced.drop("ds"), gb).toPandas()
    want = asof_join(left, raw, gb).toPandas()
    assert_frames_allclose(got, want, sort_by=["query_id"])
