"""Hypothesis fuzz of the serving fetch merge: RANDOM GroupBy specs (ops x
windows x k) must make batch-IR upload + fetch-time merge equal the offline
sawtooth backfill at every (key, ts) — the ConsistencyJob contract
(reference: spark/.../stats/ConsistencyJob.scala:96-154) extended from the
three fixed specs in test_upload_fetch.py to the random spec space.

The offline side (asof_join) is itself brute-force-verified (tests/oracle.py,
test_kernel_properties.py), so equality here transitively gates the entire
IR build + tail-hop + stream-merge path against the naive oracle."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.jobs.upload import build_batch_irs, fetch_features
from chronon_spark.operators.asof_join import asof_join
from chronon_spark.sources.synth import synth_queries, synth_transcripts
from tests.oracle import assert_frames_allclose

BATCH_END_US = pd.Timestamp("2024-01-20").value // 1000

# (column, ops that fit its type)
_NUMERIC = ["n_chars", "turn_idx"]
_ANY = ["text", "role", "tool", "n_chars"]
_WINDOWS = ["90m", "2h", "1d", "7d", "13d", None]

_numeric_op = st.sampled_from(
    [Op.COUNT, Op.SUM, Op.AVERAGE, Op.MIN, Op.MAX, Op.VARIANCE, Op.SKEW, Op.KURTOSIS]
)
_order_op = st.sampled_from([Op.FIRST, Op.LAST, Op.FIRST_K, Op.LAST_K])
_extreme_op = st.sampled_from([Op.TOP_K, Op.BOTTOM_K, Op.UNIQUE_TOP_K])
_set_op = st.sampled_from([Op.UNIQUE_COUNT, Op.APPROX_UNIQUE_COUNT])
_hist_op = st.sampled_from([Op.HISTOGRAM, Op.APPROX_FREQUENT_K, Op.APPROX_HEAVY_HITTERS_K])


@st.composite
def aggregation(draw):
    family = draw(st.sampled_from(["numeric", "order", "extreme", "set", "hist", "pct"]))
    w = draw(st.sampled_from(_WINDOWS))
    if family == "numeric":
        return Aggregation(draw(st.sampled_from(_NUMERIC)), draw(_numeric_op), windows=(w,))
    if family == "order":
        op = draw(_order_op)
        k = draw(st.integers(1, 4)) if op in (Op.FIRST_K, Op.LAST_K) else None
        return Aggregation(draw(st.sampled_from(_ANY)), op, windows=(w,), k=k)
    if family == "extreme":
        return Aggregation("n_chars", draw(_extreme_op), windows=(w,), k=draw(st.integers(1, 4)))
    if family == "set":
        return Aggregation(draw(st.sampled_from(_ANY)), draw(_set_op), windows=(w,))
    if family == "hist":
        op = draw(_hist_op)
        k = draw(st.integers(1, 3)) if op != Op.HISTOGRAM else draw(st.sampled_from([None, 2]))
        return Aggregation(draw(st.sampled_from(["tool", "role"])), op, windows=(w,), k=k)
    return Aggregation(
        "n_chars", Op.APPROX_PERCENTILE, windows=(w,), percentiles=(0.25, 0.5, 0.75)
    )


@pytest.fixture(scope="module")
def fuzz_data(spark):
    ev = synth_transcripts(n_rows=1500, n_convs=15)
    q = synth_queries(ev, n_queries=1200)
    lo = pd.Timestamp(BATCH_END_US, unit="us")
    q = q[(q["ts"] >= lo) & (q["ts"] < lo + pd.Timedelta(days=2))].reset_index(drop=True)
    assert len(q) > 20
    return spark.createDataFrame(ev).cache(), spark.createDataFrame(q).cache()


@given(
    aggs=st.lists(
        aggregation(),
        min_size=1,
        max_size=4,
        # output_name is {input}_{op}{k}_{window}: dedupe on that key so the
        # drawn spec never trips GroupBy's duplicate-output-column guard
        unique_by=lambda a: (a.input_column, a.op, a.k, a.windows),
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_fetch_matches_backfill_on_random_specs(spark, fuzz_data, aggs):
    events, queries = fuzz_data
    gb = GroupBy(keys=["conv_id"], aggregations=aggs, tie_breakers=["turn_idx"], sawtooth=True)
    irs = build_batch_irs(events, gb, BATCH_END_US)
    got = fetch_features(queries, irs, events, gb, BATCH_END_US).toPandas()
    want = asof_join(queries, events, gb).toPandas()
    assert_frames_allclose(got, want, sort_by=["query_id"])
