"""skew_split_asof_join == asof_join on hot-keyed data.

The split must be invisible: same rows, same features, one output row per
left row — only the physical routing (salted slices for hot keys) differs.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.operators.asof_join import asof_join
from chronon_spark.operators.slicing import skew_split_asof_join
from chronon_spark.sources.synth import synth_queries, synth_transcripts


@pytest.fixture(scope="module")
def data(spark):
    ev = synth_transcripts(n_rows=24_000, n_convs=60, n_hot=2, hot_key_frac=0.5)
    q = synth_queries(ev, n_queries=3_000)
    return spark.createDataFrame(ev), spark.createDataFrame(q.drop(columns=["ds"]))


GB = GroupBy(
    keys=["conv_id"],
    aggregations=[
        Aggregation("turn_idx", Op.COUNT, windows=("7d", "1h")),
        Aggregation("n_chars", Op.SUM, windows=("7d",)),
        Aggregation("text", Op.LAST_K, windows=("2d",), k=3),
        Aggregation("role", Op.LAST, windows=("1d",)),
    ],
    tie_breakers=["turn_idx"],
)


def _canon(df):
    pdf = df.toPandas()
    list_cols = [c for c in pdf.columns if pdf[c].map(lambda v: isinstance(v, list)).any()]
    for c in list_cols:
        pdf[c] = pdf[c].map(lambda v: None if v is None else tuple(v))
    return pdf.sort_values(["query_id"]).reset_index(drop=True)


def test_skew_split_matches_plain(data):
    left, ev = data[1], data[0]
    plain = _canon(asof_join(left, ev, GB))
    # threshold low enough that the synthetic hot keys actually split
    split = _canon(skew_split_asof_join(left, ev, GB, hot_threshold=2_000))
    pd.testing.assert_frame_equal(plain, split, check_dtype=False)


def test_no_hot_keys_is_plain_plan(data):
    left, ev = data[1], data[0]
    out = skew_split_asof_join(left, ev, GB, hot_threshold=10**9)
    # fallback: no union in the plan
    assert "Union" not in out._jdf.queryExecution().executedPlan().toString()
    assert out.count() == left.count()


def test_cardinality_with_null_keys(data, spark):
    left, ev = data[1], data[0]
    with_null = left.unionByName(
        left.limit(5).withColumn("conv_id", F.lit(None).cast("string"))
    )
    out = skew_split_asof_join(with_null, ev, GB, hot_threshold=2_000)
    assert out.count() == with_null.count()
    nulls = out.where(F.col("conv_id").isNull())
    assert nulls.count() == 5
    assert nulls.where(F.col("turn_idx_count_7d").isNotNull()).count() == 0


def test_unbounded_window_falls_back(data):
    left, ev = data[1], data[0]
    gb = GroupBy(
        keys=["conv_id"],
        aggregations=[Aggregation("turn_idx", Op.COUNT)],
        tie_breakers=["turn_idx"],
    )
    out = skew_split_asof_join(left, ev, gb, hot_threshold=2_000)
    assert "Union" not in out._jdf.queryExecution().executedPlan().toString()
    assert out.count() == left.count()
