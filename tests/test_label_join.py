"""Forward-window label join: boundary + element-order semantics.

Window contract (mirror of the as-of `[ts-w, ts)`): labels with
ts' in (ts, ts + w] — strictly after the decision time, inclusive horizon.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.operators.label_join import label_join

US = 1_000_000


def _ts_df(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return df.withColumn("ts", F.timestamp_micros(F.col("tus")))


@pytest.fixture(scope="module")
def frames(spark):
    left = _ts_df(spark, [("c1", 1000 * US), ("c1", 2000 * US)], "conv_id string, tus long")
    labels = _ts_df(
        spark,
        [
            ("c1", 1000 * US, 0, "at_decision"),  # excluded: not strictly after
            ("c1", 1001 * US, 1, "first"),
            ("c1", 1002 * US, 2, "second"),
            ("c1", 1010 * US, 3, "at_horizon"),  # included: inclusive horizon
            ("c1", 1011 * US, 4, "past_horizon"),  # excluded
        ],
        "conv_id string, tus long, turn_idx int, text string",
    )
    return left, labels


def test_boundaries_and_order(frames):
    left, labels = frames
    gb = GroupBy(
        keys=["conv_id"],
        aggregations=[
            Aggregation("text", Op.COUNT, windows=("10s",)),
            Aggregation("text", Op.FIRST, windows=("10s",)),
            Aggregation("text", Op.LAST, windows=("10s",)),
            Aggregation("text", Op.FIRST_K, windows=("10s",), k=2),
            Aggregation("text", Op.LAST_K, windows=("10s",), k=2),
        ],
        tie_breakers=["turn_idx"],
    )
    out = {r["tus"]: r for r in label_join(left, labels, gb).collect()}
    r = out[1000 * US]
    assert r["text_count_10s"] == 3  # 1001, 1002, 1010
    assert r["text_first_10s"] == "first"
    assert r["text_last_10s"] == "at_horizon"
    assert r["text_first_k2_10s"] == ["first", "second"]  # earliest-first
    assert r["text_last_k2_10s"] == ["at_horizon", "second"]  # latest-first
    r2 = out[2000 * US]
    assert r2["text_count_10s"] is None  # empty window => NULL


def test_tie_breaker_order_within_equal_ts(spark):
    left = _ts_df(spark, [("c1", 100 * US)], "conv_id string, tus long")
    labels = _ts_df(
        spark,
        [("c1", 101 * US, 2, "b"), ("c1", 101 * US, 1, "a"), ("c1", 102 * US, 3, "c")],
        "conv_id string, tus long, turn_idx int, text string",
    )
    gb = GroupBy(
        keys=["conv_id"],
        aggregations=[Aggregation("text", Op.FIRST_K, windows=("10s",), k=3)],
        tie_breakers=["turn_idx"],
    )
    row = label_join(left, labels, gb).collect()[0]
    assert row["text_first_k3_10s"] == ["a", "b", "c"]


def test_non_numeric_tie_breaker_rejected(frames):
    left, labels = frames
    gb = GroupBy(
        keys=["conv_id"],
        aggregations=[Aggregation("text", Op.FIRST, windows=("10s",))],
        tie_breakers=["text"],
    )
    with pytest.raises(ValueError, match="numeric"):
        label_join(left, labels, gb)
