"""Auto-explode (array input) and per-map-key aggregation — reference
semantics from row/ColumnAggregator.scala:225-246 (VectorDispatcher) and
row/MapColumnAggregator.scala.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.operators.asof_join import asof_join

US = 1_000_000


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def events(spark):
    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("scores", T.ArrayType(T.DoubleType())),
            T.StructField("counters", T.MapType(T.StringType(), T.LongType())),
        ]
    )
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", t0 + dt.timedelta(hours=1), [1.0, 2.0], {"x": 1, "y": 2}),
        ("a", t0 + dt.timedelta(hours=2), [3.0], {"x": 10}),
        ("a", t0 + dt.timedelta(hours=3), None, None),
        ("a", t0 + dt.timedelta(hours=4), [], {"z": 5}),
    ]
    return _mk(spark, rows, schema)


@pytest.fixture(scope="module")
def left(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    return _mk(
        spark,
        [("a", t0 + dt.timedelta(hours=2, minutes=30)), ("a", t0 + dt.timedelta(hours=5))],
        T.StructType([T.StructField("k", T.StringType()), T.StructField("ts", T.TimestampType())]),
    )


def test_array_auto_explode_sum(spark, events, left):
    gb = GroupBy(keys=["k"], aggregations=[Aggregation("scores", Op.SUM, windows=("1d",))])
    out = asof_join(left, events, gb).orderBy("ts").collect()
    # q1 @2:30 sees rows @1h,@2h -> 1+2+3 = 6; q2 @5h sees all -> 6 (empty list adds nothing)
    assert out[0]["scores_sum_1d"] == pytest.approx(6.0)
    assert out[1]["scores_sum_1d"] == pytest.approx(6.0)


def test_array_auto_explode_count_and_avg(spark, events, left):
    gb = GroupBy(
        keys=["k"],
        aggregations=[
            Aggregation("scores", Op.COUNT, windows=("1d",)),
            Aggregation("scores", Op.AVERAGE, windows=("1d",)),
        ],
    )
    out = asof_join(left, events, gb).orderBy("ts").collect()
    assert out[0]["scores_count_1d"] == 3  # elements, not rows
    assert out[0]["scores_average_1d"] == pytest.approx(2.0)


def test_map_input_per_key_sum(spark, events, left):
    gb = GroupBy(keys=["k"], aggregations=[Aggregation("counters", Op.SUM, windows=("1d",))])
    out = asof_join(left, events, gb).orderBy("ts").collect()
    assert out[0]["counters_sum_1d"] == {"x": 11, "y": 2}
    assert out[1]["counters_sum_1d"] == {"x": 11, "y": 2, "z": 5}


def test_map_input_per_key_max_and_count(spark, events, left):
    gb = GroupBy(
        keys=["k"],
        aggregations=[
            Aggregation("counters", Op.MAX, windows=("1d",)),
            Aggregation("counters", Op.COUNT, windows=("1d",)),
        ],
    )
    out = asof_join(left, events, gb).orderBy("ts").collect()
    assert out[1]["counters_max_1d"] == {"x": 10, "y": 2, "z": 5}
    assert out[1]["counters_count_1d"] == {"x": 2, "y": 1, "z": 1}


def test_empty_window_map_is_null(spark, events):
    import datetime as dt

    early = _mk(
        spark,
        [("a", dt.datetime(2024, 1, 1, 0, 30))],
        T.StructType([T.StructField("k", T.StringType()), T.StructField("ts", T.TimestampType())]),
    )
    gb = GroupBy(keys=["k"], aggregations=[Aggregation("counters", Op.SUM, windows=("1d",))])
    out = asof_join(early, events, gb).collect()
    assert out[0]["counters_sum_1d"] is None
