"""Multi-source GroupBy input (reference GroupBy.scala:613-628): per-source
Query rendering + union aligned by the first source's columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chronon_spark.query import Query
from chronon_spark.sources.multi import union_sources
from chronon_spark.sources.synth import synth_transcripts


@pytest.fixture(scope="module")
def data(spark):
    return spark.createDataFrame(synth_transcripts(n_rows=1000, n_convs=10))


def test_union_realigns_columns(spark, data):
    a = data.where(F.col("role") == "user").select("conv_id", "turn_idx", "ts")
    b = data.where(F.col("role") != "user").select("ts", "turn_idx", "conv_id")  # shuffled order
    out = union_sources([a, b])
    assert out.columns == ["conv_id", "turn_idx", "ts"]
    assert out.count() == data.count()
    # values landed in the right columns despite the differing source order
    assert out.select(F.max("turn_idx")).first()[0] == data.select(F.max("turn_idx")).first()[0]


def test_union_applies_per_source_queries(spark, data):
    a = data.select("conv_id", "turn_idx")
    b = data.select(F.col("conv_id").alias("cid"), "turn_idx")
    out = union_sources(
        [a, b], [Query(wheres=["turn_idx < 5"]), Query(selects={"conv_id": "cid", "turn_idx": "turn_idx"}, wheres=["turn_idx >= 5"])]
    )
    assert out.count() == data.count()


def test_union_missing_column_raises(spark, data):
    a = data.select("conv_id", "turn_idx", "ts")
    b = data.select("conv_id", "turn_idx")
    with pytest.raises(ValueError, match="missing columns \\['ts'\\]"):
        union_sources([a, b])


def test_union_plan_has_no_shuffle(spark, data):
    import contextlib
    import io

    a = data.where(F.col("role") == "user").select("conv_id", "turn_idx", "ts")
    b = data.where(F.col("role") != "user").select("conv_id", "turn_idx", "ts")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        union_sources([a, b]).explain("formatted")
    assert "Exchange" not in buf.getvalue()
