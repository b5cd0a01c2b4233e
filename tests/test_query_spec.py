"""Query spec (selects/wheres/setups) — reference thrift/api.thrift:10-61."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from chronon_spark.query import Query
from chronon_spark.sources.synth import synth_transcripts


def test_selects_wheres(spark):
    ev = synth_transcripts(n_rows=500, n_convs=5)
    df = spark.createDataFrame(ev)
    q = Query(
        selects={"conv_id": "conv_id", "len2": "n_chars * 2", "ts": "ts"},
        wheres=["role = 'user'", "n_chars IS NOT NULL"],
    )
    out = q.apply(df).toPandas()
    want = ev[(ev.role == "user") & ev.n_chars.notna()]
    assert len(out) == len(want)
    assert set(out.columns) == {"conv_id", "len2", "ts"}
    assert sorted(out["len2"]) == sorted(want["n_chars"] * 2)


def test_setups_register_sql_udf(spark):
    """setups run arbitrary session SQL before evaluation — the reference's
    UDF-registration hook (GroupBy.scala:876). Spark 4 SQL scalar functions."""
    ev = synth_transcripts(n_rows=200, n_convs=4)
    df = spark.createDataFrame(ev)
    q = Query(
        selects={"conv_id": "conv_id", "t2": "double_turn(turn_idx)"},
        setups=[
            "CREATE OR REPLACE TEMPORARY FUNCTION double_turn(x INT) RETURNS INT RETURN x * 2"
        ],
    )
    out = q.apply(df).toPandas()
    assert (out["t2"] == ev["turn_idx"] * 2).all()


def test_where_pushes_to_scan(spark, tmp_path):
    ev = synth_transcripts(n_rows=500, n_convs=5)
    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(ev).write.parquet(path)
    q = Query(selects={"conv_id": "conv_id"}, wheres=["role = 'user'"])
    out = q.apply(spark.read.parquet(path))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # predicate reaches the scan; projection prunes to the two needed columns
    assert "PushedFilters" in plan and "EqualTo(role,user)" in plan, plan
    assert "n_chars" not in plan.split("ReadSchema")[1].splitlines()[0], plan
