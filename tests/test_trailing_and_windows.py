"""Trailing JVM fast path must agree with the Arrow kernel engine; session /
lag / tumbling / hopping operators vs independent pandas recomputation."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.operators.asof_join import asof_join
from chronon_spark.operators.trailing import trailing_features
from chronon_spark.operators.windows import hopping_window_agg, lag_lead, sessionize, tumbling_window_agg
from chronon_spark.sources.synth import synth_transcripts
from tests.oracle import assert_frames_allclose


def _ev(spark, n=3000, convs=30):
    pdf = synth_transcripts(n_rows=n, n_convs=convs)
    return pdf, spark.createDataFrame(pdf)


def test_trailing_matches_asof_engine(spark):
    """Same GroupBy through the native-window path and the kernel path."""
    pdf, sdf = _ev(spark)
    gb = GroupBy(
        keys=["conv_id"],
        aggregations=[
            Aggregation("n_chars", Op.COUNT, windows=("1d",)),
            Aggregation("n_chars", Op.SUM, windows=("1d",)),
            Aggregation("n_chars", Op.AVERAGE, windows=("6h",)),
            Aggregation("n_chars", Op.MIN, windows=("1d",)),
            Aggregation("n_chars", Op.MAX, windows=("1d",)),
            Aggregation("n_chars", Op.VARIANCE, windows=("3d",)),
            Aggregation("role", Op.UNIQUE_COUNT, windows=("1d",)),
            Aggregation("text", Op.LAST_K, windows=("1d",), k=3),
            Aggregation("text", Op.FIRST, windows=("1d",)),
            Aggregation("text", Op.LAST, windows=("1d",)),
        ],
        tie_breakers=["turn_idx"],
    )
    fast = trailing_features(sdf, gb).toPandas()
    slow = asof_join(sdf, sdf, gb).toPandas()
    key = ["conv_id", "turn_idx"]
    assert_frames_allclose(fast, slow, sort_by=key)


def test_sessionize(spark):
    pdf, sdf = _ev(spark)
    got = sessionize(sdf, ["conv_id"], gap="30m", tie_breakers=["turn_idx"]).toPandas()
    # independent pandas recomputation
    p = pdf.sort_values(["conv_id", "ts", "turn_idx"], kind="stable").copy()
    gap = pd.Timedelta(minutes=30)
    new = (p.groupby("conv_id")["ts"].diff() >= gap) | p.groupby("conv_id")["ts"].diff().isna()
    p["session_id"] = new.astype(int).groupby(p["conv_id"]).cumsum() - 1
    assert_frames_allclose(got, p, sort_by=["conv_id", "turn_idx"])
    # session invariants
    g = got.sort_values(["conv_id", "ts", "turn_idx"])
    assert (g.groupby("conv_id")["session_id"].diff().dropna() >= 0).all()
    assert (g.groupby("conv_id")["session_id"].first() == 0).all()


def test_lag_lead(spark):
    pdf, sdf = _ev(spark)
    got = lag_lead(sdf, ["conv_id"], {"text": 1, "ts": 2}, tie_breakers=["turn_idx"]).toPandas()
    p = pdf.sort_values(["conv_id", "ts", "turn_idx"], kind="stable").copy()
    p["text_lag1"] = p.groupby("conv_id")["text"].shift(1)
    p["text_lead1"] = p.groupby("conv_id")["text"].shift(-1)
    p["ts_lag2"] = p.groupby("conv_id")["ts"].shift(2)
    p["ts_lead2"] = p.groupby("conv_id")["ts"].shift(-2)
    assert_frames_allclose(got, p, sort_by=["conv_id", "turn_idx"])


def test_tumbling(spark):
    pdf, sdf = _ev(spark)
    got = tumbling_window_agg(
        sdf, ["conv_id"], "1h", {"n": F.count("*"), "chars": F.sum("n_chars")}
    ).toPandas()
    p = pdf.copy()
    p["window_start"] = p["ts"].dt.floor("1h")
    want = (
        p.groupby(["conv_id", "window_start"])
        .agg(n=("turn_idx", "size"), chars=("n_chars", lambda s: s.sum(min_count=1)))
        .reset_index()
    )
    assert_frames_allclose(got, want, sort_by=["conv_id", "window_start"])


def test_hopping(spark):
    pdf, sdf = _ev(spark)
    got = hopping_window_agg(sdf, ["conv_id"], size="1h", hop="15m", aggs={"n": F.count("*")}).toPandas()
    # every event lands in exactly 4 windows
    assert got["n"].sum() == 4 * len(pdf)
    # independent check for one conv: window [start, start+1h) counts
    c = pdf["conv_id"].iloc[0]
    sub = pdf[pdf["conv_id"] == c]
    sub_w = got[got["conv_id"] == c]
    for _, r in sub_w.head(20).iterrows():
        n = ((sub["ts"] >= r["window_start"]) & (sub["ts"] < r["window_end"])).sum()
        assert n == r["n"], (r["window_start"], n, r["n"])
    # windows label alignment: start is hop-aligned
    us = got["window_start"].astype("int64") // 1000
    assert (us % (15 * 60_000_000) == 0).all()
