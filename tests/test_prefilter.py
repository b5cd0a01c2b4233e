"""Semi-join pushdown of left keys into the right scan.

Reference: small-mode IN-list injection (JoinUtils.injectKeyFilter,
spark/.../JoinUtils.scala:234-285, cutoff catalog/TableUtils.scala:54-57) and
the bloom-filter pushdown (Join.scala:268-285) — ours are literal IN predicates
(reaching the parquet scan as PushedFilters) and a broadcast left-semi join.

Checks: (1) results identical with and without each prefilter mode;
(2) the IN predicate actually reaches the parquet scan; (3) the semi mode
plans a broadcast join, not a shuffle."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.operators.asof_join import asof_join, prefilter_right_keys
from chronon_spark.sources.synth import synth_queries, synth_transcripts
from tests.oracle import assert_frames_allclose


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def parquet_events(spark, tmp_path_factory):
    ev = synth_transcripts(n_rows=3000, n_convs=30)
    path = str(tmp_path_factory.mktemp("prefilter") / "transcripts.parquet")
    spark.createDataFrame(ev).write.mode("overwrite").parquet(path)
    return ev, spark.read.parquet(path)


def _gb():
    return GroupBy(
        keys=["conv_id"],
        aggregations=[
            Aggregation("turn_idx", Op.COUNT, windows=("7d",)),
            Aggregation("n_chars", Op.SUM, windows=("2d",)),
        ],
        tie_breakers=["turn_idx"],
    )


def test_prefilter_modes_match_unfiltered(spark, parquet_events):
    ev, right = parquet_events
    q = synth_queries(ev, n_queries=150)
    # restrict the left to a subset of keys so the prefilter has bite
    keep = sorted(ev["conv_id"].unique())[:7]
    q = q[q["conv_id"].isin(keep)].reset_index(drop=True)
    left = spark.createDataFrame(q)

    base = asof_join(left, right, _gb()).toPandas()
    for mode in ("in", "semi", "auto"):
        got = asof_join(left, right, _gb(), prefilter=mode).toPandas()
        assert_frames_allclose(got, base, sort_by=["query_id"])


def test_in_mode_reaches_parquet_scan(spark, parquet_events):
    ev, right = parquet_events
    keep = sorted(ev["conv_id"].unique())[:5]
    filtered = prefilter_right_keys(
        spark.createDataFrame(ev[ev["conv_id"].isin(keep)][["conv_id"]].drop_duplicates()),
        right,
        {"conv_id": "conv_id"},
        mode="in",
    )
    plan = _plan(filtered)
    assert "PushedFilters" in plan and "In(conv_id" in plan, plan


def test_semi_mode_is_broadcast(spark, parquet_events):
    ev, right = parquet_events
    keys = spark.createDataFrame(ev[["conv_id"]].drop_duplicates())
    filtered = prefilter_right_keys(keys, right, {"conv_id": "conv_id"}, mode="semi")
    plan = _plan(filtered)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_in_mode_overflow_raises(spark, parquet_events):
    ev, right = parquet_events
    keys = spark.createDataFrame(ev[["conv_id"]].drop_duplicates())
    with pytest.raises(ValueError, match="distinct keys"):
        prefilter_right_keys(keys, right, {"conv_id": "conv_id"}, mode="in", small_limit=3)


def test_prefilter_on_scale_strategies(spark):
    """prefilter (semi-join / IN-list pushdown) is semantics-neutral on the
    tiled, sliced, and skew strategies too."""
    from chronon_spark.operators.slicing import skew_split_asof_join, sliced_asof_join
    from chronon_spark.operators.tiles import tiled_sawtooth_asof_join
    from chronon_spark.sources.synth import synth_transcripts

    pdf = synth_transcripts(n_rows=4000, n_convs=25)
    t = spark.createDataFrame(pdf)
    gb = GroupBy(
        keys=["conv_id"],
        aggregations=[
            Aggregation("turn_idx", Op.COUNT, windows=("13d",)),
            Aggregation("n_chars", Op.SUM, windows=("2d",)),
        ],
        tie_breakers=["turn_idx"],
        sawtooth=True,
    )
    # a left touching only a few keys — exactly when pushdown matters
    left = t.where(F.col("conv_id").isin("conv_1", "conv_2", "conv_3")).select(
        "conv_id", "turn_idx", "ts"
    )
    feats = [p.output_name for p in gb.parts()]

    def collect(df):
        return (
            df.select("conv_id", "turn_idx", *feats)
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )

    for fn in (tiled_sawtooth_asof_join, sliced_asof_join, skew_split_asof_join):
        base = collect(fn(left, t, gb))
        filt = collect(fn(left, t, gb, prefilter="in"))
        assert base.equals(filt), fn.__name__
