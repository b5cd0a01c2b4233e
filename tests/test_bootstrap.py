"""Bootstrap semantics: covered rows skip computation (and keep the bootstrap
values verbatim); partial bootstraps win column-wise via coalesce."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.operators.asof_join import asof_join
from chronon_spark.operators.bootstrap import bootstrap_asof_join
from chronon_spark.sources.synth import synth_transcripts

GB = GroupBy(
    keys=["conv_id"],
    aggregations=[
        Aggregation("turn_idx", Op.COUNT, windows=("2d",)),
        Aggregation("n_chars", Op.SUM, windows=("2d",)),
    ],
    tie_breakers=["turn_idx"],
)
ROW_KEYS = ["conv_id", "turn_idx"]


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(synth_transcripts(n_rows=3000, n_convs=25)).cache()


@pytest.fixture(scope="module")
def left(tdf):
    return tdf.where(F.col("role") == "user").select("conv_id", "turn_idx", "ts")


def test_full_bootstrap_values_win(spark, tdf, left):
    # bootstrap half the rows with SENTINEL values — they must pass through
    # untouched (proving those rows never hit the aggregation path)
    bs = (
        left.where(F.col("turn_idx") % 2 == 0)
        .select(
            "conv_id",
            "turn_idx",
            F.lit(777).cast("long").alias("turn_idx_count_2d"),
            F.lit(-1.5).alias("n_chars_sum_2d"),
        )
    )
    out = bootstrap_asof_join(left, tdf, GB, bs, ROW_KEYS).toPandas()
    plain = asof_join(left, tdf, GB).toPandas()
    assert len(out) == len(plain)
    even = out[out.turn_idx % 2 == 0]
    assert (even["turn_idx_count_2d"] == 777).all()
    assert (even["n_chars_sum_2d"] == -1.5).all()
    # uncovered rows equal the plain computation
    odd = out[out.turn_idx % 2 == 1].sort_values(ROW_KEYS).reset_index(drop=True)
    podd = plain[plain.turn_idx % 2 == 1].sort_values(ROW_KEYS).reset_index(drop=True)
    for c in ("turn_idx_count_2d", "n_chars_sum_2d"):
        ok = (odd[c].isna() & podd[c].isna()) | (odd[c] == podd[c])
        assert ok.all()


def test_partial_bootstrap_coalesces_columnwise(spark, tdf, left):
    # bootstrap covers only the count column -> sum must still be computed
    bs = left.where(F.col("turn_idx") % 3 == 0).select(
        "conv_id", "turn_idx", F.lit(999).cast("long").alias("turn_idx_count_2d")
    )
    out = bootstrap_asof_join(left, tdf, GB, bs, ROW_KEYS).toPandas()
    plain = asof_join(left, tdf, GB).toPandas()
    m = out.merge(plain, on=ROW_KEYS, suffixes=("", "_plain"))
    cov = m[m.turn_idx % 3 == 0]
    assert (cov["turn_idx_count_2d"] == 999).all()
    ok = (cov["n_chars_sum_2d"].isna() & cov["n_chars_sum_2d_plain"].isna()) | (
        cov["n_chars_sum_2d"] == cov["n_chars_sum_2d_plain"]
    )
    assert ok.all()


def test_no_matching_bootstrap_columns_is_passthrough(spark, tdf, left):
    bs = left.select("conv_id", "turn_idx", F.lit(1).alias("unrelated"))
    out = bootstrap_asof_join(left, tdf, GB, bs, ROW_KEYS).toPandas()
    plain = asof_join(left, tdf, GB).toPandas()
    assert len(out) == len(plain)
