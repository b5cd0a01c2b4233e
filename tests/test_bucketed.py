"""Co-located (storage-bucketed) as-of join: zero exchanges in the plan,
values identical to the shuffled path, and the co-location contract is
enforced (mismatched bucket specs raise)."""

from __future__ import annotations

import pytest

from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.operators.asof_join import asof_join
from chronon_spark.sources.bucketed import (
    asof_join_co_located,
    table_bucket_spec,
    write_bucketed,
)
from chronon_spark.sources.synth import synth_queries, synth_transcripts


def _gb():
    return GroupBy(
        keys=["conv_id"],
        aggregations=[
            Aggregation("turn_idx", Op.COUNT, windows=("7d", "1h")),
            Aggregation("n_chars", Op.SUM, windows=("7d",)),
            Aggregation("text", Op.LAST_K, windows=("2d",), k=3),
        ],
        tie_breakers=["turn_idx"],
    )


@pytest.fixture(scope="module")
def tables(spark):
    ev = synth_transcripts(n_rows=6000, n_convs=60)
    q = synth_queries(ev, n_queries=500).head(500)
    write_bucketed(spark.createDataFrame(ev), "ev_bkt", ["conv_id"], 8, ["conv_id", "ts"])
    write_bucketed(spark.createDataFrame(q), "q_bkt", ["conv_id"], 8, ["conv_id", "ts"])
    yield ev, q
    for t in ("ev_bkt", "q_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucket_spec_roundtrip(spark, tables):
    spec = table_bucket_spec(spark, "ev_bkt")
    assert spec is not None and spec.keys == ("conv_id",) and spec.num_buckets == 8


def test_zero_exchanges(spark, tables):
    out = asof_join_co_located(spark, "q_bkt", "ev_bkt", _gb())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan


def test_values_match_shuffled_path(spark, tables):
    ev, q = tables
    got = asof_join_co_located(spark, "q_bkt", "ev_bkt", _gb()).toPandas()
    want = asof_join(spark.createDataFrame(q), spark.createDataFrame(ev), _gb()).toPandas()
    key = ["query_id"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)[got.columns]
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype == object:
            assert a.astype(str).equals(b.astype(str)), c
        else:
            assert (a.fillna(-1) == b.fillna(-1)).all(), c


def test_mismatched_buckets_raise(spark, tables):
    ev, _ = tables
    write_bucketed(spark.createDataFrame(ev), "ev_bkt4", ["conv_id"], 4, ["conv_id", "ts"])
    try:
        with pytest.raises(ValueError, match="bucket counts differ"):
            asof_join_co_located(spark, "q_bkt", "ev_bkt4", _gb())
        with pytest.raises(ValueError, match="must be bucketed"):
            spark.createDataFrame(ev).write.mode("overwrite").saveAsTable("ev_flat")
            asof_join_co_located(spark, "q_bkt", "ev_flat", _gb())
    finally:
        for t in ("ev_bkt4", "ev_flat"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
