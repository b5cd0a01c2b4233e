"""Compiled-conf loader: the reference's Thrift-serialized GroupBy/Join JSON
(canary fixtures at api/src/test/resources/canary/compiled/) must parse into
api objects and backfill end-to-end — drop-in conf-repo compatibility."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from chronon_spark.api import Accuracy, Op
from chronon_spark.confs import (
    LoadedJoin,
    backfill_join_conf,
    load_conf,
    parse_aggregation,
    window_spec,
)

CANARY = "/root/reference/api/src/test/resources/canary/compiled"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(CANARY), reason="reference canary confs not present"
)


def test_window_and_argmap_mapping():
    assert window_spec({"length": 3, "timeUnit": 1}) == "3d"
    assert window_spec({"length": 2, "timeUnit": 0}) == "2h"
    assert window_spec({"length": 30, "timeUnit": 2}) == "30m"
    assert window_spec(None) is None
    a = parse_aggregation(
        {"inputColumn": "x", "operation": 12, "argMap": {"percentiles": "[0.25, 0.75]"}}
    )
    assert a.op is Op.APPROX_PERCENTILE and a.percentiles == (0.25, 0.75)
    b = parse_aggregation({"inputColumn": "x", "operation": 13, "argMap": {"k": "10"}})
    assert b.op is Op.LAST_K and b.k == 10 and b.windows[0].spec is None


@needs_reference
def test_parse_canary_group_by():
    lg = load_conf(f"{CANARY}/group_bys/gcp/purchases.v1_dev")
    gb = lg.group_by
    assert lg.name == "gcp.purchases.v1_dev"
    assert gb.keys == ["user_id"]
    assert {a.op for a in gb.aggregations} == {Op.SUM, Op.COUNT, Op.AVERAGE, Op.LAST_K}
    windowed = [a for a in gb.aggregations if a.op is Op.SUM][0]
    assert [w.spec for w in windowed.windows] == ["3d", "14d", "30d"]
    assert lg.sources[0].table == "data.purchases"
    assert lg.sources[0].query.selects == {
        "user_id": "user_id",
        "purchase_price": "purchase_price",
    }


@needs_reference
def test_parse_canary_join():
    lj = load_conf(f"{CANARY}/joins/gcp/training_set.v1_test")
    assert isinstance(lj, LoadedJoin)
    assert lj.left.table == "data.checkouts"
    (lg, prefix, km), = lj.parts
    assert lg.name == "gcp.purchases.v1_test"
    assert lg.group_by.keys == ["user_id"]


def _tables(spark):
    t0 = dt.datetime(2024, 1, 10)
    purchases = spark.createDataFrame(
        [
            (u, float(p), t0 + dt.timedelta(hours=h))
            for u, p, h in [
                ("u1", 10.0, -120), ("u1", 20.0, -30), ("u1", 40.0, -4),
                ("u2", 5.0, -100), ("u2", 7.0, -1),
            ]
        ],
        "user_id string, purchase_price double, ts timestamp",
    )
    checkouts = spark.createDataFrame(
        [("u1", t0), ("u2", t0), ("u3", t0)],
        "user_id string, ts timestamp",
    )
    return {"data.purchases": purchases, "data.checkouts": checkouts}


@needs_reference
def test_backfill_canary_join_end_to_end(spark):
    out = backfill_join_conf(
        spark, f"{CANARY}/joins/gcp/training_set.v1_test", _tables(spark)
    ).toPandas()
    got = out.set_index("user_id")
    # u1: purchases at -120h/-30h/-4h before the t0 checkout
    assert got.loc["u1", "purchase_price_sum_3d"] == 60.0  # -30h and -4h
    assert got.loc["u1", "purchase_price_sum_14d"] == 70.0
    assert got.loc["u1", "purchase_price_count_30d"] == 3
    assert got.loc["u1", "purchase_price_average_3d"] == 30.0
    assert got.loc["u2", "purchase_price_sum_3d"] == 7.0  # -100h outside 3d
    # u3 never purchased: empty-window NULL, but the left row survives
    assert "u3" in got.index and got.loc["u3", ["purchase_price_sum_3d"]].isna().all()
    # LAST_K(10) unbounded: most-recent-first
    assert list(got.loc["u1", "purchase_price_last_k10"]) == [40.0, 20.0, 10.0]


def test_inline_conf_accuracy_keymapping_derivations(spark, tmp_path):
    """Self-authored conf exercising the fields the canary fixtures omit:
    SNAPSHOT accuracy, keyMapping, join derivations, wheres."""
    conf = {
        "metaData": {"name": "test.join.v1"},
        "left": {
            "events": {
                "table": "data.checkouts",
                "query": {"selects": {"uid": "user_id", "ts": "ts"}, "timeColumn": "ts"},
            }
        },
        "joinParts": [
            {
                "groupBy": {
                    "metaData": {"name": "test.purchases"},
                    "sources": [
                        {
                            "events": {
                                "table": "data.purchases",
                                "query": {
                                    "selects": {
                                        "user_id": "user_id",
                                        "purchase_price": "purchase_price",
                                    },
                                    "wheres": ["purchase_price > 6"],
                                    "timeColumn": "ts",
                                },
                            }
                        }
                    ],
                    "keyColumns": ["user_id"],
                    "aggregations": [
                        {
                            "inputColumn": "purchase_price",
                            "operation": 7,
                            "argMap": {},
                            "windows": [{"length": 14, "timeUnit": 1}],
                        }
                    ],
                },
                "prefix": "p",
                "keyMapping": {"uid": "user_id"},
            }
        ],
        "derivations": [
            {"name": "*", "expression": "*"},
            {"name": "dbl", "expression": "p_purchase_price_sum_14d * 2"},
        ],
    }
    path = str(tmp_path / "conf.json")
    with open(path, "w") as f:
        json.dump(conf, f)
    out = backfill_join_conf(spark, path, _tables(spark)).toPandas().set_index("uid")
    # keyMapping mapped uid -> user_id; all three u1 purchases clear the where
    assert out.loc["u1", "p_purchase_price_sum_14d"] == 70.0
    # wheres filtered u2's 5.0 purchase (and -100h is outside nothing at 14d)
    assert out.loc["u2", "p_purchase_price_sum_14d"] == 7.0
    assert out.loc["u1", "dbl"] == out.loc["u1", "p_purchase_price_sum_14d"] * 2


def _prefilter_conf(exec_conf: dict | None) -> dict:
    """Minimal Join conf; optional executionInfo.conf engine knobs."""
    md: dict = {"name": "test.join.prefilter"}
    if exec_conf is not None:
        md["executionInfo"] = {"conf": exec_conf}
    return {
        "metaData": md,
        "left": {
            "events": {
                "table": "data.checkouts",
                "query": {"selects": {"user_id": "user_id", "ts": "ts"}, "timeColumn": "ts"},
            }
        },
        "joinParts": [
            {
                "groupBy": {
                    "metaData": {"name": "test.purchases"},
                    "sources": [
                        {
                            "events": {
                                "table": "data.purchases",
                                "query": {
                                    "selects": {
                                        "user_id": "user_id",
                                        "purchase_price": "purchase_price",
                                    },
                                    "timeColumn": "ts",
                                },
                            }
                        }
                    ],
                    "keyColumns": ["user_id"],
                    "aggregations": [
                        {
                            "inputColumn": "purchase_price",
                            "operation": 7,
                            "argMap": {},
                            "windows": [{"length": 14, "timeUnit": 1}],
                        }
                    ],
                }
            }
        ],
    }


def test_conf_prefilter_knobs(spark, tmp_path):
    """Reference knob parity (TableUtils.scala:54-63): an explicit
    spark.chronon.backfill.prefilter mode and an auto bloom threshold both
    produce rows identical to the unfiltered run."""
    base = None
    for exec_conf in (
        None,
        {"spark.chronon.backfill.prefilter": "semi"},
        {"spark.chronon.backfill.prefilter": "bloom"},
        # nested per-mode map form + threshold of 0: every left exceeds it,
        # so the reference SKIPS the bloom (no prefilter) — results identical
        {"backfill": {"spark.chronon.backfill.bloomfilter.threshold": "0"}},
        # threshold far above the left size: tiny left -> exact small mode
        {"spark.chronon.backfill.bloomfilter.threshold": "1000000"},
    ):
        path = str(tmp_path / f"conf_{id(exec_conf)}.json")
        with open(path, "w") as f:
            json.dump(_prefilter_conf(exec_conf), f)
        out = (
            backfill_join_conf(spark, path, _tables(spark))
            .toPandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        if base is None:
            base = out
        else:
            assert out.equals(base), f"prefilter conf {exec_conf} changed results"


def test_conf_prefilter_mode_resolution():
    lj = LoadedJoin(name="x", left=None, parts=[], exec_conf=None)
    assert lj.prefilter_mode() is None and lj.prefilter_mode(left_rows=10**9) is None
    lj = LoadedJoin(
        name="x", left=None, parts=[],
        exec_conf={"spark.chronon.backfill.bloomfilter.threshold": "1000000"},
    )
    # Reference semantics (Join.scala:273): skipBloomFilter = runSmallMode ||
    # leftRowCount > threshold — bloom only UNDER the threshold; huge lefts
    # get no prefilter; tiny lefts take exact small mode.
    assert lj.prefilter_mode(left_rows=10**6 + 1) is None
    assert lj.prefilter_mode(left_rows=10**6) == "bloom"
    assert lj.prefilter_mode(left_rows=100) == "auto"  # runSmallMode
    assert lj.prefilter_mode() is None  # unknown left size: no decision
    lj = LoadedJoin(
        name="x", left=None, parts=[],
        exec_conf={"spark.chronon.backfill.prefilter": "in"},
    )
    assert lj.prefilter_mode() == "in"


def test_accuracy_inference_matches_reference():
    """Extensions.scala:572-580: explicit accuracy wins; else TEMPORAL iff a
    source declares a streaming topic, else SNAPSHOT."""
    from chronon_spark.api import Accuracy
    from chronon_spark.confs import parse_group_by

    def gb(src_extra=None, acc=None):
        src = {"table": "t", "query": {"timeColumn": "ts"}}
        src.update(src_extra or {})
        d = {
            "metaData": {"name": "x"},
            "sources": [{"events": src}],
            "keyColumns": ["k"],
            "aggregations": [{"inputColumn": "v", "operation": 7}],
        }
        if acc is not None:
            d["accuracy"] = acc
        return parse_group_by(d).group_by.accuracy

    assert gb() is Accuracy.SNAPSHOT  # no topic -> snapshot
    assert gb({"topic": "kafka://events"}) is Accuracy.TEMPORAL
    assert gb(acc=0) is Accuracy.TEMPORAL  # explicit always wins
    assert gb({"topic": "kafka://events"}, acc=1) is Accuracy.SNAPSHOT


def test_time_column_expression_renders_as_ts(spark):
    """An expression timeColumn (legal in the reference) is aliased to the
    canonical `ts` instead of producing unparseable `expr AS expr`."""
    from chronon_spark.confs import parse_source

    src = parse_source(
        {
            "events": {
                "table": "t",
                "query": {
                    "selects": {"uid": "user_id"},
                    "timeColumn": "CAST(created_ms / 1000 AS TIMESTAMP)",
                },
            }
        }
    )
    assert src.time_column == "ts" and src.time_expr
    df = spark.createDataFrame([("u1", 1704844800000)], "user_id string, created_ms long")
    out = src.bind(lambda t: df)
    assert set(out.columns) == {"uid", "ts"}
    assert out.collect()[0]["ts"] is not None
    # select-* form materializes ts via withColumn
    src2 = parse_source(
        {"events": {"table": "t", "query": {"timeColumn": "CAST(created_ms / 1000 AS TIMESTAMP)"}}}
    )
    out2 = src2.bind(lambda t: df)
    assert "ts" in out2.columns and "created_ms" in out2.columns


def test_setups_are_executed(spark):
    """Conf-declared setup SQL (UDF registration, GroupBy.scala:876) runs
    before selects/wheres evaluate."""
    from chronon_spark.confs import parse_source

    src = parse_source(
        {
            "events": {
                "table": "t",
                "query": {
                    "selects": {"doubled": "conf_dbl(v)", "ts": "ts"},
                    "timeColumn": "ts",
                    "setups": [
                        "CREATE OR REPLACE TEMPORARY FUNCTION conf_dbl(v INT) RETURNS INT RETURN v * 2"
                    ],
                },
            }
        }
    )
    import datetime as dt

    df = spark.createDataFrame([(21, dt.datetime(2024, 1, 1))], "v int, ts timestamp")
    out = src.bind(lambda t: df)
    assert out.collect()[0]["doubled"] == 42


def test_multi_source_time_column_mismatch_raises():
    from chronon_spark.confs import parse_group_by

    d = {
        "metaData": {"name": "x"},
        "sources": [
            {"events": {"table": "a", "query": {"timeColumn": "ts"}}},
            {"events": {"table": "b", "query": {"timeColumn": "event_ts"}}},
        ],
        "keyColumns": ["k"],
        "aggregations": [{"inputColumn": "v", "operation": 7}],
    }
    with pytest.raises(ValueError, match="mismatched time columns"):
        parse_group_by(d)


def test_conf_backfill_bigint_millis_and_null_ts(spark, tmp_path):
    """run_conf_backfill on a conf whose time columns are epoch-millis BIGINT
    (the reference's convention) — ds derivation and window pruning must
    coerce; a null-time left row is excluded from partition planning."""
    import json as _json

    from chronon_spark.confs import run_conf_backfill

    t0 = 1704844800000  # 2024-01-10 00:00:00 UTC
    h = 3600_000
    purchases = spark.createDataFrame(
        [("u1", 10.0, t0 - 120 * h), ("u1", 20.0, t0 - 30 * h), ("u2", 7.0, t0 - 1 * h)],
        "user_id string, purchase_price double, ts long",
    )
    checkouts = spark.createDataFrame(
        [("u1", t0), ("u2", t0), ("u3", None)], "user_id string, ts long"
    )
    conf = {
        "metaData": {"name": "test.bigint.join"},
        "left": {
            "events": {
                "table": "data.checkouts",
                "query": {"selects": {"user_id": "user_id", "ts": "ts"}, "timeColumn": "ts"},
            }
        },
        "joinParts": [
            {
                "groupBy": {
                    "metaData": {"name": "test.bigint.purchases"},
                    "accuracy": 0,
                    "sources": [
                        {
                            "events": {
                                "table": "data.purchases",
                                "query": {
                                    "selects": {
                                        "user_id": "user_id",
                                        "purchase_price": "purchase_price",
                                    },
                                    "timeColumn": "ts",
                                },
                            }
                        }
                    ],
                    "keyColumns": ["user_id"],
                    "aggregations": [
                        {
                            "inputColumn": "purchase_price",
                            "operation": 7,
                            "windows": [{"length": 14, "timeUnit": 1}],
                        }
                    ],
                }
            }
        ],
    }
    path = str(tmp_path / "conf.json")
    with open(path, "w") as f:
        _json.dump(conf, f)
    res = run_conf_backfill(
        spark,
        path,
        {"data.purchases": purchases, "data.checkouts": checkouts},
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    # u3's null-ts row is excluded from planning; u1+u2 land in one partition
    assert res["partitions_total"] == 1 and res["rows_out"] == 2
    from chronon_spark.plans.table_lifecycle import managed_table

    out = managed_table(spark, str(tmp_path / "out")).read().toPandas().set_index("user_id")
    assert out.loc["u1", "purchase_price_sum_14d"] == 30.0
    assert out.loc["u2", "purchase_price_sum_14d"] == 7.0
