"""Authoring DSL (chronon_spark.dsl): the reference's Python conf surface
must emit compiled-conf shapes that parse through chronon_spark.confs and
backfill end-to-end — a user can port their conf repo by changing imports."""

from __future__ import annotations

import datetime as dt
import json

from chronon_spark import dsl
from chronon_spark.api import Op
from chronon_spark.confs import load_conf, parse_aggregation, parse_group_by, parse_join


def test_window_forms_and_operation_args():
    assert dsl.Window(7, dsl.TimeUnit.DAYS) == {"length": 7, "timeUnit": 1}
    # string windows normalize like the reference's windows.py
    a = dsl.Aggregation("x", dsl.Operation.SUM, windows=["3d", "2h", "30m"])
    assert a["windows"] == [
        {"length": 3, "timeUnit": 1},
        {"length": 2, "timeUnit": 0},
        {"length": 30, "timeUnit": 2},
    ]
    # parameterized ops stringify args into argMap (OperationWithArgs shape)
    b = dsl.Aggregation("x", dsl.Operation.LAST_K(10), windows=[dsl.Window(7, 1)])
    assert b["operation"] == 13 and b["argMap"] == {"k": "10"}
    p = dsl.Aggregation("x", dsl.Operation.APPROX_PERCENTILE([0.25, 0.75], k=256))
    assert p["operation"] == 12
    assert json.loads(p["argMap"]["percentiles"]) == [0.25, 0.75]
    # defaults to LAST, like the reference
    assert dsl.Aggregation("x")["operation"] == 3
    # FREQUENT_K compiles to HISTOGRAM+k, LGK to APPROX_UNIQUE_COUNT+k
    fk = dsl.Aggregation("x", dsl.Operation.FREQUENT_K(4))
    assert fk["operation"] == 17 and fk["argMap"] == {"k": "4"}
    assert dsl.Operation.APPROX_UNIQUE_COUNT_LGK(12) == (5, {"k": "12"})
    # and the emitted dict round-trips through the compiled-conf parser
    agg = parse_aggregation(b)
    assert agg.op is Op.LAST_K and agg.k == 10 and agg.windows[0].spec == "7d"


def test_selects_helper():
    assert dsl.selects("a", "b", c="f(x)") == {"a": "a", "b": "b", "c": "f(x)"}


def test_groupby_and_join_parse_through_conf_loader():
    purchases = dsl.GroupBy(
        name="test.purchases.v1",
        sources=dsl.EventSource(
            table="data.purchases",
            query=dsl.Query(
                selects=dsl.selects("user_id", "purchase_price"),
                wheres=["purchase_price > 6"],
                time_column="ts",
            ),
        ),
        keys=["user_id"],
        aggregations=[
            dsl.Aggregation("purchase_price", dsl.Operation.SUM, windows=["14d"]),
            dsl.Aggregation("purchase_price", dsl.Operation.LAST_K(10)),
        ],
        online=True,
        offline_schedule="@daily",  # execution knob: recorded, not semantic
    )
    join = dsl.Join(
        name="test.training_set.v1",
        left=dsl.EventSource(
            table="data.checkouts",
            query=dsl.Query(selects={"uid": "user_id", "ts": "ts"}, time_column="ts"),
        ),
        right_parts=[
            dsl.JoinPart(group_by=purchases, key_mapping={"uid": "user_id"}, prefix="p")
        ],
        derivations=[
            dsl.Derivation("*", "*"),
            dsl.Derivation("dbl", "p_purchase_price_sum_14d * 2"),
        ],
        row_ids="uid",
    )
    # json-stable (what compile_conf writes)
    assert json.loads(dsl.compile_conf(join)) == join
    lj = parse_join(join)
    assert lj.name == "test.training_set.v1"
    assert lj.left.table == "data.checkouts"
    (lg, prefix, km), = lj.parts
    assert prefix == "p" and km == {"uid": "user_id"}
    assert lg.group_by.keys == ["user_id"]
    assert {a.op for a in lg.group_by.aggregations} == {Op.SUM, Op.LAST_K}
    assert lj.derivations == {"*": "*", "dbl": "p_purchase_price_sum_14d * 2"}
    assert lj.row_ids == ["uid"]
    gb = parse_group_by(purchases)
    assert gb.sources[0].query.wheres == ["purchase_price > 6"]


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


def test_dsl_backfill_end_to_end(spark, tmp_path):
    gb = dsl.GroupBy(
        name="test.purchases",
        sources=dsl.EventSource(
            "data.purchases",
            dsl.Query(
                selects=dsl.selects("user_id", "purchase_price"),
                wheres=["purchase_price > 6"],
                time_column="ts",
            ),
        ),
        keys=["user_id"],
        aggregations=[
            dsl.Aggregation(
                "purchase_price", dsl.Operation.SUM, windows=[dsl.Window(14, dsl.TimeUnit.DAYS)]
            )
        ],
    )
    join = dsl.Join(
        name="test.join.v1",
        left=dsl.EventSource(
            "data.checkouts", dsl.Query(selects={"uid": "user_id", "ts": "ts"}, time_column="ts")
        ),
        right_parts=[dsl.JoinPart(gb, key_mapping={"uid": "user_id"}, prefix="p")],
        derivations=[
            dsl.Derivation("*", "*"),
            dsl.Derivation("dbl", "p_purchase_price_sum_14d * 2"),
        ],
    )
    out = dsl.backfill_join(spark, join, _tables(spark)).toPandas().set_index("uid")
    assert out.loc["u1", "p_purchase_price_sum_14d"] == 70.0
    assert out.loc["u2", "p_purchase_price_sum_14d"] == 7.0  # where filtered 5.0
    assert out.loc["u1", "dbl"] == 140.0
    assert "u3" in out.index  # left row survives empty windows

    # the SAME conf written to disk runs through the file-based loader
    path = str(tmp_path / "join.json")
    dsl.compile_conf(join, path)
    from chronon_spark.confs import backfill_join_conf

    out2 = backfill_join_conf(spark, path, _tables(spark)).toPandas().set_index("uid")
    assert out2.loc["u1", "dbl"] == 140.0
    assert isinstance(load_conf(path).name, str)


def test_run_group_by_renders_union(spark):
    gb = dsl.GroupBy(
        sources=[
            dsl.EventSource(
                "data.purchases",
                dsl.Query(selects=dsl.selects("user_id", "purchase_price"), time_column="ts"),
            )
        ],
        keys=["user_id"],
        aggregations=[dsl.Aggregation("purchase_price", dsl.Operation.SUM)],
    )
    df = dsl.run_group_by(spark, gb, _tables(spark))
    assert set(df.columns) >= {"user_id", "purchase_price", "ts"}
    assert df.count() == 5


def test_join_source_chaining(spark):
    """A GroupBy over JoinSource(parent join): binding computes the parent's
    PITC backfill and scans its output — the reference's chained-join shape
    authored in the DSL."""
    import datetime as dt

    from pyspark.sql import functions as F

    # accuracy is EXPLICIT temporal: with no streaming topic the loader now
    # infers SNAPSHOT (reference Extensions.scala:572-580), and this test's
    # expectations are point-in-time values
    parent_gb = dsl.GroupBy(
        name="test.purchases",
        sources=dsl.EventSource(
            "data.purchases",
            dsl.Query(selects=dsl.selects("user_id", "purchase_price"), time_column="ts"),
        ),
        keys=["user_id"],
        aggregations=[dsl.Aggregation("purchase_price", dsl.Operation.SUM, windows=["14d"])],
        accuracy=0,
    )
    parent = dsl.Join(
        name="test.parent",
        left=dsl.EventSource(
            "data.checkouts", dsl.Query(selects={"uid": "user_id", "ts": "ts"}, time_column="ts")
        ),
        right_parts=[dsl.JoinPart(parent_gb, key_mapping={"uid": "user_id"})],
    )
    chained_gb = dsl.GroupBy(
        name="test.chained",
        sources=dsl.JoinSource(
            parent,
            dsl.Query(
                selects=dsl.selects("uid", feat="purchase_price_sum_14d"), time_column="ts"
            ),
        ),
        keys=["uid"],
        aggregations=[dsl.Aggregation("feat", dsl.Operation.LAST)],
        accuracy=0,
    )
    # the chained GroupBy's rendered source IS the parent backfill
    src = dsl.run_group_by(spark, chained_gb, _tables(spark))
    got = {r["uid"]: r["feat"] for r in src.collect()}
    assert got["u1"] == 70.0 and got["u2"] == 12.0 and got["u3"] is None

    # and a second-hop join consumes it point-in-time (left 1h after t0)
    t1 = dt.datetime(2024, 1, 10, 1)
    later = spark.createDataFrame([("u1", t1), ("u2", t1)], "uid string, ts timestamp")
    tables = {**_tables(spark), "data.later": later}
    second = dsl.Join(
        name="test.second_hop",
        left=dsl.EventSource("data.later", dsl.Query(selects=dsl.selects("uid"), time_column="ts")),
        right_parts=[dsl.JoinPart(chained_gb, prefix="c")],
    )
    out = dsl.backfill_join(spark, second, tables).toPandas().set_index("uid")
    assert out.loc["u1", "c_feat_last"] == 70.0
    assert out.loc["u2", "c_feat_last"] == 12.0


def test_skew_keys_flow_through(spark):
    """skewKeys in a DSL/compiled Join exclude the listed hot values on both
    sides of the backfill (the reference's skew-key anti-filter)."""
    gb = dsl.GroupBy(
        name="t.gb",
        sources=dsl.EventSource(
            "data.purchases",
            dsl.Query(selects=dsl.selects("user_id", "purchase_price"), time_column="ts"),
        ),
        keys=["user_id"],
        aggregations=[dsl.Aggregation("purchase_price", dsl.Operation.SUM, windows=["14d"])],
    )
    join = dsl.Join(
        name="t.join",
        left=dsl.EventSource(
            "data.checkouts", dsl.Query(selects={"user_id": "user_id"}, time_column="ts")
        ),
        right_parts=[dsl.JoinPart(gb)],
        skew_keys={"user_id": ["u1"]},
    )
    out = dsl.backfill_join(spark, join, _tables(spark)).toPandas()
    assert "u1" not in set(out["user_id"])  # excluded hot key
    assert {"u2", "u3"} <= set(out["user_id"])


def test_run_conf_backfill_resume(spark, tmp_path):
    """Conf-driven partitioned backfill: lineage manifests, full-skip resume,
    and single-partition recompute after a deleted checkpoint."""
    import json as _json
    import os

    from chronon_spark.confs import run_conf_backfill

    # two left partitions
    t0 = dt.datetime(2024, 1, 10)
    t1 = dt.datetime(2024, 1, 11)
    checkouts = spark.createDataFrame(
        [("u1", t0), ("u2", t0), ("u1", t1)], "user_id string, ts timestamp"
    )
    tables = {**_tables(spark), "data.checkouts2": checkouts}
    gb = dsl.GroupBy(
        name="t.gb",
        sources=dsl.EventSource(
            "data.purchases",
            dsl.Query(selects=dsl.selects("user_id", "purchase_price"), time_column="ts"),
        ),
        keys=["user_id"],
        aggregations=[dsl.Aggregation("purchase_price", dsl.Operation.SUM, windows=["14d"])],
    )
    join = dsl.Join(
        name="t.join",
        left=dsl.EventSource(
            "data.checkouts2", dsl.Query(selects=dsl.selects("user_id"), time_column="ts")
        ),
        right_parts=[dsl.JoinPart(gb)],
    )
    conf_path = str(tmp_path / "join.json")
    dsl.compile_conf(join, conf_path)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    s1 = run_conf_backfill(spark, conf_path, tables, out, ckpt)
    assert s1["partitions_total"] == 2 and s1["partitions_computed"] == 2
    got = spark.read.parquet(out).toPandas()
    r = got[(got["user_id"] == "u1") & (got["ds"].astype(str) == "2024-01-10")].iloc[0]
    assert r["purchase_price_sum_14d"] == 70.0
    # manifests carry lineage + stage metrics
    m = _json.load(open(os.path.join(ckpt, "2024-01-10.json")))
    assert m["inputs"]["conf"]["name"] == "t.join" and "wall_sec" in m["stage_metrics"]

    s2 = run_conf_backfill(spark, conf_path, tables, out, ckpt)
    assert s2["partitions_computed"] == 0 and s2["partitions_skipped_resume"] == 2

    os.remove(os.path.join(ckpt, "2024-01-11.json"))
    s3 = run_conf_backfill(spark, conf_path, tables, out, ckpt)
    assert s3["partitions_computed"] == 1


def test_unknown_kwargs_raise():
    """Misspelled semantic parameters must fail at authoring time, not
    compile into a conf with silently-default semantics (the hazard class
    parse_gb also rejects): `acuracy=` / `time_colum=` are one-edit typos of
    parameters that change every downstream value."""
    import pytest

    with pytest.raises(TypeError, match="acuracy"):
        dsl.GroupBy(
            sources=[dsl.EventSource(table="t", query=dsl.Query())],
            keys=["k"],
            aggregations=[dsl.Aggregation("x", dsl.Operation.SUM)],
            acuracy=1,
        )
    with pytest.raises(TypeError):
        dsl.Query(selects=dsl.selects("a"), time_colum="event_ts")
    # the documented execution-info kwargs still pass through (emitted with
    # the reference's thrift field names — join.py:469-477 ExecutionInfo)
    gb = dsl.GroupBy(
        sources=[dsl.EventSource(table="t", query=dsl.Query())],
        keys=["k"],
        aggregations=[dsl.Aggregation("x", dsl.Operation.SUM)],
        step_days=7,
    )
    assert gb["metaData"]["executionInfo"] == {"stepDays": 7}


def test_reference_execution_and_meta_kwargs_accepted():
    """Confs ported from the reference use the full kwargs surface of
    group_by.py:480-499 / join.py:265-292; they must compile, with meta-level
    kwargs routed into metaData and execution kwargs into executionInfo."""
    import pytest

    gb = dsl.GroupBy(
        sources=[dsl.EventSource(table="t", query=dsl.Query())],
        keys=["k"],
        aggregations=[dsl.Aggregation("x", dsl.Operation.SUM)],
        output_namespace="ns",
        table_properties={"owner": "ml"},
        online=True,
        disable_historical_backfill=True,
        offline_schedule="@daily",
    )
    md = gb["metaData"]
    assert md["outputNamespace"] == "ns"
    assert md["tableProperties"] == {"owner": "ml"}
    # online=True without online_schedule defaults to @daily (join.py:455-457)
    assert md["executionInfo"]["onlineSchedule"] == "@daily"
    assert md["executionInfo"]["historicalBackfill"] is True
    assert md["executionInfo"]["offlineSchedule"] == "@daily"

    # explicitly-passed False must EMIT (join.py:469-477 passes False into
    # ExecutionInfo — the reference's sample_chaining_join_parent.py relies
    # on historical_backfill=False compiling to a present false, not an
    # absent key a consumer would default to true)
    j_false = dsl.Join(
        left=dsl.EventSource(table="l", query=dsl.Query()),
        right_parts=[dsl.JoinPart(gb)],
        historical_backfill=False,
    )
    assert j_false["metaData"]["executionInfo"]["historicalBackfill"] is False

    j = dsl.Join(
        left=dsl.EventSource(table="l", query=dsl.Query()),
        right_parts=[dsl.JoinPart(gb)],
        online=True,
        sample_percent=10.0,
        check_consistency=True,
        consistency_sample_percent=5.0,
        enable_stats_compute=True,
        modular_execution=True,
        bootstrap_from_log=True,
        use_long_names=True,
        online_external_parts=[{"source": {"metadata": {"name": "ext"}}}],
    )
    md = j["metaData"]
    assert md["samplePercent"] == 10.0
    assert md["consistencyCheck"] is True
    assert md["consistencySamplePercent"] == 5.0
    assert md["executionInfo"]["enableStatsCompute"] is True
    # modular_execution folds into conf.common (join.py:459-466)
    assert md["executionInfo"]["conf"]["common"]["modular_execution"] == "true"
    # bootstrap_from_log appends the templated logged-table part (join.py:433-443)
    assert j["bootstrapParts"] == [{"table": "{{ logged_table }}"}]
    assert j["useLongNames"] is True
    assert j["onlineExternalParts"][0]["source"]["metadata"]["name"] == "ext"

    # online_schedule without online=True is rejected (join.py:446-451)
    with pytest.raises(ValueError, match="online_schedule"):
        dsl.GroupBy(
            sources=[dsl.EventSource(table="t", query=dsl.Query())],
            keys=["k"],
            aggregations=[dsl.Aggregation("x", dsl.Operation.SUM)],
            online_schedule="@hourly",
        )
    # "@never" explicitly disables it even when online (join.py:453-454)
    gb2 = dsl.GroupBy(
        sources=[dsl.EventSource(table="t", query=dsl.Query())],
        keys=["k"],
        aggregations=[dsl.Aggregation("x", dsl.Operation.SUM)],
        online=True,
        online_schedule="@never",
    )
    assert "onlineSchedule" not in gb2["metaData"].get("executionInfo", {})
    # bootstrap_from_log still requires online logging (join.py:434-437)
    with pytest.raises(ValueError, match="bootstrap_from_log"):
        dsl.Join(
            left=dsl.EventSource(table="l", query=dsl.Query()),
            right_parts=[dsl.JoinPart(gb)],
            bootstrap_from_log=True,
        )
