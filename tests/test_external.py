"""External parts: contextual passthrough, keyMapping, offline null contract,
values-snapshot broadcast join (reference Extensions.scala:782-841)."""

import pytest

from chronon_spark.operators.external import ExternalPart, ExternalSource, apply_external_parts


@pytest.fixture(scope="module")
def left(spark):
    return spark.createDataFrame(
        [("u1", "US", 1), ("u2", "DE", 2), ("u3", None, 3)],
        "user_id string, country string, x int",
    )


def test_contextual_passthrough_and_keymapping(left):
    part = ExternalPart(
        source=ExternalSource(
            name="contextual",
            key_columns=("uid", "country"),
            value_columns={"uid": "string", "country": "string"},
        ),
        key_mapping={"user_id": "uid"},
        prefix="ctx",
    )
    out = apply_external_parts(left, [part])
    rows = {r["user_id"]: r for r in out.collect()}
    assert out.columns[-2:] == ["ext_ctx_contextual_uid", "ext_ctx_contextual_country"]
    assert rows["u1"]["ext_ctx_contextual_uid"] == "u1"
    assert rows["u2"]["ext_ctx_contextual_country"] == "DE"
    assert rows["u3"]["ext_ctx_contextual_country"] is None  # null-fill, no error


def test_contextual_missing_key_nullfills(left):
    part = ExternalPart(
        source=ExternalSource(
            name="contextual", key_columns=("absent",), value_columns={"absent": "bigint"}
        )
    )
    out = apply_external_parts(left, [part])
    assert out.schema["ext_contextual_absent"].dataType.simpleString() == "bigint"
    assert all(r["ext_contextual_absent"] is None for r in out.collect())


def test_offline_nonexternal_is_null_typed(left):
    part = ExternalPart(
        source=ExternalSource(
            name="risk_model",
            key_columns=("user_id",),
            value_columns={"score": "double", "tier": "string"},
        )
    )
    out = apply_external_parts(left, [part])
    assert out.schema["ext_risk_model_score"].dataType.simpleString() == "double"
    assert all(
        r["ext_risk_model_score"] is None and r["ext_risk_model_tier"] is None
        for r in out.collect()
    )


def test_values_snapshot_broadcast_join(spark, left):
    snap = spark.createDataFrame(
        [("u1", 0.9, "gold"), ("u3", 0.1, "bronze")], "uid string, score double, tier string"
    )
    part = ExternalPart(
        source=ExternalSource(
            name="risk", key_columns=("uid",), value_columns={"score": "double", "tier": "string"}
        ),
        key_mapping={"user_id": "uid"},
    )
    out = apply_external_parts(left, [part], values={"risk": snap})
    rows = {r["user_id"]: r for r in out.collect()}
    assert rows["u1"]["ext_risk_score"] == 0.9 and rows["u1"]["ext_risk_tier"] == "gold"
    assert rows["u2"]["ext_risk_score"] is None
    assert rows["u3"]["ext_risk_tier"] == "bronze"
    assert out.count() == 3  # left join, no fanout
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan  # snapshot rides a broadcast, no shuffle of left
