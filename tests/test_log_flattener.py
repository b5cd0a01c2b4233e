"""Log flattening (LogFlattenerJob analogue): union-of-schemas with nulls,
schema-conflict and key/value-collision guards, and plan shape (no shuffle
in the flatten itself)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from chronon_spark.jobs.log_flattener import flatten_logs, infer_schemas, union_schema


def _logs(spark):
    rows = [
        ("a", "v1", '{"uid": 1}', '{"score": 1.5, "kind": "x"}'),
        ("b", "v1", '{"uid": 2}', '{"score": 2.5, "kind": "y"}'),
        ("c", "v2", '{"uid": 3}', '{"score": 3.5, "kind": "z", "amount": 7.0}'),
    ]
    return spark.createDataFrame(rows, "ts string, schema_hash string, key_json string, value_json string")


def test_flatten_union_with_nulls(spark):
    out = flatten_logs(_logs(spark), carry=("ts",))
    # inferred field order is Spark's JSON inference (alphabetical per
    # version), unioned first-seen across sorted schema hashes
    assert out.columns == ["ts", "schema_hash", "uid", "kind", "score", "amount"]
    got = {r["ts"]: (r["uid"], r["score"], r["kind"], r["amount"]) for r in out.collect()}
    assert got == {
        "a": (1, 1.5, "x", None),
        "b": (2, 2.5, "y", None),
        "c": (3, 3.5, "z", 7.0),
    }


def test_flatten_is_shuffle_free(spark):
    ks = {"v1": T.StructType([T.StructField("uid", T.LongType())])}
    vs = {
        "v1": T.StructType(
            [T.StructField("score", T.DoubleType()), T.StructField("kind", T.StringType())]
        )
    }
    out = flatten_logs(_logs(spark), schemas=vs, key_schemas=ks)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure scan→project: pipelines at any scale


def test_schema_conflict_is_hard_error(spark):
    schemas = {
        "v1": T.StructType([T.StructField("score", T.DoubleType())]),
        "v2": T.StructType([T.StructField("score", T.StringType())]),
    }
    with pytest.raises(ValueError, match="type conflict.*v1.*v2"):
        union_schema(schemas)


def test_key_value_collision_is_hard_error(spark):
    logs = _logs(spark).withColumn("key_json", F.lit('{"score": 9}'))
    with pytest.raises(ValueError, match="collision.*score"):
        flatten_logs(logs, carry=("ts",))


def test_infer_schemas_one_sample_per_hash(spark):
    got = infer_schemas(_logs(spark))
    assert set(got) == {"v1", "v2"}
    assert {f.name for f in got["v2"].fields} == {"score", "kind", "amount"}
    assert isinstance(got["v1"]["score"].dataType, T.DoubleType)
