"""Metadata export: derived output schema without execution, semantic-hash
identity, analyzer-gated validity, JSON round-trip."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.jobs.metadata import export_metadata, group_by_metadata


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        [("c1", 0, 10, "x")], "conv_id string, turn_idx int, n_chars long, text string"
    ).withColumn("ts", F.current_timestamp())


def _gb():
    return GroupBy(
        keys=["conv_id"],
        aggregations=[
            Aggregation("n_chars", Op.SUM, windows=("7d", None)),
            Aggregation("text", Op.LAST_K, windows=("2d",), k=3),
        ],
        tie_breakers=["turn_idx"],
    )


def test_output_schema_derived_without_execution(events):
    doc = group_by_metadata(events, _gb())
    outs = {o["name"]: o["type"] for o in doc["output_schema"]}
    assert outs["n_chars_sum_7d"] == "bigint"
    assert outs["n_chars_sum"] == "bigint"  # unbounded window
    assert outs["text_last_k3_2d"].startswith("array")
    assert doc["aggregations"][0]["windows"] == ["7d", None]
    assert doc["aggregations"][1]["op"] == "LAST_K"


def test_semantic_hash_tracks_spec(events):
    a = group_by_metadata(events, _gb())["semantic_hash"]
    gb2 = _gb()
    gb2.aggregations.append(Aggregation("turn_idx", Op.COUNT))
    b = group_by_metadata(events, gb2)["semantic_hash"]
    assert a != b
    assert a == group_by_metadata(events, _gb())["semantic_hash"]  # stable


def test_invalid_spec_rejected(events):
    gb = _gb()
    gb.aggregations.append(Aggregation("missing_col", Op.SUM))
    with pytest.raises(Exception, match="missing_col"):
        group_by_metadata(events, gb)


def test_json_roundtrip(events, tmp_path):
    p = str(tmp_path / "meta.json")
    doc = export_metadata(events, _gb(), p, name="turn_features")
    on_disk = json.loads(open(p).read())
    assert on_disk == json.loads(json.dumps(doc))
    assert on_disk["name"] == "turn_features"
    assert {f["name"] for f in on_disk["input_schema"]} >= {"conv_id", "ts"}
