"""Compare / consistency-metrics family: schema pre-flight, null-safe
row-level comparison, per-column metrics, mapping + migration modes."""

from __future__ import annotations

import pytest

from chronon_spark.jobs.compare import (
    build_comparison_table,
    check_consistency,
    compare_metrics,
    consistency_metrics,
)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [("k1", 1, 1.0), ("k2", 2, None), ("k3", 3, 3.0)], "id string, n int, v double"
    )
    right = spark.createDataFrame(
        [("k1", 1, 1.0), ("k2", 9, None), ("k4", 4, 4.0)], "id string, n int, v double"
    )
    return left, right


def test_check_consistency_collects_all_errors(spark, frames):
    left, _ = frames
    bad = spark.createDataFrame([("k1", "x")], "id string, n string")
    with pytest.raises(ValueError) as e:
        check_consistency(left, bad, ["id", "missing_key"])
    msg = str(e.value)
    assert "dtype mismatch for 'n'" in msg
    assert "missing_key" in msg
    assert "field counts" in msg


def test_comparison_table_null_safe(frames):
    left, right = frames
    rows = {r["id"]: r for r in build_comparison_table(left, right, ["id"]).collect()}
    assert not rows["k1"]["n_mismatch"] and not rows["k1"]["v_mismatch"]
    assert rows["k2"]["n_mismatch"]  # 2 vs 9
    assert not rows["k2"]["v_mismatch"]  # null == null is a match
    assert rows["k3"]["n_mismatch"]  # right-missing counts as mismatch
    assert rows["k4"]["n_mismatch"]  # left-missing counts as mismatch


def test_metrics_counts(frames):
    left, right = frames
    m = {r["col_name"]: r for r in compare_metrics(build_comparison_table(left, right, ["id"]), ["id"]).collect()}
    assert m["n"]["n_rows"] == 4
    assert m["n"]["mismatch"] == 3 and m["n"]["match_rate"] == 0.25
    assert m["v"]["left_null"] == 2  # k2's real null + k4's absent row
    assert m["v"]["mismatch"] == 2  # k3, k4 presence mismatches


def test_mapping_and_migration(spark, frames):
    left, _ = frames
    renamed = spark.createDataFrame(
        [("k1", 1), ("k2", 2), ("k3", 3)], "id string, n_new int"
    )
    # left has extra column v -> only valid with migration_check
    with pytest.raises(ValueError):
        build_comparison_table(left, renamed, ["id"], mapping={"n": "n_new"})
    out = build_comparison_table(
        left, renamed, ["id"], mapping={"n": "n_new"}, migration_check=True
    )
    assert all(not r["n_mismatch"] for r in out.collect())
    assert "v_left" not in out.columns  # migration-only column pruned


def test_consistency_metrics_perfect_match(frames):
    left, _ = frames
    m = consistency_metrics(left, left, ["id"]).collect()
    assert all(r["match_rate"] == 1.0 and r["mismatch"] == 0 for r in m)
