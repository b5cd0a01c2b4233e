"""Modular per-part join backfill: equivalence with the chained path,
part-granular resume, spec-hash invalidation, row-id validation."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import Accuracy, Aggregation, GroupBy, Join, JoinPart, Op
from chronon_spark.jobs.modular_join import compute_join_modular
from chronon_spark.operators.asof_join import compute_join
from chronon_spark.sources.synth import synth_queries, synth_transcripts
from tests.oracle import assert_frames_allclose


@pytest.fixture(scope="module")
def data(spark):
    ev = synth_transcripts(n_rows=2000, n_convs=20)
    q = synth_queries(ev, n_queries=400)
    return spark.createDataFrame(ev), spark.createDataFrame(q)


def _join(events):
    gb1 = GroupBy(
        keys=["conv_id"],
        aggregations=[Aggregation("turn_idx", Op.COUNT, windows=("2d",))],
        tie_breakers=["turn_idx"],
    )
    gb2 = GroupBy(
        keys=["conv_id"],
        aggregations=[Aggregation("n_chars", Op.SUM, windows=("7d",))],
        tie_breakers=["turn_idx"],
        accuracy=Accuracy.SNAPSHOT,
    )
    return Join(
        left_time_column="ts",
        join_parts=[JoinPart(gb1, events), JoinPart(gb2, events, prefix="snap")],
        derivations={"*": "*", "ratio": "turn_idx_count_2d / 2.0"},
        row_ids=["query_id"],
    )


def test_modular_equals_chained(data, tmp_path):
    events, queries = data
    join = _join(events)
    got = compute_join_modular(queries, join, str(tmp_path / "wd")).toPandas()
    want = compute_join(queries, join).toPandas()
    assert_frames_allclose(got[sorted(got.columns)], want[sorted(want.columns)], sort_by=["query_id"])


def test_resume_skips_finished_parts(data, tmp_path):
    events, queries = data
    join = _join(events)
    wd = str(tmp_path / "wd2")
    compute_join_modular(queries, join, wd)
    dirs = sorted(d for d in os.listdir(wd) if d.startswith("part_"))
    assert len(dirs) == 2
    # delete one part; rerun must recompute ONLY it
    kept, dropped = (os.path.join(wd, dirs[0]), os.path.join(wd, dirs[1]))
    mtime_kept = os.path.getmtime(os.path.join(kept, "_SUCCESS"))
    mtime_left = os.path.getmtime(os.path.join(wd, "left", "_SUCCESS"))
    import shutil

    shutil.rmtree(dropped)
    time.sleep(1.1)
    out = compute_join_modular(queries, join, wd)
    assert out.count() == queries.count()
    assert os.path.getmtime(os.path.join(kept, "_SUCCESS")) == mtime_kept
    assert os.path.getmtime(os.path.join(wd, "left", "_SUCCESS")) == mtime_left
    assert os.path.exists(os.path.join(dropped, "_SUCCESS"))


def test_spec_change_invalidates_part_path(data, tmp_path):
    events, queries = data
    join = _join(events)
    wd = str(tmp_path / "wd3")
    compute_join_modular(queries, join, wd)
    before = {d for d in os.listdir(wd) if d.startswith("part_0")}
    # widen the spec WITHOUT renaming existing outputs (the join derivation
    # references turn_idx_count_2d): adding an aggregation changes the
    # semantic hash while keeping the old columns valid
    join.join_parts[0].group_by.aggregations.append(
        Aggregation("turn_idx", Op.SUM, windows=("2d",))
    )
    compute_join_modular(queries, join, wd)
    after = {d for d in os.listdir(wd) if d.startswith("part_0")}
    assert before < after  # new semantic hash -> new part dir, old kept


def test_duplicate_row_ids_rejected(data, tmp_path):
    events, queries = data
    join = _join(events)
    dup = queries.unionByName(queries.limit(5))
    with pytest.raises(ValueError, match="uniquely"):
        compute_join_modular(dup, join, str(tmp_path / "wd4"))


def test_row_ids_required(data, tmp_path):
    events, queries = data
    join = _join(events)
    join.row_ids = None
    with pytest.raises(ValueError, match="row_ids"):
        compute_join_modular(queries, join, str(tmp_path / "wd5"))
