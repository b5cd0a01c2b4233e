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


def test_column_level_reuse_on_spec_edit(data, tmp_path, monkeypatch):
    """Reference MergeJob.analyzeJoinPartsForReuse (MergeJob.scala:305-411):
    editing ONE part's spec recomputes only the columns whose semantic hash
    changed; unchanged columns copy from the prior part output. Asserted two
    ways: the spy sees only the NEW column computed, and the merged values
    equal a from-scratch chained run."""
    import importlib

    # operators/__init__ rebinds the package attr `asof_join` to the FUNCTION,
    # so `import ... as aj` would grab that — fetch the module itself
    aj = importlib.import_module("chronon_spark.operators.asof_join")

    events, queries = data
    gb = GroupBy(
        keys=["conv_id"],
        aggregations=[
            Aggregation("turn_idx", Op.COUNT, windows=("2d",)),
            Aggregation("n_chars", Op.SUM, windows=("7d",)),
        ],
        tie_breakers=["turn_idx"],
    )
    join1 = Join("ts", [JoinPart(gb, events)], row_ids=["query_id"])
    wd = str(tmp_path / "wd6")
    compute_join_modular(queries, join1, wd)

    gb2 = GroupBy(
        keys=["conv_id"],
        aggregations=[
            Aggregation("turn_idx", Op.COUNT, windows=("2d",)),
            Aggregation("n_chars", Op.SUM, windows=("7d",)),
            Aggregation("n_chars", Op.MAX, windows=("7d",)),  # the edit
        ],
        tie_breakers=["turn_idx"],
    )
    join2 = Join("ts", [JoinPart(gb2, events)], row_ids=["query_id"])

    computed = []
    orig = aj.compute_join

    def spy(left, j, **kw):
        computed.extend(p.output_name for jp in j.join_parts for p in jp.group_by.parts())
        return orig(left, j, **kw)

    monkeypatch.setattr(aj, "compute_join", spy)
    got = compute_join_modular(queries, join2, wd).toPandas()
    monkeypatch.undo()
    # ONLY the new column's aggregation ran; count/sum reused from the prior dir
    assert computed == ["n_chars_max_7d"]
    want = compute_join(queries, join2).toPandas()
    assert_frames_allclose(got[sorted(got.columns)], want[sorted(want.columns)], sort_by=["query_id"])


def test_column_reuse_untouched_part_files_not_recomputed(data, tmp_path):
    """Editing part 0 must leave part 1's dir byte-untouched (mtime assert)
    and produce a part-0 dir that carries ONLY a fresh compute of the new
    column merged with reused ones."""
    events, queries = data
    join = _join(events)
    wd = str(tmp_path / "wd7")
    compute_join_modular(queries, join, wd)
    part1 = sorted(d for d in os.listdir(wd) if d.startswith("part_1"))[0]
    mtime1 = os.path.getmtime(os.path.join(wd, part1, "_SUCCESS"))
    join.join_parts[0].group_by.aggregations.append(
        Aggregation("n_chars", Op.MIN, windows=("2d",))
    )
    time.sleep(1.1)
    out = compute_join_modular(queries, join, wd).toPandas()
    assert os.path.getmtime(os.path.join(wd, part1, "_SUCCESS")) == mtime1
    assert "n_chars_min_2d" in out.columns and "turn_idx_count_2d" in out.columns
