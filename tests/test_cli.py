"""Unified CLI (Driver.scala verb dispatcher analogue): each verb delegates
to its job module; in-process main(argv) keeps one Spark session."""

from __future__ import annotations

import json

import pytest

from chronon_spark import cli
from chronon_spark.sources.synth import synth_queries, synth_transcripts

GB = json.dumps(
    {
        "keys": ["conv_id"],
        "aggs": [{"col": "turn_idx", "op": "count", "windows": ["1d"]}],
        "tie_breakers": ["turn_idx"],
    }
)


@pytest.fixture(scope="module")
def paths(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    ev = synth_transcripts(n_rows=1200, n_convs=12)
    q = synth_queries(ev, n_queries=200)
    q = q[q["ds"].isin(sorted(q["ds"].unique())[:2])]
    ev_p, q_p = str(root / "ev.parquet"), str(root / "q.parquet")
    ev.to_parquet(ev_p, index=False)
    q.to_parquet(q_p, index=False)
    return ev_p, q_p, root


def test_analyze_ok_and_bad(paths, capsys):
    ev_p, q_p, _ = paths
    assert cli.main(["analyze", "--events", ev_p, "--queries", q_p, "--group-by", GB]) == 0
    assert json.loads(capsys.readouterr().out.strip())["analyze"] == "ok"
    bad = json.dumps({"keys": ["conv_id"], "aggs": [{"col": "nope", "op": "count"}]})
    assert cli.main(["analyze", "--events", ev_p, "--queries", q_p, "--group-by", bad]) == 1
    assert "nope" in capsys.readouterr().err


def test_backfill_then_check_partitions(paths, capsys):
    ev_p, q_p, root = paths
    out, ckpt = str(root / "out"), str(root / "ckpt")
    rc = cli.main(
        ["group-by-backfill", "--events", ev_p, "--queries", q_p,
         "--out", out, "--checkpoint", ckpt, "--group-by", GB]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["partitions_computed"] == 2
    assert cli.main(["check-partitions", "--table", out, "--checkpoint", ckpt]) == 0
    lines = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2
    assert sum(r["rows"] for r in lines) == stats["rows_out"]
    assert all(r["semantic_hash"] and r["wall_sec"] is not None for r in lines)


def test_metadata_export_and_summarize(paths, capsys):
    ev_p, _, root = paths
    meta_p = str(root / "meta.json")
    assert cli.main(["metadata-export", "--events", ev_p, "--group-by", GB, "--out", meta_p]) == 0
    doc = json.load(open(meta_p))
    assert doc["semantic_hash"]
    capsys.readouterr()
    assert cli.main(["summarize", "--table", ev_p, "--columns", "n_chars,role"]) == 0
    rows = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert {(r["column"], r["metric"]) for r in rows} >= {("n_chars", "mean"), ("role", "distinct")}


def test_consistency_metrics_verb(paths, capsys):
    ev_p, _, root = paths
    assert (
        cli.main(
            ["consistency-metrics-compute", "--left", ev_p, "--right", ev_p,
             "--keys", "conv_id,turn_idx"]
        )
        == 0
    )
    rows = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert rows and all(r["match_rate"] == 1.0 for r in rows)


def test_out_of_scope_verbs_reject_with_pointer(capsys):
    assert cli.main(["fetch"]) == 2
    assert "out of scope" in capsys.readouterr().err


def test_table_maintain_verbs(paths, capsys, spark):
    ev_p, q_p, root = paths
    out, ckpt = str(root / "tm_out"), str(root / "tm_ckpt")
    assert cli.main([
        "group-by-backfill", "--events", ev_p, "--queries", q_p,
        "--out", out, "--checkpoint", ckpt, "--group-by", GB,
    ]) == 0
    capsys.readouterr()
    assert cli.main(["table-maintain", "snapshots", "--table", out]) == 0
    snaps = json.loads(capsys.readouterr().out.strip())
    assert [s["version"] for s in snaps] == list(range(1, len(snaps) + 1))
    assert cli.main(["table-maintain", "compact", "--table", out, "--target-file-mb", "512"]) == 0
    capsys.readouterr()
    assert cli.main(["table-maintain", "expire", "--table", out, "--keep-last", "1"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["snapshots_expired"] >= 0
