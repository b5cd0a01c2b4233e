from __future__ import annotations

import io
from contextlib import redirect_stdout

from chronon_spark.functions.decontaminate import contamination


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_planted_overlap_flags_only_true_hits(spark):
    # bench doc = words b0..b9; train doc 1 embeds its first 8-gram verbatim,
    # doc 2 shares no 8-gram, doc 3 is too short to shingle at all.
    bench_text = " ".join(f"b{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, "x y " + " ".join(f"b{i}" for i in range(8)) + " z w q r s t"),
            (2, " ".join(f"c{i}" for i in range(20))),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    out = _rows(contamination(docs, bench, shingle_n=8, min_hits=1))
    assert out[1]["contaminated"] == 1 and out[1]["n_hit"] == 1
    assert out[2]["contaminated"] == 0 and out[2]["n_hit"] == 0
    assert out[3] == {
        "doc_id": 3,
        "n_ngrams": 0,
        "n_hit": 0,
        "hit_frac": 0.0,
        "contaminated": 0,
    }
    # doc 1: 16 tokens -> 9 distinct 8-grams, exactly one matches
    assert out[1]["n_ngrams"] == 9
    assert abs(out[1]["hit_frac"] - 1 / 9) < 1e-12


def test_min_frac_threshold_gates_weak_overlap(spark):
    bench = spark.createDataFrame(
        [(0, " ".join(f"b{i}" for i in range(10)))], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, "x y " + " ".join(f"b{i}" for i in range(8)) + " z w q r s t")],
        "doc_id long, text string",
    )
    weak = _rows(contamination(docs, bench, shingle_n=8, min_frac=0.5))
    assert weak[1]["n_hit"] == 1 and weak[1]["contaminated"] == 0


def test_bench_self_contamination_is_total(spark):
    text = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    out = _rows(contamination(docs, docs, shingle_n=8))
    assert out[7]["hit_frac"] == 1.0 and out[7]["contaminated"] == 1


def test_plan_broadcasts_bench_and_hits(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(12))) for i in range(20)],
        "doc_id long, text string",
    )
    bench = docs.where("doc_id % 5 = 0")
    buf = io.StringIO()
    with redirect_stdout(buf):
        contamination(docs, bench).explain("formatted")
    plan = buf.getvalue()
    # the bench hash set and the hit table both ride broadcast joins; the
    # full-width train side is never shuffled by a join
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
