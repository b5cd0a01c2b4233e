"""Physical-plan audit over EVERY contract query: the 100 TB failure modes
(cartesian products, unbroadcast dim joins) must be visible at sf0.001 —
plan shape is scale-invariant even when timings aren't.

Forbidden everywhere: CartesianProduct. BroadcastNestedLoopJoin is allowed
only where a broadcast×corpus scan is the intended algorithm (brute-force
cosine baselines, whose query side is bounded by construction).
"""

from __future__ import annotations

import importlib
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"

# brute-force cosine: broadcast(queries) × corpus is the algorithm, and the
# broadcast side is small by contract.
# cumulative_events_scan: the BNLJ is in build_cumulative — the TEST FIXTURE
# builder (date <= date fanout deriving a cumulative table from a stream);
# the operator under test (latest-partition scan) is a pure filter.
# drift_psi: two crossJoin(broadcast(<1-row total>)) scalar attaches — the
# canonical way to divide by a global count without a collect.
# drift_numeric_lp: crossJoin(broadcast(<1-row split-point array>)) feeding
# the map-side binning expression — the canonical distributed scalar attach
# (the alternative is a driver collect of the splits).
# tfidf_topk: crossJoin(broadcast(<1-row corpus doc count>)) for the idf
# denominator — same scalar-attach shape.
BNLJ_ALLOWED = {
    "embedding_topk",
    "embedding_near_dups",
    "cumulative_events_scan",
    "drift_psi",
    "drift_numeric_lp",
    "tfidf_topk",
    "unigram_logppl",  # crossJoin(broadcast(1-row total)) — scalar attach, like tfidf
    "dsir_weights",  # two crossJoin(broadcast(1-row smoothed totals)) — scalar attaches
}

# iterative/stateful queries execute eagerly inside (checkpoint/collect) —
# plan text only reflects the last round; still audited, just noted
_entry = importlib.import_module("__spark_entry__")
ALL = sorted(_entry.queries())


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in _entry.queries().items():
        df = fn(spark, SF_DIR)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


@pytest.mark.parametrize("name", ALL)
def test_no_cartesian_product(plans, name):
    assert "CartesianProduct" not in plans[name], f"{name} plans a cartesian product"


@pytest.mark.parametrize("name", ALL)
def test_nested_loop_only_where_intended(plans, name):
    if name in BNLJ_ALLOWED:
        return
    assert "BroadcastNestedLoopJoin" not in plans[name], (
        f"{name} fell back to BroadcastNestedLoopJoin — an equi-join key is "
        f"missing or a join condition stopped being an equality"
    )


def test_external_snapshot_is_broadcast(plans):
    assert "BroadcastHashJoin" in plans["external_contextual"]


def test_parquet_scans_are_column_pruned(spark):
    """The flagship's left scan must not read the text column it never uses."""
    df = _entry.queries()["asof_join_features"](spark, SF_DIR)
    scans = [
        line
        for line in df._jdf.queryExecution().executedPlan().toString().splitlines()
        if "FileScan parquet" in line and "ReadSchema" in line
    ]
    assert scans, "expected at least one parquet scan with ReadSchema in-line"
