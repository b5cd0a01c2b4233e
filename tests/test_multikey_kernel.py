"""Multikey (whole-bucket vectorized) kernel vs the per-key path: identical
results for every op, both boundary modes, sawtooth on/off, nulls, duplicate
timestamps, vector inputs, and keys present on only one side."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from chronon_spark.aggregators.kernels import (
    _US_D,
    EventColumns,
    MultiKeyEventColumns,
    compute_parts,
    compute_parts_multikey,
)
from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.sources.synth import synth_queries, synth_transcripts

ALL_OPS_GB = GroupBy(
    keys=["conv_id"],
    aggregations=[
        Aggregation("turn_idx", Op.COUNT, windows=("7d", "1h", None)),
        Aggregation("n_chars", Op.SUM, windows=("3d",)),
        Aggregation("n_chars", Op.AVERAGE, windows=("3d",)),
        Aggregation("n_chars", Op.MIN, windows=("3d",)),
        Aggregation("n_chars", Op.MAX, windows=("3d",)),
        Aggregation("n_chars", Op.VARIANCE, windows=("7d",)),
        Aggregation("n_chars", Op.SKEW, windows=("7d",)),
        Aggregation("n_chars", Op.KURTOSIS, windows=("7d",)),
        Aggregation("n_chars", Op.APPROX_PERCENTILE, windows=("7d",), percentiles=(0.25, 0.9)),
        Aggregation("text", Op.FIRST, windows=("7d",)),
        Aggregation("text", Op.LAST, windows=("7d",)),
        Aggregation("text", Op.FIRST_K, windows=("2d",), k=3),
        Aggregation("text", Op.LAST_K, windows=("2d",), k=3),
        Aggregation("n_chars", Op.TOP_K, windows=("7d",), k=2),
        Aggregation("n_chars", Op.BOTTOM_K, windows=("7d",), k=2),
        Aggregation("role", Op.UNIQUE_COUNT, windows=("7d",)),
        Aggregation("role", Op.HISTOGRAM, windows=("7d",)),
        Aggregation("role", Op.UNIQUE_TOP_K, windows=("7d",), k=2),
    ],
    tie_breakers=["turn_idx"],
)


def _perkey(ev, q, parts, include_equal, sawtooth):
    r_groups = {k: df for k, df in ev.groupby("conv_id", sort=False)}
    res = {p.output_name: {} for p in parts}
    for k, lsub in q.groupby("conv_id", sort=False):
        ec = EventColumns(r_groups.get(k, ev.iloc[0:0]), "tus", ["turn_idx"])
        feats = compute_parts(ec, parts, lsub["tus"].to_numpy("int64"), include_equal, sawtooth)
        for p in parts:
            res[p.output_name].update(dict(zip(lsub.index, feats[p.output_name])))
    return res


def _multikey(ev, q, parts, include_equal, sawtooth):
    joint = pd.concat([q["conv_id"], ev["conv_id"]], ignore_index=True)
    codes = pd.factorize(joint)[0]
    lcodes, rcodes = codes[: len(q)], codes[len(q) :]
    q_ts = q["tus"].to_numpy("int64")
    r_ts = ev["tus"].to_numpy("int64")
    base = (int(min(q_ts.min(), r_ts.min())) // _US_D) * _US_D
    block = int(max(q_ts.max(), r_ts.max())) - base + 2
    mec = MultiKeyEventColumns(ev, rcodes, r_ts, ["turn_idx"], base, block)
    return compute_parts_multikey(mec, parts, lcodes, q_ts, include_equal, sawtooth)


def _eq(a, b):
    if isinstance(a, (list, dict)) or isinstance(b, (list, dict)):
        return a == b
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, str) or isinstance(b, str):
        return a == b
    fa, fb = float(a), float(b)
    if np.isnan(fa) or np.isnan(fb):
        return np.isnan(fa) and np.isnan(fb)
    return abs(fa - fb) <= 1e-7 + 1e-7 * abs(fb)


@pytest.mark.parametrize("include_equal,sawtooth", [(False, False), (True, False), (False, True)])
def test_multikey_equals_perkey_all_ops(include_equal, sawtooth):
    ev = synth_transcripts(n_rows=3000, n_convs=40)
    ev["tus"] = ev["ts"].astype("int64")
    q = synth_queries(ev, n_queries=400)
    q["tus"] = q["ts"].astype("int64")
    # include queries for a key with no events at all
    q = pd.concat(
        [q, pd.DataFrame([{"conv_id": "conv_never", "tus": int(ev["tus"].iloc[0])}])],
        ignore_index=True,
    )
    parts = ALL_OPS_GB.parts()
    want = _perkey(ev, q, parts, include_equal, sawtooth)
    got = _multikey(ev, q, parts, include_equal, sawtooth)
    for p in parts:
        for i in range(len(q)):
            a, b = got[p.output_name][i], want[p.output_name][i]
            assert _eq(a, b), f"{p.output_name} row {i}: multikey={a!r} perkey={b!r}"


def test_multikey_vector_inputs():
    """Array-typed input columns auto-explode identically on both paths."""
    rng = np.random.default_rng(5)
    n = 600
    base = pd.Timestamp("2024-01-01").value // 1000
    ev = pd.DataFrame(
        {
            "conv_id": rng.choice([f"c{i}" for i in range(12)], n),
            "turn_idx": np.arange(n, dtype=np.int32),
            "vals": [
                None if rng.random() < 0.1 else list(rng.integers(0, 50, rng.integers(0, 4)))
                for _ in range(n)
            ],
            "tus": base + rng.integers(0, 10 * _US_D, n),
        }
    )
    q = ev[["conv_id", "tus"]].sample(n=150, random_state=1).reset_index(drop=True)
    gb = GroupBy(
        keys=["conv_id"],
        aggregations=[
            Aggregation("vals", Op.SUM, windows=("3d",)),
            Aggregation("vals", Op.COUNT, windows=("3d",)),
        ],
        tie_breakers=["turn_idx"],
        time_column="tus",
    )
    parts = gb.parts()
    want = _perkey(ev, q, parts, False, False)
    got = _multikey(ev, q, parts, False, False)
    for p in parts:
        for i in range(len(q)):
            assert _eq(got[p.output_name][i], want[p.output_name][i]), (p.output_name, i)
