"""Stats summarizer + PSI drift units (the oracle-matched contract queries
stats_summary / drift_psi carry the cross-engine check; these cover the
algebraic properties)."""

from __future__ import annotations

import pandas as pd

from chronon_spark.jobs.stats import categorical_psi, summarize
from chronon_spark.sources.synth import synth_transcripts


def test_summarize_matches_pandas(spark):
    ev = synth_transcripts(n_rows=1500, n_convs=15)
    got = summarize(spark.createDataFrame(ev), columns=["n_chars", "role"]).toPandas()
    got = {(r["column"], r["metric"]): r["value"] for _, r in got.iterrows()}
    assert got[("n_chars", "count")] == ev["n_chars"].notna().sum()
    assert got[("n_chars", "nulls")] == ev["n_chars"].isna().sum()
    assert got[("role", "distinct")] == ev["role"].nunique()
    assert abs(got[("n_chars", "mean")] - round(ev["n_chars"].mean(), 6)) < 1e-9
    assert got[("n_chars", "min")] == ev["n_chars"].min()
    assert got[("n_chars", "max")] == ev["n_chars"].max()


def test_summarize_approx_mode_runs(spark):
    ev = synth_transcripts(n_rows=500, n_convs=10)
    got = summarize(spark.createDataFrame(ev), columns=["conv_id"], approx=True).toPandas()
    d = got[got["metric"] == "distinct"]["value"].iloc[0]
    assert abs(d - ev["conv_id"].nunique()) <= 0.05 * ev["conv_id"].nunique() + 2


def test_psi_zero_for_identical_slices(spark):
    ev = synth_transcripts(n_rows=800, n_convs=10)
    df = spark.createDataFrame(ev)
    row = categorical_psi(df, df, "role").collect()[0]
    assert row["psi"] == 0.0
    assert row["n_categories"] == ev["role"].nunique()


def test_psi_positive_for_shifted_distribution(spark):
    ev = synth_transcripts(n_rows=800, n_convs=10)
    skew = pd.concat([ev, ev[ev["role"] == "tool"]] * 2, ignore_index=True)
    row = categorical_psi(
        spark.createDataFrame(ev), spark.createDataFrame(skew), "role"
    ).collect()[0]
    assert row["psi"] > 0.0


def test_categorical_lp_zero_for_identical_and_disjoint_extremes(spark):
    ev = synth_transcripts(n_rows=600, n_convs=10)
    df = spark.createDataFrame(ev)
    from chronon_spark.jobs.stats import categorical_lp_distances

    row = categorical_lp_distances(df, df, "role").collect()[0]
    assert row["linf"] == 0.0 and row["l2"] == 0.0 and row["l1"] == 0.0
    # fully disjoint categories: every bucket is one-sided -> L1 = 2, Linf = max mass
    a = spark.createDataFrame(pd.DataFrame({"c": ["x"] * 3 + ["y"] * 7}))
    b = spark.createDataFrame(pd.DataFrame({"c": ["z"] * 5}))
    row = categorical_lp_distances(a, b, "c").collect()[0]
    assert row["l1"] == 2.0 and row["linf"] == 1.0 and row["n_bins"] == 3


def test_numeric_drift_matches_numpy(spark):
    import numpy as np

    from chronon_spark.jobs.stats import numeric_drift

    rng = np.random.RandomState(7)
    va = rng.gamma(2.0, 10.0, 4000)
    vb = rng.gamma(2.4, 10.0, 3000)  # shifted shape -> real drift
    a = spark.createDataFrame(pd.DataFrame({"v": va}))
    b = spark.createDataFrame(pd.DataFrame({"v": vb}))
    row = numeric_drift(a, b, "v", bins=10).collect()[0]
    # numpy oracle: type-7 quantile splits from a, same rounding + binning
    splits = np.round(np.quantile(va, np.arange(1, 10) / 10.0), 6)
    ba = np.bincount(np.searchsorted(splits, va, side="right"), minlength=10) / len(va)
    bb = np.bincount(np.searchsorted(splits, vb, side="right"), minlength=10) / len(vb)
    d = np.abs(ba - bb)
    assert abs(row["linf"] - round(d.max(), 6)) <= 1e-6
    assert abs(row["l1"] - round(d.sum(), 6)) <= 1e-6
    assert abs(row["l2"] - round(float(np.sqrt((d * d).sum())), 6)) <= 1e-6
    assert row["n_bins"] == 10
    # identical slices -> zero drift regardless of splits
    z = numeric_drift(a, a, "v", bins=10).collect()[0]
    assert z["l1"] == 0.0 and z["linf"] == 0.0
    # approx (100 TB) path runs and stays close at this size
    ap = numeric_drift(a, b, "v", bins=10, approx=True).collect()[0]
    assert abs(ap["l1"] - row["l1"]) < 0.1


def test_tile_drift_series_hand_computed(spark):
    import datetime as dt

    from chronon_spark.jobs.stats import tile_drift_series

    # day1: 4 rows {a:2, b:2}; day2: 8 rows {a:6, b:2}; day3: 4 rows {b:4}
    rows = []
    for day, cats in [(1, "aabb"), (2, "aaaaaabb"), (3, "bbbb")]:
        for i, c in enumerate(cats):
            rows.append((dt.datetime(2024, 3, day, 10, i), c, float(i + 1)))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = {r["ds"].isoformat(): r for r in tile_drift_series(df, "ts", "event_type", "value").collect()}
    assert set(out) == {"2024-03-02", "2024-03-03"}
    d2 = out["2024-03-02"]
    assert d2["n"] == 8 and d2["count_change_pct"] == 100.0
    # hists: day1 (.5,.5) day2 (.75,.25) -> l1 = .25+.25, linf = .25
    assert abs(d2["hist_l1"] - 0.5) < 1e-9 and abs(d2["hist_linf"] - 0.25) < 1e-9
    d3 = out["2024-03-03"]
    assert d3["count_change_pct"] == -50.0
    # day2 (a:.75,b:.25) vs day3 (a:0,b:1) -> l1 = .75+.75, linf = .75
    assert abs(d3["hist_l1"] - 1.5) < 1e-9 and abs(d3["hist_linf"] - 0.75) < 1e-9
    # identical consecutive value distributions per construction at days 1->2?
    # values differ; just sanity: drift is finite and non-negative
    assert d2["pct_drift"] >= 0.0 and d3["pct_drift"] >= 0.0
