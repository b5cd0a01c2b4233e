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
