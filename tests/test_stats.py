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
