"""StagingQuery macro substitution + stepped, resumable execution."""

from __future__ import annotations

from chronon_spark.jobs.staging_query import render_macros, run_staging_query
from chronon_spark.sources.synth import synth_transcripts


def _setup_view(spark):
    pdf = synth_transcripts(n_rows=2000, n_convs=20)
    spark.createDataFrame(pdf).createOrReplaceTempView("transcripts_sq")


def test_render_macros(spark):
    _setup_view(spark)
    sql = """SELECT * FROM transcripts_sq
             WHERE ds BETWEEN {{ start_date }} AND {{ end_date }}
               AND ds <= {{ latest_date }} AND ds <= {{ max_date(table=transcripts_sq) }}"""
    out = render_macros(spark, sql, "2024-01-02", "2024-01-05")
    assert "'2024-01-02'" in out and "'2024-01-05'" in out
    assert "max_date" not in out and "{{" not in out
    assert spark.sql(out).count() > 0


def test_staging_query_stepped_resume(spark, tmp_path):
    _setup_view(spark)
    sql = """SELECT conv_id, ds, COUNT(*) AS n FROM transcripts_sq
             WHERE ds BETWEEN {{ start_date }} AND {{ end_date }} GROUP BY conv_id, ds"""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    r1 = run_staging_query(spark, sql, "2024-01-01", "2024-01-08", out, ckpt, step_days=4)
    assert r1["steps_total"] == 2 and r1["steps_computed"] == 2 and r1["rows_out"] > 0
    r2 = run_staging_query(spark, sql, "2024-01-01", "2024-01-08", out, ckpt, step_days=4)
    assert r2["steps_computed"] == 0 and r2["steps_skipped_resume"] == 2
    # partition coverage: every step only holds its own ds range
    step1 = spark.read.parquet(f"{out}/2024-01-01_2024-01-04")
    # partition-column inference reads ds back as DATE — compare as strings
    assert set(str(r[0]) for r in step1.select("ds").distinct().collect()) <= {
        "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"
    }


def test_staging_query_requires_ds(spark, tmp_path):
    _setup_view(spark)
    import pytest

    with pytest.raises(ValueError, match="ds"):
        run_staging_query(
            spark,
            "SELECT conv_id FROM transcripts_sq WHERE ds = {{ start_date }}",
            "2024-01-01",
            "2024-01-01",
            str(tmp_path / "o"),
            str(tmp_path / "c"),
        )
