"""PII scrub: detector counts, redaction order, URL domain extraction.

The contract-level gate (byte-equality of redacted text vs the DuckDB RE2
replay) lives in tools/check_oracle.py::pii_scrub; these tests pin the
detector semantics on hand-written strings.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chronon_spark.functions import pii


def _scrub(spark, text: str) -> dict:
    df = spark.createDataFrame([(text,)], "t string")
    row = df.select(
        *pii.pii_counts("t"), pii.redact_pii("t").alias("red")
    ).first()
    return row.asDict()


def test_email_and_phone(spark):
    r = _scrub(spark, "mail a.b+c@sub.ex.org or call 555-123-4567 now")
    assert r["email_n"] == 1 and r["phone_n"] == 1
    assert r["ssn_n"] == 0 and r["ipv4_n"] == 0 and r["ccnum_n"] == 0
    assert r["red"] == "mail <EMAIL> or call <PHONE> now"


def test_ssn_not_double_counted_as_phone(spark):
    # 3-2-4 is SSN only; 3-3-4 is phone only — redaction order must keep
    # them distinct (SSN removed before the phone pass runs)
    r = _scrub(spark, "ssn 123-45-6789 tel 123-456-7890")
    assert r["ssn_n"] == 1 and r["phone_n"] == 1
    assert r["red"] == "ssn <SSN> tel <PHONE>"


def test_ipv4_and_ccnum(spark):
    r = _scrub(spark, "from 10.0.255.1 card 4111111111111111 ok")
    assert r["ipv4_n"] == 1 and r["ccnum_n"] == 1
    assert r["red"] == "from <IPV4> card <CCNUM> ok"


def test_ccnum_word_boundary(spark):
    # 17 digits is not a card number; 12 digits is too short
    r = _scrub(spark, "x 12345678901234567 y 123456789012 z")
    assert r["ccnum_n"] == 0
    assert r["red"] == "x 12345678901234567 y 123456789012 z"


def test_clean_text_untouched(spark):
    s = "no personal data here, just words and 42 numbers"
    r = _scrub(spark, s)
    assert r["red"] == s
    assert all(r[f"{k}_n"] == 0 for k, _ in pii.PII_PATTERNS)


def test_extract_domains(spark):
    df = spark.createDataFrame(
        [("see https://a.ex.org/p/1 and http://b.ex.org plus https://a.ex.org/q",)],
        "t string",
    )
    got = df.select(F.explode(pii.extract_domains("t")).alias("d")).groupBy("d").count()
    assert {(r["d"], r["count"]) for r in got.collect()} == {
        ("a.ex.org", 2),
        ("b.ex.org", 1),
    }


def test_scrub_plan_is_single_projection(spark):
    # the whole scrub must stay one codegen projection over the scan —
    # no exchange, no python worker
    df = spark.range(100).select(F.concat(F.lit("u"), F.col("id"), F.lit("@x.org")).alias("t"))
    plan = df.select(*pii.pii_counts("t"), pii.redact_pii("t").alias("r"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
