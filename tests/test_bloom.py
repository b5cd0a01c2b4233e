"""Bloom-filter key pushdown (operators/bloom.py) — the reference's
large-left mode (Join.scala:268-285, threshold catalog/TableUtils.scala:54-63).

Checks: (1) numpy bloom kernel has no false negatives and bounded false
positives; (2) bloom-filtered right is a superset of the exact semi-filtered
right and never drops a left-matching event; (3) as-of join results are
identical with prefilter='bloom'; (4) multi-column keys hash as tuples."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.operators.asof_join import asof_join, prefilter_right_keys
from chronon_spark.operators.bloom import (
    _set_bits,
    _test_bits,
    bloom_filter_keys,
    bloom_params,
)
from chronon_spark.sources.synth import synth_queries, synth_transcripts
from tests.oracle import assert_frames_allclose


def test_bloom_kernel_no_false_negatives_bounded_fp():
    rng = np.random.default_rng(7)
    members = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    others = rng.integers(-(2**62), 2**62, size=50_000, dtype=np.int64)
    others = np.setdiff1d(others, members)
    m_bits, k = bloom_params(members.size, fpp=0.01)
    bm = np.zeros(m_bits // 64, dtype=np.uint64)
    _set_bits(bm, members, k)
    assert _test_bits(bm, members, k).all(), "false negative"
    fp = _test_bits(bm, others, k).mean()
    assert fp < 0.03, f"false-positive rate {fp:.4f} >> target 0.01"


def test_bloom_params_shape():
    m, k = bloom_params(1_000_000, fpp=0.01)
    assert m % 64 == 0
    assert 9 <= m / 1_000_000 <= 11  # ~9.6 bits/key at 1% fpp
    assert k in (6, 7, 8)


@pytest.fixture(scope="module")
def events(spark):
    pdf = synth_transcripts(n_rows=4000, n_convs=40)
    return pdf, spark.createDataFrame(pdf)


def test_bloom_superset_of_exact_and_complete(spark, events):
    pdf, right = events
    keep = sorted(pdf["conv_id"].unique())[:11]
    left = spark.createDataFrame(pdf[pdf["conv_id"].isin(keep)][["conv_id"]].drop_duplicates())
    exact = prefilter_right_keys(left, right, {"conv_id": "conv_id"}, mode="semi")
    bloomed = bloom_filter_keys(left, right, {"conv_id": "conv_id"})
    n_exact, n_bloom, n_all = exact.count(), bloomed.count(), right.count()
    assert n_exact <= n_bloom <= n_all
    # no event whose key IS on the left may be dropped (no false negatives)
    assert bloomed.join(left, "conv_id", "left_semi").count() == n_exact


def test_asof_join_with_bloom_prefilter_exact(spark, events):
    pdf, right = events
    q = synth_queries(pdf, n_queries=120)
    keep = sorted(pdf["conv_id"].unique())[:9]
    left = spark.createDataFrame(q[q["conv_id"].isin(keep)].reset_index(drop=True))
    gb = GroupBy(
        keys=["conv_id"],
        aggregations=[
            Aggregation("turn_idx", Op.COUNT, windows=("7d",)),
            Aggregation("n_chars", Op.SUM, windows=("2d",)),
        ],
        tie_breakers=["turn_idx"],
    )
    base = asof_join(left, right, gb).toPandas()
    got = asof_join(left, right, gb, prefilter="bloom").toPandas()
    assert_frames_allclose(got, base, sort_by=["query_id"])


def test_bloom_multi_column_keys(spark, events):
    pdf, right = events
    # key = (conv_id, role): tuple membership, not per-column membership
    pairs = pdf[["conv_id", "role"]].drop_duplicates()
    chosen = pairs.iloc[:7]
    left = spark.createDataFrame(chosen)
    bloomed = bloom_filter_keys(left, right, {"conv_id": "conv_id", "role": "role"})
    exact = prefilter_right_keys(
        left, right, {"conv_id": "conv_id", "role": "role"}, mode="semi"
    )
    assert bloomed.join(left, ["conv_id", "role"], "left_semi").count() == exact.count()
    # a row matching conv_id of one pair and role of another must not be let
    # through by construction of the hash (tuple-hashed): sanity via counts
    assert bloomed.count() <= right.count()
