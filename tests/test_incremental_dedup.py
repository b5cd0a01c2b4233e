"""Incremental (batch-vs-corpus) minhash dedup: candidates never include a
corpus-vs-corpus pair, a persisted index short-circuits corpus re-signing,
and results agree with the full self-join restricted to batch rows."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from chronon_spark.functions.dedup import (
    build_minhash_index,
    incremental_minhash_dedup,
    minhash_lsh_dedup,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog tonight",
        "pack my box with five dozen liquor jugs again today",
        "sphinx of black quartz judge my vow said the king",
        "how vexingly quick daft zebras jump over the fence",
    ]
    rows = []
    for i in range(40):
        t = base[i % 4]
        if i % 10 == 7:  # batch rows: near-dups of corpus rows
            t = t + " extra"
        rows.append((i, t))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _split(docs):
    return docs.where(F.col("doc_id") % 10 != 7), docs.where(F.col("doc_id") % 10 == 7)


def test_matches_full_selfjoin_restricted(spark, docs):
    corpus, new = _split(docs)
    inc = incremental_minhash_dedup(corpus, new, "doc_id", "text").toPandas()
    full = minhash_lsh_dedup(docs, "doc_id", "text").toPandas()
    # full self-join pairs where at least one side is a batch row, keyed
    # (new, old): for batch-batch pairs new=greater id
    batch_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    want = set()
    for _, r in full.iterrows():
        a, b = int(r["id_a"]), int(r["id_b"])
        if a in batch_ids and b in batch_ids:
            want.add((max(a, b), min(a, b)))
        elif b in batch_ids:
            want.add((b, a))
        elif a in batch_ids:
            want.add((a, b))
    got = {(int(r.id_new), int(r.id_old)) for r in inc.itertuples()}
    assert got == want and len(got) > 0


def test_no_corpus_corpus_pairs(spark, docs):
    corpus, new = _split(docs)
    inc = incremental_minhash_dedup(corpus, new, "doc_id", "text").toPandas()
    batch_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    assert (inc["id_new"].isin(batch_ids)).all()
    corpus_rows = inc[inc["vs"] == "corpus"]
    assert (~corpus_rows["id_old"].isin(batch_ids)).all()
    batch_rows = inc[inc["vs"] == "batch"]
    assert (batch_rows["id_old"].isin(batch_ids)).all()
    assert (batch_rows["id_old"] < batch_rows["id_new"]).all()


def test_precomputed_index_equivalent(spark, docs):
    corpus, new = _split(docs)
    idx = build_minhash_index(corpus, "doc_id", "text")
    via_index = incremental_minhash_dedup(
        corpus, new, "doc_id", "text", corpus_index=idx
    ).toPandas()
    direct = incremental_minhash_dedup(corpus, new, "doc_id", "text").toPandas()
    key = ["id_new", "id_old", "vs"]
    a = via_index.sort_values(key).reset_index(drop=True)
    b = direct.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_index_shape(spark, docs):
    corpus, _ = _split(docs)
    idx = build_minhash_index(corpus, "doc_id", "text", num_hashes=16, bands=4)
    n_docs = corpus.count()
    assert idx.count() == n_docs * 4
    assert set(idx.columns) == {"doc_id", "band_idx", "band_key"}
