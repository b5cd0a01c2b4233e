"""DSIR importance resampling (functions/dsir.py — Xie et al. 2023).

Checks: (1) log weights match a pure-python reference (hashed-ngram
multinomial LLR) exactly; (2) docs resembling the target score higher;
(3) Gumbel-top-k resampling is deterministic and partitioning-invariant;
(4) the contract query's Spark/DuckDB sides agree at test scale."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest

from chronon_spark.functions.dsir import dsir_log_weights, dsir_resample

B = 256


def _bucket(term: str) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % B


def _feats(text: str) -> Counter:
    ws = text.strip().split()
    grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    return Counter(_bucket(g) for g in grams)


def _py_weights(raw: dict[int, str], target: dict[int, str]) -> dict[int, float]:
    q_cnt, p_cnt = Counter(), Counter()
    for t in raw.values():
        q_cnt.update(_feats(t))
    for t in target.values():
        p_cnt.update(_feats(t))
    q_tot = sum(q_cnt.values()) + B
    p_tot = sum(p_cnt.values()) + B
    out = {}
    for i, t in raw.items():
        out[i] = sum(
            c * (math.log((p_cnt[b] + 1) / p_tot) - math.log((q_cnt[b] + 1) / q_tot))
            for b, c in _feats(t).items()
        )
    return out


@pytest.fixture(scope="module")
def corpora(spark):
    raw = {
        1: "the cat sat on the mat",
        2: "der hund lief durch den park",
        3: "the dog ran in the park",
        4: "la casa es muy grande hoy",
        5: "cats and dogs play in the park",
        6: "el perro corre por el parque",
    }
    target = {k: v for k, v in raw.items() if k in (1, 3, 5)}  # the English slice
    raw_df = spark.createDataFrame(list(raw.items()), "doc_id long, text string")
    tgt_df = spark.createDataFrame(list(target.items()), "doc_id long, text string")
    return raw, target, raw_df, tgt_df


def test_weights_match_python_reference(corpora):
    raw, target, raw_df, tgt_df = corpora
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(raw_df, tgt_df, n_buckets=B).collect()
    }
    want = _py_weights(raw, target)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(round(want[k], 6), abs=2e-6), k


def test_target_like_docs_rank_higher(corpora):
    raw, target, raw_df, tgt_df = corpora
    w = {r["doc_id"]: r["log_weight"] for r in dsir_log_weights(raw_df, tgt_df, n_buckets=B).collect()}
    en = [w[k] for k in (1, 3, 5)]
    other = [w[k] for k in (2, 4, 6)]
    assert min(en) > max(other)


def test_resample_deterministic_and_partition_invariant(corpora):
    _, _, raw_df, tgt_df = corpora
    a = [r["doc_id"] for r in dsir_resample(raw_df, tgt_df, k=3, n_buckets=B).collect()]
    b = [r["doc_id"] for r in dsir_resample(raw_df.repartition(7), tgt_df, k=3, n_buckets=B).collect()]
    assert a == b and len(a) == 3


def test_contract_query_matches_duckdb(spark, tmp_path):
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from chronon_spark.contracts.corpus import _SQL_DSIR_WEIGHTS, _q_dsir_weights

    docs = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [
                ("the quick brown fox jumps over the lazy dog number %d" % i)
                if i % 3
                else ("der schnelle braune fuchs springt nummer %d" % i)
                for i in range(40)
            ],
            "lang": ["en" if i % 3 else "de" for i in range(40)],
            "source": ["web"] * 40,
            "n_chars": [10] * 40,
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet", index=False)
    got = _q_dsir_weights(spark, str(sf)).toPandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(_SQL_DSIR_WEIGHTS).df().sort_values("doc_id").reset_index(drop=True)
    assert got["n_feats"].tolist() == want["n_feats"].astype(int).tolist()
    assert got["log_weight"].tolist() == pytest.approx(want["log_weight"].tolist(), abs=1e-9)


def test_null_text_docs_drop_consistently(spark):
    """NULL-text docs get no weight row (documented contract), and the DuckDB
    mirror drops them identically — no silent cross-engine divergence."""
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    raw = spark.createDataFrame(
        [(1, "the cat"), (2, None), (3, "the dog")], "doc_id long, text string"
    )
    tgt = spark.createDataFrame([(1, "the cat")], "doc_id long, text string")
    got = dsir_log_weights(raw, tgt, n_buckets=B).toPandas()
    assert sorted(got["doc_id"]) == [1, 3]  # null-text doc 2 absent
