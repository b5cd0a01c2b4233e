"""Distributed k-means vs a numpy brute-force twin implementing the exact
same contract (md5-ordered seeds, 3-dp-rounded per-dim sums, 6-dp-rounded
distances, first-min tie break, empty clusters keep their centroid)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chronon_spark.functions.clustering import kmeans_assign, kmeans_fit, kmeans_seeds

DIMS = 8


def _mk(spark, vecs: list[list[float]], ids: list[int] | None = None):
    ids = ids if ids is not None else list(range(len(vecs)))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    pdf = pd.DataFrame({"vec_id": ids, "embedding": [[float(x) for x in v] for v in vecs]})
    return spark.createDataFrame(pdf, schema=schema)


def _seeds_np(ids: list[int], X: np.ndarray, k: int) -> list[list[float]]:
    order = sorted(range(len(ids)), key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]))
    return [[float(x) for x in X[i]] for i in order[:k]]


def _r(x: float, nd: int) -> float:
    return round(x + 1.1641532182693481e-10, nd) + 0.0


def _assign_np(X: np.ndarray, cents: list[list[float]]) -> tuple[np.ndarray, np.ndarray]:
    n = len(X)
    dist = np.empty((n, len(cents)))
    for j, c in enumerate(cents):
        # sequential fold order, matching the Spark aggregate and DuckDB list_sum
        acc = np.zeros(n)
        for d in range(X.shape[1]):
            acc = acc + (X[:, d] - c[d]) * (X[:, d] - c[d])
        dist[:, j] = [_r(v, 6) for v in acc]
    a = dist.argmin(axis=1)  # first min on ties, same as array_position
    return a, dist[np.arange(n), a]


def _fit_np(ids: list[int], X: np.ndarray, k: int, iters: int) -> list[list[float]]:
    cents = _seeds_np(ids, X, k)
    for _ in range(iters):
        a, _d = _assign_np(X, cents)
        nxt = []
        for j in range(k):
            m = a == j
            if not m.any():
                nxt.append(cents[j])  # empty cluster keeps its centroid
                continue
            cnt = int(m.sum())
            nxt.append([_r(float(X[m, d].sum()), 3) / cnt for d in range(X.shape[1])])
        cents = nxt
    return cents


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    X = np.concatenate(
        [rng.normal(loc, 0.8, size=(40, DIMS)) for loc in (-4.0, 0.0, 5.0)]
    ).astype("float32")
    ids = list(range(len(X)))
    return ids, X.astype("float64")


def test_fit_and_assign_match_bruteforce(spark, data):
    ids, X = data
    df = _mk(spark, X.tolist(), ids)
    want_cents = _fit_np(ids, np.asarray([[float(np.float32(v)) for v in r] for r in X]), 3, 2)
    got_cents = kmeans_fit(df, k=3, iters=2, dims=DIMS)
    assert np.allclose(got_cents, want_cents, atol=1e-9)
    a_want, d_want = _assign_np(
        np.asarray([[float(np.float32(v)) for v in r] for r in X]), want_cents
    )
    got = kmeans_assign(df, got_cents).orderBy("vec_id").toPandas()
    assert got["cluster"].tolist() == a_want.tolist()
    assert np.allclose(got["dist"].to_numpy(), d_want, atol=1e-9)


def test_partitioning_invariance(spark, data):
    ids, X = data
    df = _mk(spark, X.tolist(), ids)
    c1 = kmeans_fit(df, k=3, iters=2, dims=DIMS)
    c2 = kmeans_fit(df.repartition(7), k=3, iters=2, dims=DIMS)
    assert c1 == c2  # 3-dp sum rounding makes the fit partitioning-exact


def test_empty_cluster_keeps_centroid(spark):
    # two coincident points and one far point, k=3: two seeds coincide, ties
    # assign both points to the lower cluster id, the duplicate seed's
    # cluster is empty and must keep its (seed) centroid
    vecs = [[0.0] * DIMS, [0.0] * DIMS, [10.0] * DIMS]
    df = _mk(spark, vecs)
    cents = kmeans_fit(df, k=3, iters=1, dims=DIMS)
    assert len(cents) == 3
    seeds = kmeans_seeds(df, 3)
    kept = [j for j in range(3) if cents[j] == seeds[j] and seeds[j] == [0.0] * DIMS]
    assert kept, "the empty duplicate-seed cluster must keep its seed centroid"


def test_assign_tie_breaks_to_lower_cluster(spark):
    df = _mk(spark, [[1.0] * DIMS])
    same = [[0.0] * DIMS, [2.0] * DIMS]  # equidistant from the point
    got = kmeans_assign(df, same).toPandas()
    assert got["cluster"].tolist() == [0]


def test_trained_centroids_drive_ivf(spark, data):
    """kmeans_fit output plugs into ivf_ann_topk as the coarse quantizer; on
    well-separated clusters with n_probe=1 the trained cells must give the
    same top-1 as brute force for every query (the fixed hash-recipe cells
    make no such guarantee — that's the point of training)."""
    from chronon_spark.functions.similarity import cosine_topk, ivf_ann_topk

    ids, X = data
    df = _mk(spark, X.tolist(), ids)
    cents = kmeans_fit(df, k=3, iters=2, dims=DIMS)
    queries = df.limit(5).withColumnRenamed("vec_id", "query_id")
    got = (
        ivf_ann_topk(df, queries, k=1, n_probe=1, dims=DIMS, centroids=cents)
        .orderBy("query_id")
        .toPandas()
    )
    want = cosine_topk(df, queries, k=1, dims=DIMS).orderBy("query_id").toPandas()
    assert got["neighbor_id"].tolist() == want["neighbor_id"].tolist()


def test_assign_plan_has_no_join(spark, data):
    ids, X = data
    df = _mk(spark, X.tolist(), ids)
    plan = kmeans_assign(df, [[0.0] * DIMS, [1.0] * DIMS])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan  # pure projection
