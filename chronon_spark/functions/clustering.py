"""Distributed k-means (Lloyd's) over embedding columns — the trained
counterpart to the fixed coarse quantizers in ``similarity.py`` (IVF's
hash-recipe Voronoi cells, SemDeDup's sign-random-projection cells).

Reference parity: the reference has no clustering operator (its embedding
story stops at the serving fetch); this is one of the driver-mandated
training-data-pipeline additions (SURVEY.md §8, "Training-data pipeline").
SemDeDup (Abbas et al. 2023, arXiv:2303.09540) clusters with k-means before
the within-cluster cosine sweep — ``kmeans_fit`` + ``semdedup``'s cell column
replaced by ``kmeans_assign`` reproduces the paper's pipeline exactly.

Scale shape (the part that matters at 100 TB):
- assignment is a per-row projection — no join, no shuffle; the centroid
  set (k x dims doubles) rides the plan as literals (k*dims <= ~64k values
  stays well under plan-size limits; beyond that use the Arrow kernel).
- the update step is ONE partial aggregation: groupBy(cluster) over k*dims
  running sums — map-side combine reduces each task to k rows of dims sums,
  the shuffle is k x dims doubles per task regardless of input rows.
- driver traffic per iteration is exactly k x (dims + 1) numbers (the new
  centroids), the same bounded-planning-metadata class as the hot-key stats
  in ``operators/slicing.py``.

Determinism / oracle parity: seeds are the k rows with the smallest
md5(id) (hash-based, partitioning-invariant — no rand()); per-dim sums are
rounded to 3 dp and distances to 6 dp (the repo-wide float-edge guard, see
``contracts/ops.py::r4``), so a SQL engine unrolling the same iterations
reproduces every centroid and every assignment bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chronon_spark.rounding import NUDGE_6DP

__all__ = ["kmeans_seeds", "kmeans_fit", "kmeans_assign"]


def _r(c: Column, nd: int) -> Column:
    # half-tie nudge + signed-zero normalization, both mirrored in the oracle
    return F.round(c + F.lit(NUDGE_6DP), nd) + F.lit(0.0)


def _dist2(vec_col: Column, cent: list[float]) -> Column:
    """Squared euclidean distance to one centroid, sequential fold order
    (bitwise-reproducible across engines up to the 6-dp rounding)."""
    carr = F.array(*[F.lit(float(v)) for v in cent])
    return F.aggregate(
        F.zip_with(vec_col, carr, lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _scores(vec_col: Column, centroids: list[list[float]]) -> Column:
    return F.array(*[_r(_dist2(vec_col, c), 6) for c in centroids])


def kmeans_seeds(
    corpus: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic seeds: the k vectors with the smallest md5(id) (ties by
    id). Hash-ordering is a uniform pseudo-random draw that every engine and
    every partitioning reproduces — the engine-wide no-rand() rule."""
    rows = (
        corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .where(F.col("__id").isNotNull() & F.col("__v").isNotNull())
        .withColumn("__h", F.md5(F.col("__id").cast("string").cast("binary")))
        .orderBy("__h", "__id")
        .limit(k)  # TakeOrdered: k rows to the driver, bounded planning data
        .collect()
    )
    return [[float(x) for x in r["__v"]] for r in rows]


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd's iterations, DataFrame-native. Each iteration: per-row nearest-
    centroid assignment (projection, zero shuffle) + ONE partial aggregation
    for the per-(cluster, dim) sums. Empty clusters keep their previous
    centroid (the standard convention; the oracle does the same)."""
    cents = kmeans_seeds(corpus, k, id_col, vec_col)
    if not cents:
        raise ValueError("kmeans_fit: corpus has no non-null vectors")
    v = F.col(vec_col)
    # same row population as kmeans_seeds and the SQL oracle's base CTE
    # (id AND vector non-null) — a null-id row entering only the assignment
    # step would train centroids the oracle can't reproduce
    fit_rows = corpus.where(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
    for _ in range(iters):
        scores = _scores(v, cents)
        assigned = fit_rows.select(
            (F.array_position(scores, F.array_min(scores)) - 1).alias("__c"), vec_col
        )
        stats = assigned.groupBy("__c").agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                _r(F.sum(F.element_at(v, d + 1).cast("double")), 3).alias(f"__s{d}")
                for d in range(dims)
            ],
        )
        rows = {int(r["__c"]): r for r in stats.collect()}  # k rows max
        cents = [
            [rows[j][f"__s{d}"] / rows[j]["__n"] for d in range(dims)] if j in rows else cents[j]
            for j in range(len(cents))
        ]
    return cents


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    dist_col: str | None = "dist",
) -> DataFrame:
    """Attach the nearest-centroid id (0-based; distance ties break to the
    lower cluster id — ``array_position`` takes the FIRST minimum, exactly
    DuckDB's ``list_position``) and optionally the 6-dp rounded distance."""
    scores = _scores(F.col(vec_col), centroids)
    out = df.withColumn("__scores", scores).withColumn(
        cluster_col, (F.array_position(F.col("__scores"), F.array_min("__scores")) - 1).cast("int")
    )
    if dist_col:
        out = out.withColumn(dist_col, F.array_min("__scores"))
    return out.drop("__scores")
