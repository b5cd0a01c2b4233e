"""Similarity search over embedding columns (`array<float>`).

- `cosine_topk`: exact brute-force top-k — the correctness baseline. The
  query set is broadcast (it is small by construction), so the corpus streams
  through map-side only: NO shuffle of the corpus, one narrow pass + a
  per-query top-k via window rank.
- `lsh_ann_topk`: random-hyperplane LSH — the 100 TB path. Hyperplane
  components are derived deterministically from md5 digits (portable to the
  SQL oracle), vectors hash to a bucket signature per table, candidates =
  bucket-mates, then exact cosine re-rank. Corpus-side cost is per-row
  codegen + one equi-join on (table, bucket).

All float math is sequential float64 (`F.aggregate` left fold), which DuckDB's
`list_sum(list_transform(...))` reproduces bitwise — verified, so oracles can
compare unrounded ranks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential float64 dot product (bitwise-reproducible fold order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. `queries` must be small
    (it is broadcast); corpus scan stays map-side, then one shuffle on
    query_id for the rank — k rows per query survive the partial top-k
    (AQE + window group limit push partial filtering map-side)."""
    q = F.broadcast(queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv")))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = q.crossJoin(c).where(F.col(query_id_col) != F.col("neighbor_id"))
    scored = scored.select(
        query_id_col, "neighbor_id", cosine(F.col("__qv"), F.col("__cv")).alias("cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cos")
    )


def near_dup_pairs(
    df: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """All pairs with cosine ≥ threshold. Brute force O(N²) — correct at any
    N but quadratic; at corpus scale route through `lsh_ann_topk` buckets
    first (same verify expression)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos")).where(
        F.col("cos") >= threshold
    )


# ---------------------------------------------------------------- LSH ANN


def plane_components(table: int, plane: int, dims: int) -> list[float]:
    """Deterministic pseudo-random hyperplane in [-7.5, 7.5]^dims: the value
    of the first md5 hex digit of "table:plane:dim", centered. Precomputed
    driver-side (they are constants) and embedded as literals — both the
    Spark plan and the SQL oracle reproduce them from the same recipe."""
    import hashlib

    return [
        int(hashlib.md5(f"{table}:{plane}:{d}".encode()).hexdigest()[0], 16) - 7.5
        for d in range(dims)
    ]


def lsh_bucket(vec_col: Column, table: int, n_planes: int, dims: int) -> Column:
    """Random-hyperplane signature: bit p = sign(v · plane_p) packed to a long."""
    acc = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in plane_components(table, p, dims)])
        proj = F.aggregate(
            F.zip_with(vec_col, plane, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc2, x: acc2 + x,
        )
        acc = acc + (proj > 0).cast("long") * F.lit(1 << p)
    return acc


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_tables: int = 4,
    n_planes: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing an LSH bucket with the
    query in ANY of `n_tables` tables; exact cosine re-rank on candidates.

    Scale shape: corpus-side buckets are per-row codegen; the only corpus
    shuffle is the equi-join on (table, bucket) against the (broadcast-sized)
    query buckets. Recall tunes with n_tables; precision with n_planes.
    """
    def bucketed(df: DataFrame, idc: str, alias: str) -> DataFrame:
        buckets = F.array(*[lsh_bucket(F.col(vec_col), t, n_planes, dims) for t in range(n_tables)])
        return df.select(
            F.col(idc), F.col(vec_col).alias(alias), F.posexplode(buckets).alias("tbl", "bucket")
        )

    cq = F.broadcast(bucketed(queries, query_id_col, "__qv"))
    cc = bucketed(corpus, id_col, "__cv").withColumnRenamed(id_col, "neighbor_id")
    cand = (
        cq.join(cc, ["tbl", "bucket"])
        .where(F.col(query_id_col) != F.col("neighbor_id"))
        .dropDuplicates([query_id_col, "neighbor_id"])
    )
    scored = cand.select(query_id_col, "neighbor_id", cosine(F.col("__qv"), F.col("__cv")).alias("cos"))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cos")
    )
