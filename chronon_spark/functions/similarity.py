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
    dims: int | None = 64,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. `queries` must be small
    (it is broadcast); corpus scan stays map-side, then one shuffle on
    query_id for the rank — k rows per query survive the partial top-k
    (AQE + window group limit push partial filtering map-side).

    `dims` routes the scoring through the Arrow kernel (bitwise-equal to the
    fold — see vec_kernels.py); pass None for the pure-expression path."""
    from chronon_spark.functions.vec_kernels import cosine_arrow

    from chronon_spark.functions.dedup import ensure_parallelism

    q = F.broadcast(queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv")))
    c = ensure_parallelism(corpus).select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = q.crossJoin(c).where(F.col(query_id_col) != F.col("neighbor_id"))
    scored = scored.select(
        query_id_col,
        "neighbor_id",
        (cosine_arrow(F.col("__qv"), F.col("__cv"), dims) if dims else cosine(F.col("__qv"), F.col("__cv"))).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cos")
    )


def near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
    n_blocks: int | None = None,
    n_tables: int = 16,
    n_planes: int = 8,
    dims: int = 64,
) -> DataFrame:
    """All pairs with cosine ≥ threshold.

    Two physical strategies, picked by how selective the threshold is:

    - ``lsh`` — hyperplane-LSH bucket candidates + exact-cosine verify. Right
      for genuine near-duplicate thresholds (≥ ~0.8, angle ≤ 37°): per-plane
      collision probability 1 − θ/π ≥ 0.8, so a few tables give ~certain
      recall while buckets stay tiny. WRONG for loose thresholds: at 0.4 the
      per-plane probability is 0.63 and certain recall needs hundreds of
      tables — more work than the exact path.
    - ``blocked`` — EXACT all-pairs via hash-blocking: rows replicate to
      B block-pair groups and each group's cross product runs as one BLAS
      matrix multiply inside an Arrow kernel. Work is inherently O(N²) FLOPs
      (exact dense all-pairs admits no pruning), but there is NO Catalyst
      row-level cartesian — the join enumerates B(B+1)/2 block pairs, shuffle
      volume is N·(B+1)/2 rows, per-task memory is two blocks, and the inner
      loop is numpy `@` instead of per-pair expression evaluation.

    ``auto`` routes threshold ≥ 0.8 to lsh, else blocked.
    """
    from chronon_spark.functions.dedup import ensure_parallelism

    df = ensure_parallelism(df)
    if method == "auto":
        method = "lsh" if threshold >= 0.8 else "blocked"
    if method == "bruteforce":
        return near_dup_pairs_bruteforce(df, threshold, id_col, vec_col)
    if method == "lsh":
        return _near_dup_pairs_lsh(df, threshold, id_col, vec_col, n_tables, n_planes, dims)
    return _near_dup_pairs_blocked(df, threshold, id_col, vec_col, n_blocks)


def near_dup_pairs_bruteforce(
    df: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Reference oracle: per-pair sequential-fold cosine over a non-equi self
    join. O(N²) rows through Catalyst — tests only."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos")
    ).where(F.col("cos") >= threshold)


def _near_dup_pairs_lsh(
    df: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    n_tables: int,
    n_planes: int,
    dims: int,
) -> DataFrame:
    """Bucket-mate candidates (pair kept only in its FIRST colliding table —
    a projection predicate over the small bucket arrays, no dedup shuffle),
    then join BACK to the vectors for the exact verify: the candidate join
    moves only (id, table, bucket, bucket-array), never the embeddings."""
    from chronon_spark.functions.vec_kernels import cosine_arrow, lsh_buckets_arrow

    buckets = lsh_buckets_arrow(F.col(vec_col), n_tables, n_planes, dims)
    bk = df.select(F.col(id_col).alias("doc_id"), buckets.alias("bks"))
    banded = bk.select("doc_id", "bks", F.posexplode("bks").alias("tbl", "bucket"))
    a = banded.select("tbl", "bucket", F.col("doc_id").alias("id_a"), F.col("bks").alias("bks_a"))
    b = banded.select(
        F.col("tbl").alias("tbl_b"), F.col("bucket").alias("bucket_b"),
        F.col("doc_id").alias("id_b"), F.col("bks").alias("bks_b"),
    )
    cand = a.join(
        b, (a.tbl == b.tbl_b) & (a.bucket == b.bucket_b) & (a.id_a < b.id_b), "inner"
    )
    first_tbl = F.lit(True)
    for j in range(n_tables - 1):
        first_tbl = first_tbl & (
            (F.col("tbl") <= j) | (F.element_at("bks_a", j + 1) != F.element_at("bks_b", j + 1))
        )
    cand = cand.where(first_tbl).select("id_a", "id_b")
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(cosine_arrow(F.col("va"), F.col("vb"), dims), 6).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def _near_dup_pairs_blocked(
    df: DataFrame, threshold: float, id_col: str, vec_col: str, n_blocks: int | None
) -> DataFrame:
    """Exact all-pairs: hash rows into B blocks, enumerate the B(B+1)/2 block
    pairs, run each pair's cross product as one float64 matrix multiply in an
    Arrow kernel. cos is rounded to 6 decimals (BLAS reassociates the dot sum;
    1e-15-level reassociation error cannot flip a 1e-6 rounding boundary)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = df.sparkSession
    if n_blocks is None:
        n = df.count()
        n_blocks = max(1, -(-n // 2000))  # ~2k vectors per block
    base = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("blk"),
    )
    pairs = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)], "bi int, bj int"
    )
    # side A owns block bi of every pair, side B block bj; a (row, row) pair
    # meets exactly once, in the (min_blk, max_blk) group
    a = base.join(pairs, base.blk == pairs.bi).select("bi", "bj", F.col("vid").alias("ida"), F.col("vec").alias("va"))
    b = base.join(pairs, base.blk == pairs.bj).select(
        F.col("bi").alias("bi_b"), F.col("bj").alias("bj_b"), F.col("vid").alias("idb"), F.col("vec").alias("vb")
    )
    out_schema = T.StructType(
        [
            T.StructField("id_a", df.schema[id_col].dataType, False),
            T.StructField("id_b", df.schema[id_col].dataType, False),
            T.StructField("cos", T.DoubleType(), False),
        ]
    )

    def kernel(apdf: pd.DataFrame, bpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(apdf) or not len(bpdf):
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        ma = np.stack(apdf["va"].to_numpy()).astype("float64")
        mb = np.stack(bpdf["vb"].to_numpy()).astype("float64")
        ma /= np.linalg.norm(ma, axis=1, keepdims=True)
        mb /= np.linalg.norm(mb, axis=1, keepdims=True)
        ia = apdf["ida"].to_numpy()
        ib = bpdf["idb"].to_numpy()
        diag = apdf["bi"].iat[0] == apdf["bj"].iat[0]
        # Tile the (|A| × |B|) similarity matrix: the full matrix for a 2k×2k
        # block is 32 MB of FRESH pages per task (this host faults them in at
        # ~10 MB/s); a 512-row tile is 8 MB reused across tiles AND tasks
        # (worker processes are reused), so page-provisioning is paid once.
        tile = 512
        buf = np.empty((min(tile, len(ma)), len(mb)), dtype="float64")
        hitbuf = np.empty_like(buf, dtype=bool)
        out_a, out_b, out_cos = [], [], []
        for s in range(0, len(ma), tile):
            e = min(s + tile, len(ma))
            h = e - s
            np.dot(ma[s:e], mb.T, out=buf[:h])
            np.round(buf[:h], 6, out=buf[:h])
            np.greater_equal(buf[:h], threshold, out=hitbuf[:h])
            if diag:
                # diagonal block: each unordered pair appears twice — keep a < b
                hitbuf[:h] &= ia[s:e, None] < ib[None, :]
            r, c = np.nonzero(hitbuf[:h])
            # blocks are hash-assigned, so either id may be the smaller: normalize
            out_a.append(np.minimum(ia[s + r], ib[c]))
            out_b.append(np.maximum(ia[s + r], ib[c]))
            out_cos.append(buf[:h][r, c])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cos": np.concatenate(out_cos),
            }
        )

    return (
        a.groupby("bi", "bj")
        .cogroup(b.groupby("bi_b", "bj_b"))
        .applyInPandas(kernel, schema=out_schema)
    )


# ---------------------------------------------------------------- IVF ANN


def ivf_centroid_components(centroid: int, dims: int) -> list[float]:
    """Deterministic coarse-quantizer centroid in [-7.5, 7.5]^dims (same md5
    recipe as the LSH hyperplanes — portable to the SQL oracle). Voronoi
    cells of fixed random points are a valid IVF coarse quantizer: data-
    trained k-means centroids only tighten the cells, the probe/re-rank
    machinery is identical."""
    import hashlib

    return [
        int(hashlib.md5(f"ivf:{centroid}:{d}".encode()).hexdigest()[0], 16) - 7.5
        for d in range(dims)
    ]


def _ivf_scores(vec_col: Column, n_centroids: int, dims: int) -> Column:
    """score_j = <v, c_j> − ‖c_j‖²/2 — argmax(score) ≡ argmin euclidean
    (‖v‖² is constant per row)."""
    cols = []
    for j in range(n_centroids):
        comp = ivf_centroid_components(j, dims)
        c = F.array(*[F.lit(v) for v in comp])
        half_norm = sum(v * v for v in comp) / 2.0
        cols.append(dot(vec_col, c) - F.lit(half_norm))
    return F.array(*cols)


def ivf_cell(vec_col: Column, n_centroids: int = 16, dims: int = 64) -> Column:
    """1-based nearest-centroid cell id (first max on ties — both engines'
    array_position/list_position semantics)."""
    scores = _ivf_scores(vec_col, n_centroids, dims)
    return F.array_position(scores, F.array_max(scores))


SEMDEDUP_TABLE = 97  # plane-recipe namespace reserved for semdedup cells


def semdedup(
    corpus: DataFrame,
    threshold: float,
    n_planes: int = 4,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    cluster embeddings with a coarse quantizer — here sign-random-projection
    buckets (``lsh_bucket``, 2^n_planes cells), which spread ANY distribution
    where fixed Voronoi centroids can degenerate — then WITHIN each cell drop
    every vector whose cosine to a lower-id member is >= threshold; the kept
    representative in ``dup_of`` is the smallest such lower id
    (deterministic, order-free).

    Returns one row per input vector: (id, cell, dropped, dup_of).

    Scale shape: pair generation is cell-scoped — ONE equi-join on cell id,
    never corpus x corpus; n_planes grows with the corpus to bound cell
    sizes. Cosines are rounded to 6 dp before the threshold compare (same
    guard as embedding near-dup) so SQL-oracle comparison is float-edge-proof."""
    from chronon_spark.functions.vec_kernels import cosine_arrow

    c = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket(F.col(vec_col), SEMDEDUP_TABLE, n_planes, dims).alias("cell"),
    )
    a = c.select(F.col(id_col).alias("__ida"), F.col(vec_col).alias("__va"), "cell")
    b = c.select(F.col(id_col).alias("__idb"), F.col(vec_col).alias("__vb"), "cell")
    hits = (
        a.join(b, on="cell")
        .where(F.col("__ida") < F.col("__idb"))
        .where(F.round(cosine_arrow(F.col("__va"), F.col("__vb"), dims), 6) >= threshold)
        .groupBy("__idb")
        .agg(F.min("__ida").alias("dup_of"))
    )
    return c.join(hits, c[id_col] == hits["__idb"], "left").select(
        F.col(id_col),
        F.col("cell"),
        F.col("dup_of").isNotNull().alias("dropped"),
        F.col("dup_of"),
    )


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: corpus vectors live in their nearest-
    centroid cell; a query probes its `n_probe` nearest cells and exact-
    cosine re-ranks the members.

    Scale shape: the inverted file IS the partitioning — corpus-side cell
    assignment is per-row codegen, the only corpus shuffle is the equi-join
    on cell id against the (broadcast) probe list. Recall tunes with
    n_probe/n_centroids. Probe selection uses a rank expression
    (#{j' better than j} < n_probe, ties to the lower index) instead of a
    sort so the SQL oracle reproduces it without sort-order ambiguity."""
    from chronon_spark.functions.vec_kernels import (
        cosine_arrow,
        ivf_cell_arrow,
        ivf_probe_cells_arrow,
    )

    if centroids is not None:
        n_centroids = len(centroids)
    cq = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qv"),
        ivf_probe_cells_arrow(F.col(vec_col), n_centroids, n_probe, dims, centroids).alias(
            "__probe"
        ),
    )
    cq = cq.select(query_id_col, "__qv", F.explode("__probe").alias("cell"))
    cc = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        ivf_cell_arrow(F.col(vec_col), n_centroids, dims, centroids).alias("cell"),
    )
    cand = F.broadcast(cq).join(cc, "cell").where(F.col(query_id_col) != F.col("neighbor_id"))
    scored = cand.select(
        query_id_col, "neighbor_id", cosine_arrow(F.col("__qv"), F.col("__cv"), dims).alias("cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cos")
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
    from chronon_spark.functions.vec_kernels import cosine_arrow, lsh_buckets_arrow

    def bucketed(df: DataFrame, idc: str, alias: str) -> DataFrame:
        buckets = lsh_buckets_arrow(F.col(vec_col), n_tables, n_planes, dims)
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
    scored = cand.select(
        query_id_col, "neighbor_id", cosine_arrow(F.col("__qv"), F.col("__cv"), dims).alias("cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cos")
    )
