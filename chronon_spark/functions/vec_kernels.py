"""Arrow-vectorized kernels for the embedding-similarity family.

Why these exist: the expression forms in `similarity.py` (`F.aggregate` /
`F.zip_with` folds over 64-dim literal plane/centroid arrays) are correct and
oracle-portable, but pay two real costs:

- **driver build time** — a 16-table × 8-plane LSH bucket expression embeds
  ~8k `F.lit` nodes, each a py4j roundtrip; profiling showed 5–9 s per query
  spent *constructing* the DataFrame before any execution.
- **interpreted execution** — Spark higher-order functions do not enter
  whole-stage codegen; every fold step allocates and evaluates a lambda
  per element.

Each kernel here reproduces the fold's float64 operation order EXACTLY
(accumulate dimension-by-dimension with vectorized adds across rows), so
results are bitwise-identical to the expression path and to the DuckDB
oracle's `list_sum(list_transform(...))` sequential sum — equivalence is
asserted in tests/test_functions.py. Products `x_d · w_d` round once in both
forms; `np.sqrt` and JVM `Math.sqrt`/DuckDB `sqrt` are all IEEE-754
correctly-rounded.

Scale shape: one Arrow batch transfer of the embedding column per stage,
numpy inner loops over (batch × planes) — per-row cost is a handful of
vector FMAs instead of thousands of interpreted lambda calls.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf


def _stack(col: pd.Series, dims: int) -> np.ndarray:
    """(N, dims) float64 from a Series of array<float> cells (exact upcast)."""
    if not len(col):
        return np.empty((0, dims), dtype="float64")
    return np.stack(col.to_numpy()).astype("float64")


def _fold_dot_matrix(v: np.ndarray, w: np.ndarray) -> np.ndarray:
    """(N, P) = v @ w, accumulated dim-by-dim in fold order.

    Equivalent values to BLAS `v @ w`, but the additions happen in the same
    left-to-right order as `F.aggregate(zip_with(...))` — bitwise parity with
    the expression path is the point, so no reassociating matmul here.
    """
    n, dims = v.shape
    acc = np.zeros((n, w.shape[1]), dtype="float64")
    for d in range(dims):
        acc += v[:, d, None] * w[None, d, :]
    return acc


def _fold_sq_norm(v: np.ndarray) -> np.ndarray:
    """(N,) sequential-fold sum of squares (NOT np.einsum — order matters)."""
    acc = np.zeros(v.shape[0], dtype="float64")
    for d in range(v.shape[1]):
        acc += v[:, d] * v[:, d]
    return acc


def cosine_arrow(a: Column, b: Column, dims: int) -> Column:
    """Bitwise drop-in for `similarity.cosine` (fold-order float64)."""

    @pandas_udf("double")
    def _cos(sa: pd.Series, sb: pd.Series) -> pd.Series:
        va, vb = _stack(sa, dims), _stack(sb, dims)
        dot = np.zeros(va.shape[0], dtype="float64")
        for d in range(dims):
            dot += va[:, d] * vb[:, d]
        return pd.Series(dot / (np.sqrt(_fold_sq_norm(va)) * np.sqrt(_fold_sq_norm(vb))))

    return _cos(a, b)


def lsh_buckets_arrow(vec: Column, n_tables: int, n_planes: int, dims: int) -> Column:
    """array<long> of per-table LSH bucket signatures.

    One kernel evaluates every (table, plane) hyperplane at once: the plane
    matrix W is (dims, n_tables·n_planes), projections accumulate in fold
    order, bit p of table t is `proj > 0` — identical decisions to
    `similarity.lsh_bucket` and the SQL oracle's per-plane list_sum.
    """
    from chronon_spark.functions.similarity import plane_components

    w = np.array(
        [plane_components(t, p, dims) for t in range(n_tables) for p in range(n_planes)],
        dtype="float64",
    ).T  # (dims, T*P)
    weights = (1 << np.arange(n_planes, dtype="int64"))

    @pandas_udf("array<long>")
    def _buckets(col: pd.Series) -> pd.Series:
        v = _stack(col, dims)
        proj = _fold_dot_matrix(v, w)  # (N, T*P)
        bits = (proj > 0).astype("int64").reshape(len(v), n_tables, n_planes)
        bks = (bits * weights).sum(axis=2)  # (N, T)
        return pd.Series(list(bks))

    return _buckets(vec)


def _centroid_matrix(
    n_centroids: int, dims: int, centroids: list[list[float]] | None = None
) -> tuple[np.ndarray, np.ndarray]:
    from chronon_spark.functions.similarity import ivf_centroid_components

    comp = np.array(
        centroids
        if centroids is not None
        else [ivf_centroid_components(j, dims) for j in range(n_centroids)],
        dtype="float64",
    ).T  # (dims, C)
    # sequential fold across dims (NOT np.sum's pairwise order): for the fixed
    # hash-recipe components the value is identical (x.5 squares are exact
    # dyadics), and for TRAINED centroids (arbitrary doubles) this is what
    # keeps the half-norm bitwise-reproducible by the oracle's list_sum
    half_norms = _fold_sq_norm(comp.T) / 2.0
    return comp, half_norms


def _ivf_scores_np(v: np.ndarray, comp: np.ndarray, half_norms: np.ndarray) -> np.ndarray:
    """(N, C) scores: fold-order dot minus ‖c‖²/2 (subtracted last, as the
    expression does)."""
    return _fold_dot_matrix(v, comp) - half_norms


def ivf_cell_arrow(
    vec: Column, n_centroids: int, dims: int, centroids: list[list[float]] | None = None
) -> Column:
    """1-based nearest-centroid cell — first max on ties (np.argmax), same as
    `array_position(scores, array_max(scores))`. Pass ``centroids`` (e.g. from
    ``clustering.kmeans_fit``) to replace the fixed hash-recipe quantizer with
    a trained one — cells tighten, the probe/re-rank machinery is unchanged."""
    comp, half_norms = _centroid_matrix(n_centroids, dims, centroids)

    @pandas_udf("int")
    def _cell(col: pd.Series) -> pd.Series:
        v = _stack(col, dims)
        scores = _ivf_scores_np(v, comp, half_norms)
        return pd.Series((np.argmax(scores, axis=1) + 1).astype("int32"))

    return _cell(vec)


def ivf_probe_cells_arrow(
    vec: Column,
    n_centroids: int,
    n_probe: int,
    dims: int,
    centroids: list[list[float]] | None = None,
) -> Column:
    """array<int>: the query's n_probe best cells, ties to the lower index
    (stable argsort on negated scores ≡ the rank-expression semantics)."""
    comp, half_norms = _centroid_matrix(n_centroids, dims, centroids)

    @pandas_udf("array<int>")
    def _probes(col: pd.Series) -> pd.Series:
        v = _stack(col, dims)
        scores = _ivf_scores_np(v, comp, half_norms)
        order = np.argsort(-scores, axis=1, kind="stable")[:, :n_probe] + 1
        return pd.Series(list(order.astype("int32")))

    return _probes(vec)


def minhash_params(num_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic affine-hash constants shared by the kernel, the
    expression twin (`dedup.minhash_from_shingles`) and the DuckDB oracle:
    odd multipliers < 2^31 and offsets < 2^31 derived from the golden-ratio /
    murmur mixing constants, so `a*x + b` stays within signed-64 range for
    any 32-bit base hash x."""
    a = [((0x9E3779B1 * (i + 1)) & 0x7FFFFFFE) | 1 for i in range(num_hashes)]
    b = [(0x85EBCA77 * (i + 1)) & 0x7FFFFFFF for i in range(num_hashes)]
    return a, b


def minhash_sig_arrow(shingles_col: Column, num_hashes: int = 16) -> Column:
    """array<long> MinHash signature — kernel twin of
    `dedup.minhash_from_shingles`.

    One md5 per shingle (hashlib's C core — the same bytes DuckDB's `md5()`
    and the JVM's `F.md5` produce); the base hash is the first 4 digest
    bytes big-endian, and the `num_hashes` functions are vectorized affine
    maps `(a_i * x + b_i) mod 2^32` over the whole shingle set at once
    (one numpy outer product + row-min per doc). Integer arithmetic, so
    parity with the expression path and the oracle is exact by construction.

    An earlier form salted md5 per hash index — `md5(f"{i}:{s}")` — paying
    16× the hashing; the affine family over one base hash is the standard
    minwise-permutation approximation and cuts the map-side CPU 16×.

    Scale shape: map-side only — signatures exist before any exchange, so
    the only shuffle in minhash LSH is the band join.
    """
    import hashlib

    a_c, b_c = minhash_params(num_hashes)
    av = np.asarray(a_c, dtype=np.uint64)[:, None]
    bv = np.asarray(b_c, dtype=np.uint64)[:, None]
    mod = np.uint64(1) << np.uint64(32)

    @pandas_udf("array<long>")
    def _sig(col: pd.Series) -> pd.Series:
        out = []
        for sh in col:
            if sh is None or len(sh) == 0:
                out.append(None)
                continue
            buf = b"".join(hashlib.md5(s.encode("utf-8")).digest()[:4] for s in sh)
            x = np.frombuffer(buf, dtype=">u4").astype(np.uint64)[None, :]
            h = (av * x + bv) % mod
            out.append(h.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return _sig(shingles_col)


def simhash64_sig_arrow(tokens_col: Column) -> Column:
    """struct<hi:long, lo:long> 64-bit SimHash signature from a token array.

    Replaces the explode + groupBy(65 conditional sums) signature stage with
    one map-side Arrow pass: hash each token with hashlib (same md5-of-UTF-8
    the JVM/DuckDB compute), vote the two bits each hex digit carries
    (high bit -> pattern 89abcdef, second bit -> 4567cdef), majority =
    strictly more ones than zeros. Integers, so parity with the expression
    path is exact by construction; the tokenization itself stays Spark-side
    (`text.tokens`) so regex semantics can't drift.

    Per-doc numpy slices keep temporaries allocator-recycled (no large fresh
    mappings per batch) — the inner hash loop is hashlib's C core.
    """
    import hashlib

    @pandas_udf("struct<hi:long, lo:long>")
    def _sig(col: pd.Series) -> pd.DataFrame:
        his = np.zeros(len(col), dtype="int64")
        los = np.zeros(len(col), dtype="int64")
        w32 = (np.int64(1) << np.arange(31, -1, -1, dtype="int64"))
        for i, toks in enumerate(col):
            if toks is None or len(toks) == 0:
                continue  # token-less docs carry the all-zero signature
            dig = np.frombuffer(
                b"".join(hashlib.md5(t.encode("utf-8")).digest() for t in toks),
                dtype=np.uint8,
            ).reshape(len(toks), 16)
            digits = np.empty((len(toks), 32), dtype=np.uint8)
            digits[:, 0::2] = dig >> 4
            digits[:, 1::2] = dig & 15
            # hex digit j votes bit 2j-1 (its high bit) and bit 2j (its
            # second bit) — same layout as simhash64_from_hashes / the oracle
            ones = np.empty(64, dtype="int64")
            ones[0::2] = (digits >> 3).sum(axis=0)
            ones[1::2] = ((digits >> 2) & 1).sum(axis=0)
            maj = (2 * ones > len(toks)).astype("int64")
            his[i] = (maj[:32] * w32).sum()
            los[i] = (maj[32:] * w32).sum()
        return pd.DataFrame({"hi": his, "lo": los})

    return _sig(tokens_col)
