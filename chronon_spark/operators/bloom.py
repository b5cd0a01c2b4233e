"""Bloom-filter key pushdown for as-of joins — the reference's mid-size-left
mode (Join.scala:268-285: when small mode doesn't apply AND the left row
count is UNDER spark.chronon.backfill.bloomfilter.threshold = 1e6, build a
BloomFilter per joinPart and inject `mightContain` into the right scan;
Join.scala:273 skips the bloom for lefts ABOVE the threshold — the build
would dominate; catalog/TableUtils.scala:54-63).

Spark-first shape, no per-row Python anywhere:

- build: ``xxhash64(keys)`` (JVM codegen) -> distinct -> per-partition numpy
  bitmaps via ``mapInArrow`` (Arrow batches, one 8-byte-aligned bitmap row
  out per partition) -> driver ORs ``<= coalesce`` bitmaps. Driver traffic is
  ``n_parts × m/8`` bytes, independent of key count.
- probe: ``xxhash64(right keys)`` (JVM) -> one Arrow-vectorized pandas UDF
  tests k bit positions against the sc.broadcast bitmap. False positives
  only let extra events through the scan — the as-of cogroup drops keys with
  no left rows, so the filter is semantics-neutral at any fpp.

Double hashing (Kirsch-Mitzenmacher): pos_i = (h1 + i*h2) mod m with
splitmix64-derived h1/h2 — k probes from one 64-bit hash, standard bloom
guarantee.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_C1 = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _splitmix(h: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer, vectorized over uint64 (wrapping arithmetic)."""
    h = h.copy()
    h ^= h >> np.uint64(30)
    h *= _M1
    h ^= h >> np.uint64(27)
    h *= _M2
    h ^= h >> np.uint64(31)
    return h


def _probe_positions(h64: np.ndarray, n_hashes: int, m_bits: int) -> Iterator[np.ndarray]:
    """Yield the k bit positions for each hash (each an int64->uint64 array)."""
    h = h64.astype(np.int64).view(np.uint64)
    h1 = _splitmix(h)
    h2 = _splitmix(h + _C1) | np.uint64(1)
    m = np.uint64(m_bits)
    for i in range(n_hashes):
        yield (h1 + np.uint64(i) * h2) % m


def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) sized for ``n_keys`` at target false-positive rate; m is
    rounded up to a multiple of 64 so the bitmap is a whole uint64 array."""
    n = max(n_keys, 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _set_bits(bitmap: np.ndarray, h64: np.ndarray, n_hashes: int) -> None:
    m_bits = bitmap.size * 64
    for pos in _probe_positions(h64, n_hashes, m_bits):
        np.bitwise_or.at(bitmap, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))


def _test_bits(bitmap: np.ndarray, h64: np.ndarray, n_hashes: int) -> np.ndarray:
    m_bits = bitmap.size * 64
    hit = np.ones(h64.size, dtype=bool)
    for pos in _probe_positions(h64, n_hashes, m_bits):
        word = bitmap[(pos >> np.uint64(6)).astype(np.int64)]
        hit &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
    return hit


def build_bloom(
    keys_hashed: DataFrame, n_keys: int, fpp: float = 0.01, max_build_parts: int = 16
) -> tuple[bytes, int]:
    """Aggregate a bloom bitmap over ``keys_hashed`` (single ``__h`` int64
    column, pre-distinct). Returns (bitmap bytes, k). One Spark job; driver
    receives at most ``max_build_parts`` partial bitmaps and ORs them."""
    m_bits, k = bloom_params(n_keys, fpp)
    words = m_bits // 64

    def _partial(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        bm = np.zeros(words, dtype=np.uint64)
        for b in batches:
            h = b.column(0).to_numpy(zero_copy_only=False)
            _set_bits(bm, h, k)
        yield pa.RecordBatch.from_arrays([pa.array([bm.tobytes()])], ["bm"])

    # repartition (NOT coalesce) bounds driver traffic to max_build_parts
    # bitmaps while keeping a shuffle boundary: coalesce would merge the
    # upstream distinct's reduce stage down to 16 tasks, serializing the
    # hash-dedup of a billion-key left on 16 cores; the repartition shuffle
    # moves only 8-byte hashes
    rows = keys_hashed.repartition(max_build_parts).mapInArrow(_partial, "bm binary").collect()
    out = np.zeros(words, dtype=np.uint64)
    for r in rows:
        out |= np.frombuffer(r["bm"], dtype=np.uint64)
    return out.tobytes(), k


def bloom_filter_keys(
    left: DataFrame,
    right: DataFrame,
    key_mapping: dict[str, str],
    fpp: float = 0.01,
    n_keys: int | None = None,
) -> DataFrame:
    """Filter ``right`` to rows whose key tuple is (probably) present on the
    left — `mightContain` pushdown for lefts too big to broadcast exactly.

    Two build jobs (approx distinct count + bitmap aggregate), then the right
    scan streams map-side through one vectorized probe. Use when the left key
    set exceeds the broadcast-semi budget (~10^7 tuples); below that,
    ``prefilter_right_keys(mode='semi')`` is exact and cheaper.
    """
    left_keys = list(key_mapping.keys())
    right_keys = [key_mapping[k] for k in left_keys]
    hashed = left.select(F.xxhash64(*left_keys).alias("__h")).distinct()
    if n_keys is None:
        n_keys = hashed.agg(F.approx_count_distinct("__h").alias("n")).collect()[0]["n"]
    bitmap, k = build_bloom(hashed, n_keys, fpp)
    spark = right.sparkSession
    bc = spark.sparkContext.broadcast(bitmap)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def might_contain(h):  # pd.Series[int64] -> pd.Series[bool]
        import pandas as pd

        bm = np.frombuffer(bc.value, dtype=np.uint64)
        return pd.Series(_test_bits(bm, h.to_numpy(), k))

    # inline hash inside the predicate: no temp column, so a pre-existing
    # right column named like one we'd add can never be clobbered
    return right.where(might_contain(F.xxhash64(*right_keys)))
