"""Benchmark decontamination: flag training documents whose word n-grams
overlap an evaluation/benchmark set.

The standard guard in LLM training-data pipelines (GPT-3 appendix C,
PaLM/Llama data cards): any training document sharing >= ``min_hits``
distinct word n-grams (n in the 8..13 range) with a benchmark document is
contaminated and dropped or audited. The reference engine has no such
operator; this is part of the training-data-pipeline surface the driver
mandates alongside dedup/ANN.

Scale shape (the 100 TB design point):
- benchmark n-gram sets are SMALL (eval suites: 10^4..10^7 docs) while the
  train side is the 100 TB corpus. The benchmark hash set is therefore
  broadcast; the exploded train shingles stream through a broadcast-hash
  inner join — NO shuffle of the train side at its full width.
- the only exchanges are (a) the groupBy(doc_id) over post-join HITS —
  rows survive only when a shingle matched a benchmark shingle, so the
  shuffled volume is proportional to contamination, not corpus size — and
  (b) the join of that (small) hit table back onto the docs, which is
  broadcast again. Net: the corpus is read once, map-side.
- shingling itself is pure codegen (zip_with of shifted token slices, see
  text.word_shingles) — no UDF, no O(T^2) re-inlining.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from chronon_spark.functions.text import word_shingles

__all__ = ["benchmark_ngram_hashes", "contamination"]


def _shingle_hashes(text_col: Column | str, n: int) -> Column:
    """Distinct md5 hashes of the word n-gram shingles of one document."""
    return F.transform(word_shingles(text_col, n=n, distinct=True), F.md5)


def benchmark_ngram_hashes(
    bench: DataFrame, text_col: str = "text", shingle_n: int = 8
) -> DataFrame:
    """Distinct n-gram hash dimension of the benchmark set: one `h` column.

    Distinct-reduce BEFORE broadcast so the broadcast payload is the unique
    hash set, not one copy per occurrence.
    """
    return (
        bench.select(F.explode(_shingle_hashes(text_col, shingle_n)).alias("h"))
        .distinct()
    )


def contamination(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 8,
    min_hits: int = 1,
    min_frac: float = 0.0,
) -> DataFrame:
    """Per-document benchmark-overlap report.

    Returns ``(id_col, n_ngrams, n_hit, hit_frac, contaminated)`` where
    `n_hit` counts DISTINCT document shingles that appear anywhere in the
    benchmark, `hit_frac = n_hit / n_ngrams` (0.0 for docs too short to
    shingle), and `contaminated` is 1 iff ``n_hit >= min_hits`` and
    ``hit_frac >= min_frac``.
    """
    bh = benchmark_ngram_hashes(bench, text_col=text_col, shingle_n=shingle_n)
    base = docs.select(
        F.col(id_col), _shingle_hashes(text_col, shingle_n).alias("__sh")
    ).withColumn("n_ngrams", F.size("__sh"))
    hits = (
        base.select(id_col, F.explode("__sh").alias("h"))
        .join(F.broadcast(bh), "h")
        .groupBy(id_col)
        .agg(F.count("h").alias("n_hit"))  # shingles are pre-distinct per doc
    )
    out = base.drop("__sh").join(F.broadcast(hits), id_col, "left").fillna({"n_hit": 0})
    frac = F.when(
        F.col("n_ngrams") > 0, F.col("n_hit").cast("double") / F.col("n_ngrams")
    ).otherwise(F.lit(0.0))
    return out.select(
        id_col,
        "n_ngrams",
        F.col("n_hit").cast("long").alias("n_hit"),
        frac.alias("hit_frac"),
        ((F.col("n_hit") >= min_hits) & (frac >= min_frac)).cast("int").alias("contaminated"),
    )
