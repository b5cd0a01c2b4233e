"""End-to-end corpus curation: the composed training-data pipeline.

The individual stages are the oracle-gated operators in ``functions/`` —
this job chains them the way a pre-training data pipeline actually runs
(CCNet/RefinedWeb order: dedup before quality so boilerplate doesn't skew
the scorer's corpus statistics; decontaminate before split so the held-out
benchmark never leaks into any split):

1. **exact dedup** — keep only the min-id representative of each normalized
   text (shuffle key = 32-byte md5 fingerprint, raw text never shuffles);
2. **language + quality gate** — `lang_id`/`quality_score` per-row codegen,
   drop below ``min_quality`` and outside ``langs`` (zero shuffle);
3. **benchmark decontamination** — drop any doc sharing an 8-gram with the
   eval set (benchmark hashes broadcast, corpus streams map-side);
4. **deterministic split** — md5 hash-unit train/val/test (map-side,
   partitioning-invariant, never `rand()`).

Every stage is deterministic and SQL-replayable, so the WHOLE pipeline sits
under the driver's hard oracle gate as one query (`curate_corpus`).

100 TB shape: stages 2 and 4 are projections; stage 1 is one md5-keyed
shuffle; stage 3's shuffle is proportional to contamination hits only. The
one structural join (survivor ids back to rows) carries ids, not text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from chronon_spark.functions.decontaminate import contamination
from chronon_spark.functions.sampling import deterministic_split
from chronon_spark.functions.text import fingerprint, lang_id, quality_score, token_count

__all__ = ["curate"]


def curate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.6,
    langs: tuple[str, ...] | None = None,
    shingle_n: int = 8,
    splits: dict[str, float] | None = None,
) -> DataFrame:
    """Run the 4-stage curation pipeline; returns one row per SURVIVING
    document: (id, lang, quality, n_tokens, split)."""
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}

    # 1. exact dedup: doc survives iff it is the min id of its fingerprint
    # group — a window min over the md5 key (one shuffle, 32-byte key)
    w = Window.partitionBy(fingerprint(text_col))
    d = docs.withColumn("__keep", F.col(id_col) == F.min(id_col).over(w)).where("__keep")

    # 2. language + quality gate (per-row codegen, no shuffle)
    d = d.select(
        F.col(id_col),
        F.col(text_col),
        lang_id(text_col).alias("lang"),
        quality_score(text_col).alias("quality"),
        token_count(text_col).cast("long").alias("n_tokens"),
    ).where(F.col("quality") >= F.lit(min_quality))
    if langs:
        d = d.where(F.col("lang").isin(*langs))

    # 3. decontaminate: drop anything sharing a shingle with the benchmark
    contam = contamination(d, bench, id_col=id_col, text_col=text_col, shingle_n=shingle_n)
    clean_ids = contam.where(F.col("n_hit") == 0).select(id_col)
    d = d.join(clean_ids, on=id_col)  # id-only join; AQE broadcasts when small

    # 4. deterministic split assignment (map-side)
    return deterministic_split(d, id_col, splits).select(
        id_col, "lang", "quality", "n_tokens", "split"
    )
