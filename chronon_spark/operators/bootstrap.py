"""Bootstrap: pre-fill feature columns from a precomputed table and skip
computing rows the bootstrap fully covers.

Reference: BootstrapPart (thrift/api.thrift:442-449), the bootstrap join +
covering-set analysis (Join.scala:45-60,130-193; batch/JoinBootstrapJob.scala).
The reference tracks per-row `matched_hashes` and compiles a NOT-IN filter per
joinPart; with a single as-of operator our equivalent is a row split:

- rows where EVERY feature column is present in the bootstrap -> emitted
  directly (ZERO aggregation work — this is the point: a backfill that
  already ran for last month's rows costs nothing to re-emit);
- remaining rows -> the as-of join computes, then per-column
  `coalesce(bootstrap, computed)` lets partial bootstraps win column-wise
  (the reference's column-level semantics).

Scale: the bootstrap join is a plain equi-join on the row identity — Spark
broadcasts or SMJs it; the covered/uncovered split prunes the expensive
cogroup's LEFT side, and with `prune_right` the right side shrinks with it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from chronon_spark.api import GroupBy
from chronon_spark.operators.asof_join import asof_join

_BS = "__bs_"


def bootstrap_asof_join(
    left: DataFrame,
    right: DataFrame,
    gb: GroupBy,
    bootstrap_df: DataFrame,
    row_keys: list[str],
    left_time_column: str = "ts",
    key_mapping: dict[str, str] | None = None,
) -> DataFrame:
    """As-of join where rows covered by `bootstrap_df` skip computation.

    `bootstrap_df` carries `row_keys` + any subset of the GroupBy's output
    columns; it must be unique per row_keys (one bootstrap row per left row).
    """
    feat_names = [p.output_name for p in gb.parts()]
    covered = [c for c in feat_names if c in bootstrap_df.columns]
    if not covered:
        return asof_join(left, right, gb, left_time_column, key_mapping)

    b = bootstrap_df.select(
        *row_keys, *[F.col(c).alias(f"{_BS}{c}") for c in covered]
    )
    lj = left.join(b, row_keys, "left")

    full_cover = len(covered) == len(feat_names)
    if full_cover:
        is_covered = F.lit(True)
        for c in covered:
            is_covered = is_covered & F.col(f"{_BS}{c}").isNotNull()
        done = lj.where(is_covered).select(
            *left.columns, *[F.col(f"{_BS}{c}").alias(c) for c in feat_names]
        )
        todo = lj.where(~is_covered)
    else:
        done = None
        todo = lj

    computed = asof_join(todo, right, gb, left_time_column, key_mapping)
    merged = computed.select(
        *left.columns,
        *[F.coalesce(F.col(f"{_BS}{c}"), F.col(c)).alias(c) if c in covered else F.col(c) for c in feat_names],
    )
    return merged.unionByName(done) if done is not None else merged
