"""Table comparison + online/offline consistency metrics.

The reference ships a comparison family (run modes ``build-comparison-table``,
``compare``, ``consistency-metrics-compute``; spark/.../stats/
CompareBaseJob.scala:31-204, CompareMetrics.scala:39-170,
ConsistencyJob.scala) used for migration checks and online/offline parity.
Re-expressed Spark-first:

- ``check_consistency``: schema pre-flight (field sets, dtype equality under
  an optional left->right rename mapping, key presence, mapping bijectivity;
  ``migration_check`` lets the left carry extra columns) — every problem in
  one error, like the analyzer.
- ``build_comparison_table``: one full-outer join on the keys producing
  ``<col>_left`` / ``<col>_right`` / ``<col>_mismatch`` per value column —
  the reference's row-level comparison view. Mismatch is null-safe
  (``<=>``-based): present-vs-missing counts as a mismatch, null==null does
  not.
- ``compare_metrics``: per-column aggregate over that view — row presence
  (left_only/right_only/both), null counts, mismatches, match_rate — the
  DataMetrics summary.
- ``consistency_metrics``: the ConsistencyJob shape — compare an offline
  backfill against fetched/logged online values on (keys, ts).

Scale shape: ONE key-shuffle (the full-outer join) + one map-side-combined
aggregate; per-column metrics are a single pass of conditional sums, not a
per-column job. At 10⁹ rows the join is the only exchange, and bucketed/
co-partitioned inputs make it co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

LEFT_SUFFIX = "_left"  # CompareMetrics.scala:39
RIGHT_SUFFIX = "_right"


def check_consistency(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    mapping: dict[str, str] | None = None,
    migration_check: bool = False,
) -> None:
    """Raise ValueError listing EVERY schema problem (CompareBaseJob
    checkConsistency, CompareBaseJob.scala:34-106)."""
    mapping = mapping or {}
    lf = {f.name: f.dataType for f in left.schema.fields}
    rf = {f.name: f.dataType for f in right.schema.fields}
    errors: list[str] = []

    if (len(lf) >= len(rf)) if migration_check else (len(lf) == len(rf)):
        pass
    else:
        errors.append(f"inconsistent field counts: left {len(lf)}, right {len(rf)}")
    rev = {v: k for k, v in mapping.items()}
    if len(rev) != len(mapping):
        errors.append(f"mapping values contain duplicates: {sorted(mapping.values())}")
    if not set(mapping) <= set(lf):
        errors.append(f"mapping keys missing on left: {sorted(set(mapping) - set(lf))}")
    if not set(mapping.values()) <= set(rf):
        errors.append(f"mapping values missing on right: {sorted(set(mapping.values()) - set(rf))}")
    for rname, rtype in rf.items():
        lname = rev.get(rname, rname)
        if lname in lf:
            if lf[lname] != rtype:
                errors.append(f"dtype mismatch for '{lname}': left {lf[lname]}, right {rtype}")
        elif not migration_check:
            errors.append(f"right column '{rname}' has no left counterpart")
    for side, fields in (("left", lf), ("right", rf)):
        missing = [k for k in keys if k not in fields]
        if missing:
            errors.append(f"keys missing on {side}: {missing}")
    if errors:
        raise ValueError("comparison schema check failed:\n- " + "\n- ".join(errors))


def build_comparison_table(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    mapping: dict[str, str] | None = None,
    migration_check: bool = False,
) -> DataFrame:
    """Full-outer row-level comparison view: keys + per-value-column
    ``_left``/``_right``/``_mismatch`` triples (CompareBaseJob.compare)."""
    check_consistency(left, right, keys, mapping, migration_check)
    mapping = mapping or {}
    rnames = {f.name for f in right.schema.fields}
    # prune migration-only left columns, align right names to left names
    val_cols = [
        c for c in left.columns if c not in keys and mapping.get(c, c) in rnames
    ]
    l = left.select(*keys, *[F.col(c).alias(c + LEFT_SUFFIX) for c in val_cols])
    r = right.select(
        *keys, *[F.col(mapping.get(c, c)).alias(c + RIGHT_SUFFIX) for c in val_cols]
    )
    j = l.join(r, keys, "full")
    for c in val_cols:
        j = j.withColumn(
            c + "_mismatch", ~F.col(c + LEFT_SUFFIX).eqNullSafe(F.col(c + RIGHT_SUFFIX))
        )
    return j


def compare_metrics(comparison: DataFrame, keys: list[str]) -> DataFrame:
    """Long-format per-column metrics over a comparison view: one row per
    value column with row presence, null and mismatch counts, match_rate.
    Single aggregate pass (all columns' conditional sums in one job)."""
    val_cols = sorted(c[: -len(LEFT_SUFFIX)] for c in comparison.columns if c.endswith(LEFT_SUFFIX))

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in val_cols:
        lc, rc, mc = F.col(c + LEFT_SUFFIX), F.col(c + RIGHT_SUFFIX), F.col(c + "_mismatch")
        aggs += [
            cnt(lc.isNull()).alias(f"__{c}__left_null"),
            cnt(rc.isNull()).alias(f"__{c}__right_null"),
            cnt(mc).alias(f"__{c}__mismatch"),
        ]
    wide = comparison.agg(*aggs)
    stacked = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"__{c}__left_null").alias("left_null"),
            F.col(f"__{c}__right_null").alias("right_null"),
            F.col(f"__{c}__mismatch").alias("mismatch"),
            F.round(1.0 - F.col(f"__{c}__mismatch") / F.col("n_rows"), 6).alias("match_rate"),
        )
        for c in val_cols
    ]
    return wide.select(F.explode(F.array(*stacked)).alias("m")).select("m.*")


def consistency_metrics(
    backfill: DataFrame, fetched: DataFrame, keys: list[str]
) -> DataFrame:
    """ConsistencyJob: offline backfill vs online-fetched values on the same
    (key, ts) queries — per-feature match rates (ConsistencyJob.scala:96-154).
    The engine's fetch path is equivalence-TESTED against the backfill
    (tests/test_upload_fetch.py); this job is the production observability
    form of that gate."""
    return compare_metrics(build_comparison_table(backfill, fetched, keys), keys)
