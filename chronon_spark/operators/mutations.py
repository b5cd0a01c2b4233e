"""Entity/CDC model: point-in-time-correct aggregation over a MUTABLE table.

Reference: EntitySource (thrift/api.thrift:142-162 — midnight `snapshotTable`
+ `mutationTable` with `mutation_ts`/`is_before`), the temporal-entities path
(GroupBy.scala:200-342) and CDC reversal in `updateIr`
(SawtoothMutationAggregator.scala:123-139): every mutation is a pair of rows —
the before-image (`is_before=true`) and the after-image — and *abelian* ops
(SUM/COUNT/AVERAGE) reverse the before-image instead of recomputing.

Spark-first re-expression: turn state into a SIGNED DELTA event stream and
reuse the ordinary as-of kernel —

- base snapshot rows       → events at the base midnight, sign +1
- mutation after-images    → events at mutation_ts,      sign +1
- mutation before-images   → events at mutation_ts,      sign −1

then `state_agg(T) = unbounded-window SUM over (value·sign) / SUM(sign)`
with the engine's strict `ts' < T` kernel. COUNT is SUM(sign); AVERAGE is
SUM(value·sign)/SUM(sign). Non-abelian reads (the current value of an
attribute) are the LAST after-image — plain `Op.LAST` over the
`is_before=false` stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.operators.asof_join import asof_join

ABELIAN_OPS = {Op.SUM, Op.COUNT, Op.AVERAGE}


def mutations_to_deltas(
    snapshot: DataFrame,
    mutations: DataFrame,
    keys: list[str],
    value_col: str,
    base_ds: str,
    mutation_ts_col: str = "mutation_ts",
    is_before_col: str = "is_before",
) -> DataFrame:
    """Unified signed-delta event stream from a base snapshot + CDC rows.

    `snapshot` must be the state at `base_ds` midnight; `mutations` must cover
    (base_ds, ∞). Scale: both inputs are scanned once, no shuffle here — the
    downstream as-of join provides the single key shuffle.
    """
    base = snapshot.select(
        *keys,
        F.lit(1).alias("__sign"),
        F.col(value_col).alias("__val"),
        F.to_timestamp(F.lit(base_ds)).alias("__mts"),
    ).where(F.col(value_col).isNotNull())
    mut = (
        mutations.select(
            *keys,
            F.when(F.col(is_before_col), -1).otherwise(1).alias("__sign"),
            F.col(value_col).alias("__val"),
            F.col(mutation_ts_col).alias("__mts"),
        )
        .where(F.col(mutation_ts_col) >= F.to_timestamp(F.lit(base_ds)))
        # null-valued rows contribute nothing (reference: null inputs skipped)
        .where(F.col("__val").isNotNull())
    )
    return base.unionByName(mut)


def entity_state_asof(
    left: DataFrame,
    snapshot: DataFrame,
    mutations: DataFrame,
    keys: list[str],
    value_col: str,
    base_ds: str,
    ops: tuple[Op, ...] = (Op.SUM, Op.COUNT, Op.AVERAGE),
    left_time_column: str = "ts",
    mutation_ts_col: str = "mutation_ts",
    is_before_col: str = "is_before",
) -> DataFrame:
    """For each left row: SUM/COUNT/AVERAGE of `value_col` over the entity
    table's STATE as of the row's timestamp (strictly before, zero leakage).

    Output columns: `{value_col}_state_sum` / `_state_count` / `_state_avg`
    per requested op.
    """
    bad = [o for o in ops if o not in ABELIAN_OPS]
    if bad:
        raise ValueError(
            f"entity state aggregation needs abelian ops (reversible via is_before); got {bad}. "
            "For current-attribute reads use Op.LAST over the after-image stream."
        )
    deltas = mutations_to_deltas(
        snapshot, mutations, keys, value_col, base_ds, mutation_ts_col, is_before_col
    ).withColumn("__signed_val", F.col("__val") * F.col("__sign"))

    gb = GroupBy(
        keys=keys,
        aggregations=[
            Aggregation("__signed_val", Op.SUM, windows=(None,)),
            Aggregation("__sign", Op.SUM, windows=(None,)),
        ],
        time_column="__mts",
    )
    out = asof_join(left, deltas, gb, left_time_column=left_time_column)
    n = F.col("__sign_sum")
    s = F.col("__signed_val_sum")
    cols = list(left.columns)
    if Op.SUM in ops:
        cols.append(F.when(n > 0, s).alias(f"{value_col}_state_sum"))
    if Op.COUNT in ops:
        cols.append(F.when(n > 0, n).cast("long").alias(f"{value_col}_state_count"))
    if Op.AVERAGE in ops:
        cols.append(F.when(n > 0, s / n).alias(f"{value_col}_state_avg"))
    return out.select(*cols)


def entity_last_value_asof(
    left: DataFrame,
    mutations: DataFrame,
    keys: list[str],
    value_col: str,
    left_time_column: str = "ts",
    mutation_ts_col: str = "mutation_ts",
    is_before_col: str = "is_before",
    tie_breakers: list[str] | None = None,
) -> DataFrame:
    """Current attribute value as of each left row's ts: the LAST after-image
    strictly before ts (the as-of dimension lookup)."""
    after = mutations.where(~F.col(is_before_col))
    gb = GroupBy(
        keys=keys,
        aggregations=[Aggregation(value_col, Op.LAST, windows=(None,))],
        time_column=mutation_ts_col,
        tie_breakers=tie_breakers or [],
    )
    out = asof_join(left, after, gb, left_time_column=left_time_column)
    return out.withColumnRenamed(f"{value_col}_last", f"{value_col}_asof")
