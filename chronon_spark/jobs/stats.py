"""Feature-table statistics + distribution drift.

The reference ships observability jobs over feature outputs: per-column
summaries (spark/.../stats/StatsCompute.scala) and distribution-drift scoring
between time slices (spark/.../stats/drift/Summarizer.scala). This module is
the Spark-first equivalent, all JVM-side (no Python in the hot path):

- ``summarize`` — ONE aggregate pass producing every per-column metric
  (count / nulls / distinct / mean / min / max), then an unpivot via
  ``stack`` into long format (column, metric, value). At 100 TB this is a
  single map-side-combined shuffle; swap ``countDistinct`` for
  ``approx_count_distinct`` via ``approx=True`` when exactness isn't needed.
- ``categorical_psi`` — Population Stability Index between two slices of a
  categorical column: two small groupBys + a broadcast-joined total, one
  number out. The standard drift score the reference's Summarizer family
  computes over binned distributions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def summarize(
    df: DataFrame,
    columns: list[str] | None = None,
    round_to: int = 6,
    approx: bool = False,
) -> DataFrame:
    """Long-format per-column stats: (column, metric, value:double)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    columns = columns or list(fields)
    aggs: list = []
    entries: list[tuple[str, str, str]] = []  # (column, metric, agg alias)

    def add(col: str, metric: str, expr) -> None:
        alias = f"__{col}__{metric}"
        aggs.append(expr.alias(alias))
        entries.append((col, metric, alias))

    distinct = F.approx_count_distinct if approx else F.countDistinct
    for c in columns:
        add(c, "count", F.count(c).cast("double"))
        add(c, "nulls", F.sum(F.col(c).isNull().cast("long")).cast("double"))
        add(c, "distinct", distinct(c).cast("double"))
        if isinstance(fields[c], _NUMERIC):
            add(c, "mean", F.round(F.avg(c), round_to))
            add(c, "min", F.min(c).cast("double"))
            add(c, "max", F.max(c).cast("double"))
    row = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', '{m}', `{a}`" for c, m, a in entries)
    return row.selectExpr(
        f"stack({len(entries)}, {stack_args}) as (column, metric, value)"
    )


def categorical_psi(df_a: DataFrame, df_b: DataFrame, col: str, round_to: int = 6) -> DataFrame:
    """PSI = Σ (p_a − p_b) · ln(p_a / p_b) over categories present in BOTH
    slices (categories exclusive to one side carry infinite PSI and should be
    surfaced separately; we keep the score finite and comparable).

    Returns a single-row DataFrame (psi:double, n_categories:long).
    """
    ca = df_a.where(F.col(col).isNotNull()).groupBy(col).agg(F.count("*").alias("__na"))
    cb = df_b.where(F.col(col).isNotNull()).groupBy(col).agg(F.count("*").alias("__nb"))
    ta = df_a.where(F.col(col).isNotNull()).agg(F.count("*").alias("__ta"))
    tb = df_b.where(F.col(col).isNotNull()).agg(F.count("*").alias("__tb"))
    j = (
        ca.join(cb, on=col, how="inner")
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .withColumn("__pa", F.col("__na") / F.col("__ta"))
        .withColumn("__pb", F.col("__nb") / F.col("__tb"))
    )
    return j.agg(
        F.round(F.sum((F.col("__pa") - F.col("__pb")) * F.log(F.col("__pa") / F.col("__pb"))), round_to).alias("psi"),
        F.count("*").alias("n_categories"),
    )
