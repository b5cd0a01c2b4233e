"""Scale-safe top-k per group.

A bare ``row_number() OVER (PARTITION BY group ORDER BY score)`` funnels
every row of a group through ONE task — with a handful of groups (languages,
sources) over 10⁹ documents that is a single-machine sort per group, the
classic window-skew failure.

``topk_per_group`` runs the standard two-phase form instead:

1. **local top-k**: rows are spread across ``salt_buckets`` deterministic
   sub-groups (hash of the tie-break column — NOT partition id, which would
   be run-dependent) and ranked within (group, salt). A row outside its
   salt bucket's top-k cannot be in the group's top-k, so filtering to
   rank ≤ k keeps every candidate while cutting the data to
   ``salt_buckets × k`` rows per group.
2. **global top-k**: one more window over the survivors — now at most
   ``salt_buckets × k`` rows per group, trivially one task.

Both phases shuffle, but no task ever sorts more than a bounded slice. The
result is EXACTLY the unsalted top-k (same ordering columns + deterministic
tie-break), which the oracle-gated contract query asserts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    tie_break_col: str,
    k: int,
    salt_buckets: int = 32,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``k`` rows per group under ``order_by`` (pass fully-specified
    Column orderings, e.g. ``[F.desc("quality"), F.asc("doc_id")]`` — include
    the tie-break so ranks are deterministic). ``tie_break_col`` seeds the
    salt; it must be distributed within groups (a row id)."""
    if k <= 0:
        raise ValueError("k must be positive")
    salt = F.pmod(F.xxhash64(F.col(tie_break_col)), F.lit(salt_buckets))
    survivors = (
        df.withColumn("__salt", salt)
        .withColumn("__lr", F.row_number().over(Window.partitionBy(*group_cols, "__salt").orderBy(*order_by)))
        .where(F.col("__lr") <= k)
        .drop("__salt", "__lr")
    )
    final = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        survivors.withColumn(rank_col, F.row_number().over(final))
        .where(F.col(rank_col) <= k)
    )
