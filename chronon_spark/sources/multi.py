"""Multi-source GroupBy input: union several event streams into one.

Reference: a GroupBy lists MULTIPLE sources; each is rendered through its own
Query (selects/wheres) and the results are unioned with columns aligned by
the FIRST source's names — `df1.union(df2.selectExpr(columns1: _*))`
(spark/src/main/scala/ai/chronon/spark/GroupBy.scala:613-628). The common
pattern is the same logical events living in several physical tables
(e.g. a realtime table + a backfilled archive, or per-product event tables).

Spark-first: each per-source projection is a codegen `selectExpr`; the union
is a plan-level concatenation (NO shuffle — partitions of every source feed
the downstream aggregation/cogroup directly, and the one shuffle stays the
downstream groupBy/cogroup on the entity keys, exactly as single-source).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from chronon_spark.query import Query, render_query


def union_sources(
    sources: Sequence[DataFrame], queries: Sequence[Query | None] | None = None
) -> DataFrame:
    """Render each source through its Query and union by the first source's
    column names (reference alignment rule). Raises if a later source lacks
    a column the first one selects — same failure mode as the reference's
    selectExpr on missing columns, but with a clearer message."""
    if not sources:
        raise ValueError("union_sources: need at least one source")
    if queries is not None and len(queries) != len(sources):
        raise ValueError("union_sources: len(queries) must equal len(sources)")
    rendered = [
        render_query(df, queries[i] if queries else None) for i, df in enumerate(sources)
    ]
    first_cols = rendered[0].columns
    out = rendered[0]
    for i, df in enumerate(rendered[1:], start=1):
        missing = [c for c in first_cols if c not in df.columns]
        if missing:
            raise ValueError(
                f"union_sources: source {i} is missing columns {missing} "
                f"(first source defines the schema: {first_cols})"
            )
        out = out.union(df.select(*first_cols))
    return out
