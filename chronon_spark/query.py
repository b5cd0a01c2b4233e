"""The reference's ``Query`` spec: row-level selects / wheres / setups.

Reference: ``Query`` (thrift/api.thrift:10-61) — ``selects: map<alias, expr>``,
``wheres: list<expr>``, ``setups: list<sql>`` (UDF registration / session
statements executed before evaluation, spark/.../GroupBy.scala:876), rendered
into SQL by api/.../QueryUtils.scala:27-66.

Spark-first: expressions ARE Spark SQL (the reference implements no scalar
function library of its own), so the whole spec maps to
``selectExpr + where`` — Catalyst prunes columns and pushes the predicates
into the scan; setups run through ``spark.sql`` verbatim.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class Query:
    selects: dict[str, str] | None = None  # alias -> Spark SQL expression; None = all columns
    wheres: list[str] = field(default_factory=list)
    setups: list[str] = field(default_factory=list)

    def apply(self, df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        for stmt in self.setups:
            spark.sql(stmt)
        # wheres BEFORE the projection: the reference renders
        # `SELECT selects FROM t WHERE wheres` (QueryUtils.build), so
        # predicates see BASE columns even when selects rename/drop them
        for w in self.wheres:
            df = df.where(w)
        if self.selects:
            df = df.selectExpr(*[f"{expr} AS {alias}" for alias, expr in self.selects.items()])
        return df


def render_query(df: DataFrame, query: Query | None) -> DataFrame:
    return df if query is None else query.apply(df)
