"""Table loaders for the driver-provided parquet test data, plus the
deterministic SQL derivation of a transcripts table from `events`.

The derivation uses only expressions that Spark SQL and DuckDB evaluate
identically, so the DuckDB correctness oracle can reconstruct the exact same
input (see __spark_entry__.py oracle_sql)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Identical semantics in Spark SQL and DuckDB (both support ||, row_number,
# CASE, CAST). Keep in sync with TRANSCRIPTS_SQL_DUCKDB below.
# The window partitions by the conv_id EXPRESSION (1:1 with user_id, same
# result) so EnsureRequirements can reuse this exchange for the downstream
# cogroup on conv_id — one shuffle instead of two.
TRANSCRIPTS_SQL = """
SELECT 'c' || CAST(user_id AS STRING)                                   AS conv_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY 'c' || CAST(user_id AS STRING) ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
       CASE WHEN event_type IN ('click', 'view') THEN 'user'
            WHEN event_type = 'error'            THEN 'tool'
            ELSE 'assistant' END                                        AS role,
       event_type || ':' || CAST(event_id AS STRING)                    AS text,
       CASE WHEN event_type = 'error' THEN 'retry' ELSE NULL END        AS tool,
       value                                                            AS score,
       ts                                                               AS ts
FROM {events}
"""


def transcripts_from_events(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """DataFrame-API equivalent of TRANSCRIPTS_SQL (same values, same oracle).

    Built with the window partitioned on the conv_id ATTRIBUTE (not the raw
    expression): the SQL form extracts the partition expression into a hidden
    `_w0` column, so EnsureRequirements can't see that the window's exchange
    already clusters by conv_id and adds a SECOND shuffle before any
    downstream cogroup/groupBy on conv_id. The attribute form makes the
    derivation shuffle and the as-of join shuffle one and the same.
    """
    from pyspark.sql import Window, functions as F

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("conv_id", F.concat(F.lit("c"), F.col("user_id").cast("string")))
        .withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
        .withColumn(
            "role",
            F.when(F.col("event_type").isin("click", "view"), "user")
            .when(F.col("event_type") == "error", "tool")
            .otherwise("assistant"),
        )
        .withColumn("text", F.concat("event_type", F.lit(":"), F.col("event_id").cast("string")))
        .withColumn("tool", F.when(F.col("event_type") == "error", "retry"))
        .withColumn("score", F.col("value"))
        .select("conv_id", "turn_idx", "role", "text", "tool", "score", "ts")
    )


def transcripts_sql_duckdb(events_rel: str = "events") -> str:
    """Same derivation for the DuckDB oracle (VARCHAR instead of STRING)."""
    return TRANSCRIPTS_SQL.format(events=events_rel).replace("AS STRING", "AS VARCHAR")
