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
TRANSCRIPTS_SQL = """
SELECT 'c' || CAST(user_id AS STRING)                                   AS conv_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
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
    load_table(spark, "events", sf_dir).createOrReplaceTempView("__events_src")
    return spark.sql(TRANSCRIPTS_SQL.format(events="__events_src"))


def transcripts_sql_duckdb(events_rel: str = "events") -> str:
    """Same derivation for the DuckDB oracle (VARCHAR instead of STRING)."""
    return TRANSCRIPTS_SQL.format(events=events_rel).replace("AS STRING", "AS VARCHAR")
