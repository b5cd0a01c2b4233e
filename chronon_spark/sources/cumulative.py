"""Cumulative (snapshot-accumulating) event sources.

A cumulative table stores, in every date partition, ALL events up to that
date (reference: ``EventSource.isCumulative``, thrift/api.thrift:131). The
reference collapses the scan range to a single partition — the latest valid
one — instead of the usual window-rewind span
(GroupBy.getIntersectedRange, spark/.../GroupBy.scala:758-765:
``SourceDataProfile(latestValid, latestValid, latestValid)``).

Spark-first: the latest-partition probe reads only the partition column (a
pure metadata operation on hive-partitioned parquet or an Iceberg
``.partitions`` metadata query), and the equality predicate on the partition
column prunes every other partition at the scan (PartitionFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def latest_partition(df: DataFrame, partition_col: str = "ds", end_partition: str | None = None) -> str | None:
    """Max value of the partition column (≤ end_partition if given).

    Mirrors TableUtils.lastAvailablePartition (reference:
    catalog/TableUtils.scala) — on a partitioned layout Catalyst answers this
    from partition metadata without touching data files.
    """
    probe = df.select(partition_col)
    if end_partition is not None:
        probe = probe.where(F.col(partition_col) <= end_partition)
    row = probe.agg(F.max(partition_col).alias("p")).collect()[0]
    return row["p"]


def scan_cumulative_events(
    df: DataFrame, partition_col: str = "ds", end_partition: str | None = None
) -> tuple[DataFrame, str | None]:
    """Scan a cumulative event table: exactly ONE partition (the latest valid)
    carries the full history, so everything else is pruned.

    Returns (slice, chosen_partition). At 100 TB this is the difference
    between reading one snapshot and reading every daily partition ever
    written.
    """
    latest = latest_partition(df, partition_col, end_partition)
    if latest is None:
        return df.where(F.lit(False)), None
    return df.where(F.col(partition_col) == latest), latest


def build_cumulative(events: DataFrame, time_column: str = "ts", partition_col: str = "ds") -> DataFrame:
    """Derive a cumulative table from a plain event stream (test/demo helper):
    partition d contains every event with date(ts) <= d, for each distinct
    event date d. Inverse of scan_cumulative_events — scanning the latest
    partition returns the raw stream."""
    days = events.select(F.to_date(time_column).alias("__d")).distinct()
    ev = events.withColumn("__ed", F.to_date(time_column))
    out = ev.join(days, ev["__ed"] <= days["__d"]).drop("__ed")
    return out.withColumn(partition_col, F.date_format("__d", "yyyy-MM-dd")).drop("__d")
