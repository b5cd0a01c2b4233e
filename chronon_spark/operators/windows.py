"""Sessionization, lag/lead, tumbling & hopping windows — native pyspark.sql.

The reference implements none of these as named operators (no session window
anywhere in it — see SURVEY.md §2.4); the north rule requires them, and they
map directly onto `pyspark.sql.Window` / epoch-bucket arithmetic, staying
entirely inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from chronon_spark.api import Window as CWindow
from chronon_spark.operators.asof_join import _TS_US, ensure_ts_us


def _order_cols(tie_breakers: list[str]) -> list:
    return [F.col(_TS_US)] + [F.col(c) for c in tie_breakers]


def sessionize(
    df: DataFrame,
    keys: list[str],
    gap: str | CWindow = "30m",
    time_column: str = "ts",
    tie_breakers: list[str] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based session ids per key: a new session starts when the gap from
    the previous event is >= `gap`. session_id is 0-based per key, assigned in
    stable (ts, tie_breakers) order. lag + cumsum — one shuffle, no Python."""
    gap_us = (CWindow(gap) if isinstance(gap, str) else gap).millis * 1000
    out = ensure_ts_us(df, time_column)
    w = W.partitionBy(*keys).orderBy(*_order_cols(tie_breakers or []))
    prev = F.lag(_TS_US).over(w)
    new_sess = F.when(prev.isNull() | ((F.col(_TS_US) - prev) >= gap_us), 1).otherwise(0)
    out = out.withColumn(session_col, (F.sum(new_sess).over(w) - 1).cast("long"))
    return out.drop(_TS_US)


def lag_lead(
    df: DataFrame,
    keys: list[str],
    cols: dict[str, int],
    time_column: str = "ts",
    tie_breakers: list[str] | None = None,
) -> DataFrame:
    """Add `{col}_lag{n}` / `{col}_lead{n}` per (col -> n) in stable order.
    n > 0 produces both lag and lead of that offset."""
    out = ensure_ts_us(df, time_column)
    w = W.partitionBy(*keys).orderBy(*_order_cols(tie_breakers or []))
    for col, n in cols.items():
        out = out.withColumn(f"{col}_lag{n}", F.lag(col, n).over(w))
        out = out.withColumn(f"{col}_lead{n}", F.lead(col, n).over(w))
    return out.drop(_TS_US)


def tumbling_window_agg(
    df: DataFrame,
    keys: list[str],
    size: str | CWindow,
    aggs: dict[str, object],
    time_column: str = "ts",
) -> DataFrame:
    """Aggregate into non-overlapping epoch-aligned buckets. Output has
    `window_start` (timestamp) + keys + aggregate columns. Pure groupBy —
    partial aggregation map-side, single shuffle."""
    size_us = (CWindow(size) if isinstance(size, str) else size).millis * 1000
    out = ensure_ts_us(df, time_column)
    bucket = (F.col(_TS_US) - (F.col(_TS_US) % F.lit(size_us))).alias("__bucket_us")
    grouped = out.groupBy(*keys, bucket).agg(*[v.alias(k) for k, v in aggs.items()])
    return grouped.withColumn("window_start", F.timestamp_micros(F.col("__bucket_us"))).drop("__bucket_us")


def hopping_window_agg(
    df: DataFrame,
    keys: list[str],
    size: str | CWindow,
    hop: str | CWindow,
    aggs: dict[str, object],
    time_column: str = "ts",
) -> DataFrame:
    """Overlapping hopping windows: each event lands in size/hop buckets
    (explode of an epoch sequence — vectorized JVM, no Python), then a single
    groupBy. Window [start, start+size) is labeled by its start."""
    size_us = (CWindow(size) if isinstance(size, str) else size).millis * 1000
    hop_us = (CWindow(hop) if isinstance(hop, str) else hop).millis * 1000
    if size_us % hop_us != 0:
        raise ValueError("size must be a multiple of hop")
    out = ensure_ts_us(df, time_column)
    # window starts covering ts: from floor(ts/hop)*hop - size + hop up to floor(ts/hop)*hop
    last = F.col(_TS_US) - (F.col(_TS_US) % F.lit(hop_us))
    first = last - F.lit(size_us - hop_us)
    out = out.withColumn("__bucket_us", F.explode(F.sequence(first, last, F.lit(hop_us))))
    grouped = out.groupBy(*keys, "__bucket_us").agg(*[v.alias(k) for k, v in aggs.items()])
    return (
        grouped.withColumn("window_start", F.timestamp_micros(F.col("__bucket_us")))
        .withColumn("window_end", F.timestamp_micros(F.col("__bucket_us") + F.lit(size_us)))
        .drop("__bucket_us")
    )
