"""Streaming observability: per-tile column summaries + histogram tiles.

The reference computes drift over TILE summaries (online/.../stats/
TileDriftCalculator.scala works on per-tile `TileSummary` structs that an
upstream Summarizer emits; spark/.../stats/StatsCompute.scala is the batch
summary pass). This module is the streaming half of `jobs/stats.py`: the
same per-tile summaries, produced incrementally by Structured Streaming with
event-time windows + a watermark, in a schema that

- is IDENTICAL between the batch and streaming builders (`summary_tiles` /
  `stream_summary_tiles`), so a consumer can backfill history in batch and
  tail the present from a stream, and
- is MERGEABLE: every metric is an associative partial (count/nulls/sum →
  sum-merge, min → min, max → max), so coarser rollups (daily tiles from
  hourly, whole-series totals) are one more groupBy — `merge_summary_tiles`.
  Non-mergeable finals (mean) are derived at read time, exactly like the
  reference's IR→finalize split (aggregator update/merge/finalize contract).

Plan shape at scale: ONE map-side-combined shuffle keyed by (tile), state
bounded by tiles-in-watermark × columns; everything is JVM built-ins — no
Python in the data path.
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


def _dur(spec: str) -> str:
    from chronon_spark.api import Window

    return f"{Window(spec).millis // 1000} seconds"


def _summary_aggs(schema, columns: list[str] | None):
    fields = {f.name: f.dataType for f in schema.fields}
    columns = columns or list(fields)
    aggs, entries = [], []  # entries: (column, metric, alias)

    def add(col: str, metric: str, expr) -> None:
        alias = f"__{col}__{metric}"
        aggs.append(expr.alias(alias))
        entries.append((col, metric, alias))

    for c in columns:
        add(c, "count", F.count(c).cast("double"))
        add(c, "nulls", F.sum(F.col(c).isNull().cast("long")).cast("double"))
        if isinstance(fields[c], _NUMERIC):
            add(c, "sum", F.sum(c).cast("double"))
            add(c, "min", F.min(c).cast("double"))
            add(c, "max", F.max(c).cast("double"))
    return aggs, entries


def _stacked(grouped: DataFrame, entries) -> DataFrame:
    stack_args = ", ".join(f"'{c}', '{m}', `{a}`" for c, m, a in entries)
    return grouped.selectExpr(
        "tile_start",
        f"stack({len(entries)}, {stack_args}) as (column, metric, value)",
    )


def summary_tiles(
    df: DataFrame,
    time_col: str = "ts",
    columns: list[str] | None = None,
    tile: str = "1d",
) -> DataFrame:
    """Batch per-tile summaries, long format:
    (tile_start:timestamp, column, metric, value:double)."""
    aggs, entries = _summary_aggs(df.schema, columns)
    g = df.groupBy(F.window(time_col, _dur(tile)).alias("__w")).agg(*aggs)
    return _stacked(g.withColumn("tile_start", F.col("__w.start")), entries)


def stream_summary_tiles(
    stream: DataFrame,
    time_col: str = "ts",
    columns: list[str] | None = None,
    tile: str = "1d",
    watermark: str = "5m",
) -> DataFrame:
    """Streaming twin of :func:`summary_tiles` — same output schema, computed
    incrementally per event-time tile with bounded out-of-orderness (late
    rows beyond the watermark are dropped, the reference's Flink watermark
    contract, flink/.../FlinkJob.scala:95-118)."""
    w = stream.withWatermark(time_col, _dur(watermark))
    aggs, entries = _summary_aggs(stream.schema, columns)
    g = w.groupBy(F.window(time_col, _dur(tile)).alias("__w")).agg(*aggs)
    return _stacked(g.withColumn("tile_start", F.col("__w.start")), entries)


# metric → merge semantics (associative; schema-stable under re-merge)
_MERGE_MIN = {"min"}
_MERGE_MAX = {"max"}


def merge_summary_tiles(tiles: DataFrame, roll_to: str | None = None) -> DataFrame:
    """Merge tile summaries — across sources (batch backfill ∪ streamed tail)
    and/or to a coarser tile (`roll_to`, e.g. hourly → '7d'). `roll_to=None`
    collapses everything to whole-series totals (tile_start = min seen).

    count/nulls/sum merge by SUM, min by MIN, max by MAX — each metric's own
    associative merge, the aggregator `merge` of the reference's IR contract.
    """
    from pyspark.sql import Window

    if roll_to:
        sec = int(_dur(roll_to).split()[0])
        key = F.timestamp_seconds((F.unix_timestamp("tile_start") / sec).cast("long") * sec)
    else:
        key = F.min("tile_start").over(Window.partitionBy())
    t = tiles.withColumn("__tile", key)
    return (
        t.groupBy(F.col("__tile").alias("tile_start"), "column", "metric")
        .agg(
            F.min("value").alias("__mn"), F.max("value").alias("__mx"), F.sum("value").alias("__sm")
        )
        .select(
            "tile_start",
            "column",
            "metric",
            F.when(F.col("metric").isin(*_MERGE_MIN), F.col("__mn"))
            .when(F.col("metric").isin(*_MERGE_MAX), F.col("__mx"))
            .otherwise(F.col("__sm"))
            .alias("value"),
        )
    )


def derive_means(merged: DataFrame, round_to: int = 6) -> DataFrame:
    """Finalize step: append mean = sum/count rows to a merged summary —
    the non-mergeable metric derived from mergeable partials at read time."""
    wide = (
        merged.where(F.col("metric").isin("sum", "count"))
        .groupBy("tile_start", "column")
        .pivot("metric", ["sum", "count"])
        .agg(F.first("value"))
    )
    means = wide.where(F.col("sum").isNotNull() & (F.col("count") > 0)).select(
        "tile_start",
        "column",
        F.lit("mean").alias("metric"),
        F.round(F.col("sum") / F.col("count"), round_to).alias("value"),
    )
    return merged.unionByName(means)


def hist_tiles(
    df: DataFrame,
    time_col: str = "ts",
    cat_col: str = "role",
    tile: str = "1d",
) -> DataFrame:
    """Batch per-tile categorical histogram: (tile_start, category, n) —
    the TileSummary.histogram input of the reference's drift calculator."""
    return (
        df.where(F.col(cat_col).isNotNull())
        .groupBy(
            F.window(time_col, _dur(tile)).alias("__w"),
            F.col(cat_col).alias("category"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("__w.start").alias("tile_start"), "category", "n")
    )


def stream_hist_tiles(
    stream: DataFrame,
    time_col: str = "ts",
    cat_col: str = "role",
    tile: str = "1d",
    watermark: str = "5m",
) -> DataFrame:
    """Streaming twin of :func:`hist_tiles` (same schema; merge = sum on n)."""
    w = stream.withWatermark(time_col, _dur(watermark))
    return (
        w.where(F.col(cat_col).isNotNull())
        .groupBy(
            F.window(time_col, _dur(tile)).alias("__w"),
            F.col(cat_col).alias("category"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("__w.start").alias("tile_start"), "category", "n")
    )


def hist_tile_drift(tiles: DataFrame, round_to: int = 6) -> DataFrame:
    """Consecutive-tile histogram drift over (tile_start, category, n) tiles
    — L1/L∞ between each tile's normalized histogram and its predecessor's
    (reference TileDriftCalculator.histogramDistance). Runs on the OUTPUT of
    either hist-tile builder, so the same drift job serves the batch backfill
    and the drained stream. Tile count ≈ series length: after the map-side
    pivot to one map per tile, everything is driver-trivial."""
    from pyspark.sql import Window

    per_tile = tiles.groupBy("tile_start").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("category").cast("string"), F.col("n")))
        ).alias("hist")
    )
    w = Window.orderBy("tile_start")
    t = per_tile.select(
        "tile_start", "hist", F.lag("hist").over(w).alias("__phist")
    ).where(F.col("__phist").isNotNull())
    tot = lambda m: F.aggregate(F.map_values(m), F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    d = F.map_values(
        F.map_zip_with(
            "hist",
            "__phist",
            lambda k, vc, vp: F.abs(
                F.coalesce(vc.cast("double"), F.lit(0.0)) / tot(F.col("hist"))
                - F.coalesce(vp.cast("double"), F.lit(0.0)) / tot(F.col("__phist"))
            ),
        )
    )
    return t.select(
        "tile_start",
        F.round(F.aggregate(d, F.lit(0.0), lambda a, x: a + x), round_to).alias("hist_l1"),
        F.round(F.array_max(d), round_to).alias("hist_linf"),
    )
