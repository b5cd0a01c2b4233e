"""Streaming GroupBy: Structured Streaming equivalents of the engine's
windowed aggregations.

The reference runs the same GroupBy semantics through two streaming engines
(spark/.../streaming/GroupBy.scala:85-201 — row-level pass-through with
windows resolved at fetch; flink/.../FlinkJob.scala:95-118 — event-time
tumbling tiles sized by the smallest tail hop, 5-minute bounded
out-of-orderness watermark). We use idiomatic Structured Streaming:

- `stream_tumbling_agg` / `stream_hop_tiles`: `F.window` event-time windows
  with a watermark; tiles are keyed by (entity, tile_start) exactly like the
  reference's tiled IRs (api/.../TilingUtils.scala), so a downstream
  fetcher can merge them with batch tiles from `operators/tiles.py` — the
  tile schema is the same (cnt/sum/min/max per column).
- `stream_sessionize`: `F.session_window` gap sessions (the reference has no
  session operator anywhere — north-rule addition).

All aggregation stays JVM-side (built-in functions; update/merge handled by
Spark's stateful operators). Late data beyond the watermark is dropped —
identical to the reference's Flink watermark contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from chronon_spark.api import GroupBy, Op
from chronon_spark.resolution import smallest_tail_hop_millis


def _dur(spec: str) -> str:
    """'5m' → '5 minutes' (Spark interval string)."""
    from chronon_spark.api import Window

    ms = Window(spec).millis
    return f"{ms // 1000} seconds"


def stream_tumbling_agg(
    stream: DataFrame,
    keys: list[str],
    size: str,
    aggs: dict[str, Column],
    time_col: str = "ts",
    watermark: str = "5m",
) -> DataFrame:
    """Event-time tumbling aggregation with bounded out-of-orderness
    (reference default: 5 minutes, FlinkJob.scala:95-118)."""
    w = stream.withWatermark(time_col, _dur(watermark))
    out = w.groupBy(*keys, F.window(time_col, _dur(size)).alias("__w")).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return out.select(
        *keys, F.col("__w.start").alias("window_start"), F.col("__w.end").alias("window_end"), *aggs
    )


def stream_hop_tiles(
    stream: DataFrame,
    gb: GroupBy,
    time_col: str = "ts",
    watermark: str = "5m",
) -> DataFrame:
    """Streaming tile builder: partial IRs per (keys, tile_start), tile size =
    smallest tail hop across the GroupBy's windows (Resolution.scala:65-86).
    Output schema matches the batch tile builder in operators/tiles.py, so
    batch + streaming tiles merge associatively (update/merge contract)."""
    hop_ms = smallest_tail_hop_millis([p.window.millis for p in gb.parts()])
    aggs = []
    seen = set()
    for p in gb.parts():
        c = p.input_column
        for stat, expr in (
            ("cnt", F.count(c)),
            ("sum", F.sum(c)),
            ("min", F.min(c)),
            ("max", F.max(c)),
        ):
            if (c, stat) in seen:
                continue
            if (
                (stat == "cnt" and p.op in (Op.COUNT, Op.AVERAGE, Op.SUM))
                or (stat == "sum" and p.op in (Op.SUM, Op.AVERAGE))
                or (stat == "min" and p.op == Op.MIN)
                or (stat == "max" and p.op == Op.MAX)
            ):
                seen.add((c, stat))
                aggs.append(expr.alias(f"{c}__{stat}"))
    if not aggs:
        raise ValueError("no tileable aggregations in GroupBy")
    w = stream.withWatermark(time_col, _dur(watermark))
    out = w.groupBy(
        *gb.keys, F.window(time_col, f"{hop_ms // 1000} seconds").alias("__w")
    ).agg(*aggs)
    return out.select(*gb.keys, F.col("__w.start").alias("tile_start"), *[a for a in out.columns if "__" in a and a != "__w"])


def stream_sessionize(
    stream: DataFrame,
    keys: list[str],
    gap: str,
    aggs: dict[str, Column] | None = None,
    time_col: str = "ts",
    watermark: str = "5m",
) -> DataFrame:
    """Gap-based session windows over a stream (`F.session_window` — dynamic
    event-time sessions closed when no event arrives within `gap`)."""
    aggs = aggs or {"n_turns": F.count(F.lit(1))}
    w = stream.withWatermark(time_col, _dur(watermark))
    out = w.groupBy(*keys, F.session_window(time_col, _dur(gap)).alias("__s")).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return out.select(
        *keys,
        F.col("__s.start").alias("session_start"),
        F.col("__s.end").alias("session_end"),
        *aggs,
    )
